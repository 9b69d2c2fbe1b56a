package graft.analytics

import graft.SparkSpec
import graft.SparkEntry

/** Physical-plan guards: the properties that matter at 100 TB — filter
  * and projection pushdown into the parquet scan, broadcast joins for
  * dimension lookups, whole-stage codegen coverage — asserted so a
  * regression (e.g. an expression change that breaks pushdown) fails CI,
  * not the cluster. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q01: predicates are pushed to the parquet scan") {
    val p = plan("q01_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(l_returnflag)") ||
      p.contains("EqualTo(l_returnflag,R)"), p)
  }

  test("q01: scan reads only the projected columns") {
    val p = plan("q01_filter_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment"), readSchema)
    assert(!readSchema.contains("l_partkey"), readSchema)
  }

  test("q08: dimension joins are broadcast, not shuffled") {
    val p = plan("q08_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q38: star join broadcasts dims and pushes the date filter down") {
    val df = SparkEntry.queries("q38_star_join")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // region + nation ride broadcasts at any SF (25 / 5 rows); the
    // order-date window must reach the orders scan so only the filtered
    // window shuffles into the fact-fact join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("o_orderdate"), p)
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate") ||
      pushed.contains("o_orderdate"), p)
  }

  test("q17b: the sketch-verdict join broadcasts the groups-many " +
      "sketch side — one data pass, no fact-side re-shuffle join") {
    val p = plan("q17b_approx_percentiles")
    // the approx_percentile result is |groups| rows; joining it back to
    // lineitem must ride a broadcast, never a SortMergeJoin that would
    // shuffle the 100 TB fact side a second time
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q12b: HLL and exact distinct both aggregate partially " +
      "before the shuffle") {
    val p = plan("q12b_approx_distinct")
    assert(p.contains("partial_approx_count_distinct") ||
      p.contains("partial_"), p)
  }

  test("q03: aggregation is partial (map-side) before the shuffle") {
    val p = plan("q03_agg_pricing")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair means map-side combine happened
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q05: window sort is within partitions (no global sort)") {
    val p = plan("q05_window_running")
    assert(p.contains("Window"), p)
  }

  test("flagship queries stay inside whole-stage codegen") {
    // AQE only materializes WholeStageCodegen nodes in the final plan,
    // so execute first and inspect the post-execution adaptive plan
    Seq("q01_filter_project", "q03_agg_pricing", "q08_join_agg").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // codegen stages print as "*(n)" in the adaptive plan string
      assert(p.contains("WholeStageCodegen") ||
        """\*\(\d+\)""".r.findFirstIn(p).isDefined, s"$q:\n$p")
    }
  }

  test("s01: native graft_dot appears in the ANN plan (not HOF fold)") {
    val p = plan("s01_knn_brute")
    assert(p.toLowerCase.contains("graft_dot"), p)
  }

  test("s01: scored rows are pre-reduced per partition before the rank window") {
    val p = plan("s01_knn_brute")
    // the typed local top-k heap must sit between scoring and the window
    assert(p.contains("MapPartitions"), p)
    // exactly one row shuffle (the bounded window input) — the corpus
    // itself never shuffles (query side is a BroadcastExchange)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    // plans print root-first: the shuffle (window input) must be ABOVE
    // the local pre-reduce, i.e. consume its bounded output
    assert(p.indexOf("Exchange hashpartitioning") < p.indexOf("MapPartitions"), p)
  }

  test("d04: jaccard candidate join keys are 64-bit hashes, not strings") {
    val p = plan("d04_jaccard_neardup")
    assert(p.contains("xxhash64"), p)
  }

  test("d12: token-budget walk is one shuffle (the stratum window)") {
    val p = plan("d12_token_budget")
    // tokenize + md5 are narrow; the only row shuffle is the window's
    // stratum partitioning (the trailing rangepartitioning is the
    // driver key's presentation orderBy, not part of the operator)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
  }

  test("t13: bigram counts combine map-side; vocab rides a 1-row broadcast") {
    val p = plan("t13_lm_score")
    // the corpus-sized aggregate (bigram counts) must partial-combine
    // before its shuffle — at 100 TB the map-side combine is the
    // difference between shuffling distinct bigrams and shuffling
    // every token occurrence
    assert(p.contains("partial_count"), p)
    // V is a 1-row aggregate cross-joined in as a broadcast, never a
    // driver-side eager count (the same in-plan-N contract as t11)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q40: purchase filter reaches the events scan; span rides a broadcast") {
    val df = SparkEntry.queries("q40_gapfill")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the event-type predicate must prune at the scan, and the 1-row
    // global span must never shuffle the grid side
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("event_type"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
  }

  test("p03: the expectation report is ONE scan of the table") {
    val df = SparkEntry.queries("p03_expectations")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // one FileScan, however many rules — rules must never multiply
    // the read (count inside the AQE final plan only; the printed
    // initial plan repeats every node)
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.linesIterator
      .count(_.contains("FileScan parquet")) === 1, p)
  }

  test("q42: histogram bounds are derived in-plan (single scan family)") {
    val df = SparkEntry.queries("q42_histogram")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the stats side is a broadcast of a 1-row aggregate, not a
    // shuffled join against the data
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q31: declared-value pivot partial-aggregates (no discovery job)") {
    val p = plan("q31_pivot")
    // pivotfirst partial-combines map-side like any aggregate; an
    // undeclared-values pivot would have run an eager distinct job
    // before this plan even existed
    assert(p.contains("partial_pivotfirst"), p)
  }

  test("q34: unpivot is a narrow Expand — zero row shuffles") {
    val p = plan("q34_unpivot")
    assert(p.contains("Expand"), p)
    // the only exchange is the presentation sort's rangepartitioning
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("s04: the metadata filter reaches the corpus parquet scan") {
    // filtered ANN must prune row groups BEFORE scoring — a
    // post-scoring filter would scan everything and under-fill k
    val p = plan("s04_ann_filtered")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("EqualTo(label,1)"), p)
  }

  test("q19: incremental pull pushes the commit-stamp predicate to the scan") {
    // readSince must be a stat-pruned scan: at 100 TB the filter
    // reaching the parquet reader is what lets row groups whose
    // _commit_ts max precedes the pull point be skipped entirely
    val p = plan("q19_incremental_pull")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThan(_commit_ts"), p)
  }

  test("q45: vwap partial-aggregates map-side; no extra shuffle for the ratio") {
    val p = plan("q45_vwap")
    // partial + final HashAggregate pair around ONE exchange; the vwap
    // ratio is a post-aggregation projection, not a second aggregation
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Broadcast"))
    assert(exchanges <= 2, p) // agg shuffle + output orderBy range only
  }

  test("q46: running basis and mark-to-last share ONE window shuffle") {
    val p = plan("q46_cost_basis")
    // both frames hash-partition by l_partkey with the same order: the
    // planner must not re-shuffle between the two Window operators
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, p)
  }

  test("q48: both sessionization windows ride ONE user_id shuffle") {
    val p = plan("q48_sessions_batch")
    // lag + running-sum share (user_id, order) partitioning: a second
    // hashpartitioning exchange would mean the planner re-shuffled
    // between the two window passes
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, p) // window shuffle + per-session aggregate
  }

  test("q49: the stats side broadcasts back; the fact table never shuffles") {
    val p = plan("q49_anomaly")
    assert(p.contains("BroadcastHashJoin"), p)
    // map-side partial aggregation reduces the stats input to
    // |event_type| rows before its (tiny) shuffle
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q47: the rolling frame sorts the DAILY aggregate, not the fact table") {
    val df = SparkEntry.queries("q47_rolling")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // aggregate-then-window: the Window's input is the HashAggregate
    // output; a Window directly over the orders scan would put the
    // full fact cardinality into the sort at 100 TB
    assert(p.contains("Window"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    val windowIdx = p.indexOf("Window")
    assert(p.indexOf("HashAggregate", windowIdx) > windowIdx,
      "expected the aggregate BELOW the window in the plan tree:\n" + p)
  }

  test("q53: cohort sizes broadcast back; reduced rows feed every stage") {
    val p = plan("q53_retention")
    // the distinct (user, day) reduction is the only corpus-sized
    // exchange; cohort sizes (≤ |days| rows) must ride a broadcast,
    // never a shuffled join against the activity stream
    assert(p.contains("BroadcastHashJoin"), p)
    // the per-user min-day aggregate partial-aggregates map-side
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("s09: fusion ranks meet in a hash join over bounded top-N lists") {
    val p = plan("s09_hybrid_rrf")
    // both branches end in per-query top-N windows; the RRF fusion
    // must be a key join of those bounded lists — a nested-loop fusion
    // would re-pair corpus-sized intermediates at 100 TB. (Broadcast
    // nested-loop appears only in the branches' 1-row stats carriers.)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d20: fuzzy vocab pairs verify with codegen'd levenshtein, no cartesian") {
    val p = plan("d20_fuzzy_vocab")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.toLowerCase.contains("levenshtein"), p)
  }

  test("t16: query-term filter sits below the (doc, term) exchange") {
    val p = plan("t16_bm25")
    // only query-term rows may enter the tf exchange — at 100 TB the
    // corpus explodes into trillions of (doc, term) rows and the
    // pre-exchange IN-filter is what keeps the shuffle at query-hit
    // size; corpus stats + per-term df ride broadcasts
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    val filterIdx = p.indexOf("IN (spark")
    assert(exchangeIdx >= 0 && filterIdx >= 0, p)
    assert(filterIdx > exchangeIdx,
      "expected the term filter BELOW the first exchange:\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    // top-N is a distributed TakeOrdered, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("t16: graft_nfc stays inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val df = graft.Tables.documents(spark, sfDir)
      .select(graft.functions.TextFunctions.nfcNormalize(col("text")))
    val p = df.queryExecution.executedPlan.toString
    // the starred stage marker is the compact codegen notation — an
    // interpreted fallback would print an unstarred Project
    assert("""\*\(\d+\) Project \[graft_nfc""".r.findFirstIn(p).isDefined, p)
  }

  test("d17: incremental screening joins on band keys, aggregates partial") {
    val p = plan("d17_incremental_neardup")
    // the batch-vs-corpus probe is a band-keyed join (never a text or
    // all-pairs comparison), and the per-batch-doc rollup combines
    // map-side
    assert(p.contains("bkey"), p)
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t17: quality cut is one stratum window over a narrow projection") {
    val p = plan("t17_quality_select")
    // score computation is codegen'd projection; the only row shuffle
    // is the stratum window partitioning (plus the presentation sort)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
