package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BloomBits, BloomFunctions}

/** Scale utilities: the shuffle-shaping tools a 100 TB deployment needs
  * beyond what AQE does automatically.
  *
  *  - [[saltedEquiJoin]]: explicit key salting for joins whose hot keys
  *    exceed what AQE skew-split handles (AQE splits oversized
  *    partitions of a sort-merge join, but a single monster key still
  *    lands in one task; salting spreads ONE key over `factor` tasks).
  *  - [[writeBucketed]] / co-located joins: two tables bucketed by the
  *    same key and bucket count join with ZERO shuffle on either side —
  *    the plan shows no Exchange. For a fact table joined repeatedly on
  *    its key (e.g. `transactions` × enrichments), bucketing converts
  *    every future join's shuffle into a one-time write cost.
  */
object Scale {

  /** Equi-join with the left side's hot keys spread over `factor`
    * sub-keys. The right side is replicated `factor`× (explode over the
    * salt range), so use this when the right side is the smaller one —
    * the classic skew recipe. Results are identical to the plain join. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    // deterministic per-row salt: spreads each key's rows uniformly
    // without an RNG (replays stay stable)
    val leftCols = left.columns
    val salted = left.withColumn("_salt",
      pmod(xxhash64(leftCols.toIndexedSeq.map(col): _*), lit(factor)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Write a bucketed+sorted table into the session catalog. Joins and
    * aggregations on `bucketCols` against any table bucketed the same
    * way are shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** True when the executed plan of `df` contains no shuffle exchange
    * (broadcast exchanges don't count — they move the small side, not
    * the data). Diagnostic used by specs and capacity planning. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.linesIterator.exists(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange") &&
        !l.contains("BroadcastQueryStage"))

  /** Morton (Z-order) interleave of `cols` — each column must already
    * be a non-negative integral value fitting in `bitsPer` bits. Bit b
    * of column i lands at position `b * cols.size + i` of the result,
    * so the interleaved key preserves locality in EVERY dimension at
    * once: range-partitioning and sorting by it lays rows out in
    * hyper-rectangles, which is what lets parquet min/max stats prune
    * scans filtering on ANY subset of the dimensions (a linear (a, b)
    * sort prunes only on the prefix a). Pure bitwise Column arithmetic
    * — codegen'd, no UDF; `bitsPer * cols.size` must fit a signed
    * long. */
  def interleaveBits(cols: Seq[Column], bitsPer: Int): Column = {
    require(cols.nonEmpty, "interleaveBits needs at least one column")
    require(bitsPer >= 1 && bitsPer * cols.size <= 63,
      s"bitsPer ($bitsPer) x ${cols.size} cols must fit in a signed long")
    val k = cols.size
    cols.zipWithIndex.map { case (c, i) =>
      (0 until bitsPer).map { b =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * k + i)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Equi-join with a bloom runtime filter: build one self-describing
    * [[BloomBits]] filter over the dim side's join keys (an eager
    * driver action — the dim side is the SMALL/filtered one by
    * contract, and the filter is capped at 1 MiB by
    * [[BloomBits.sizeFor]]), then prune the fact side with the
    * codegen'd `graft_bloom_maybe` probe BEFORE the join.
    *
    * This is dynamic/runtime filtering (Trino's dynamic filters,
    * Spark's own `InjectRuntimeFilter`) made explicit: at 100 TB the
    * win is that fact rows that cannot match never enter the join
    * exchange — the probe runs inside the scan's codegen stage, so a
    * selective dim turns a full-fact shuffle into a shuffle of the
    * matching fraction. False positives are possible (they just ride
    * to the join and fall out there); false negatives are impossible
    * (build and probe share one hash path), so the result is
    * IDENTICAL to the plain join. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedDimKeys: Long): DataFrame = {
    val (m, k) = BloomBits.sizeFor(expectedDimKeys)
    val filt = dim
      .select(BloomFunctions.bloomAgg(xxhash64(col(dimKey)), m, k).as("f"))
      .head.getAs[Array[Byte]](0)
    fact.filter(BloomFunctions.bloomMaybe(lit(filt), xxhash64(col(factKey))))
      .join(dim, col(factKey) === col(dimKey))
  }

  // ---- query inventory ----

  type Q = (SparkSession, String) => DataFrame

  /** x01: salted-join parity. [[saltedEquiJoin]] promises results
    * identical to the plain equi-join it replaces, so the oracle IS the
    * plain join — the one scale utility whose contract is directly
    * SQL-expressible gets a hash-checked driver key (the zero-shuffle
    * bucketing claims stay plan-asserted in ScaleSpec, where they
    * belong). The synthetic key funnels a quarter of all customers onto
    * one hot key — exactly the single-monster-key shape AQE skew-split
    * cannot spread but salting does. */
  val queries: Map[String, Q] = Map(
    "x01_salted_join" -> { (s, dir) =>
      val left = graft.Tables.customer(s, dir).select(
        col("c_custkey"),
        when(col("c_custkey") % 4 === 0, lit(0))
          .otherwise(col("c_nationkey")).cast("long").as("k"))
      val right = graft.Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("k"), col("n_name"))
      saltedEquiJoin(left, right, Seq("k"), factor = 8)
        .select(col("c_custkey"), col("k"), col("n_name"))
        .orderBy("c_custkey", "k", "n_name")
    },
    // x10: bloom-pruned join parity — like x01, the utility's contract
    // is "identical to the plain join", so the oracle IS the plain
    // join. The dim side (small parts) keeps ~6% of partkeys, the
    // shape where runtime filtering pays: ~94% of lineitem never
    // enters the join exchange. Revenue goes through exact decimals.
    "x10_bloom_join" -> { (s, dir) =>
      import graft.Tables._
      val dim = part(s, dir).filter(col("p_size") <= 3)
        .select(col("p_partkey"), col("p_brand"))
      val li = lineitem(s, dir)
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      bloomPrunedJoin(li, dim, "l_partkey", "p_partkey",
        expectedDimKeys = 100000L)
        .groupBy("p_brand")
        .agg(
          d(sum(dec(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount")))))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    },
    // x15: bucketed co-located join, end-to-end. Both sides are written
    // bucketed+sorted on the join key, so the forced sort-merge join
    // runs with ZERO exchange on either side (ScaleSpec pins the plan;
    // this driver key pins the RESULT against the plain-join oracle).
    // At 100 TB this is the one-time-write-cost / every-join-free
    // trade: the fact table's dominant join key never shuffles again.
    "x15_bucketed_join" -> { (s, dir) =>
      import graft.Tables._
      Seq("x15_li", "x15_ord").foreach(dropBucketedTable(s, _))
      writeBucketed(
        lineitem(s, dir)
          .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
        "x15_li", Seq("l_orderkey"), 8)
      writeBucketed(
        orders(s, dir)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        "x15_ord", Seq("l_orderkey"), 8)
      s.table("x15_li")
        // merge hint: a broadcast of the small test-scale side would
        // bypass the bucketed layout this key exists to exercise
        .join(s.table("x15_ord").hint("merge"), Seq("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          d(sum(dec(col("l_extendedprice")))).as("revenue"),
          d(sum(dec(col("l_quantity")))).as("volume"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    },
    // x16: dynamic partition pruning, end-to-end. The fact copy is
    // hive-partitioned on a derived month; the dim side arrives with a
    // selective filter, and Spark injects a runtime pruning subquery so
    // the fact scan reads ONLY the matching partitions (ScaleSpec pins
    // the dynamicpruning expression in the plan). The 100 TB read that
    // matters: a 3-month query against a 7-year fact table touches 3/84
    // of the bytes without any static predicate on the fact side.
    "x16_dpp" -> { (s, dir) =>
      import graft.Tables._
      // partitioned fact copy is a pure function of the source dir:
      // built once per JVM, reused across bench passes, swept on exit
      val tmp = graft.util.Scratch.cached(s"x16#$dir", "graft_x16_") { t =>
        lineitem(s, dir)
          .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
          .write.mode("overwrite").partitionBy("ship_month").parquet(t)
      }
      val fact = s.read.parquet(tmp)
      val dim = orders(s, dir)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("ship_month"))
        .filter(col("ship_month").isin("1996-01", "1996-02", "1996-03"))
        .distinct()
      fact.join(dim, Seq("ship_month"))
        .groupBy("ship_month")
        .agg(
          d(sum(dec(col("l_extendedprice")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("ship_month")
    },
    // x20: bucketed SHUFFLE-FREE aggregation, end-to-end. The groupBy
    // key is the bucket key, so the aggregation reads the hash
    // distribution from the bucket layout and runs with zero exchange
    // (ScaleSpec "bucketed-by-key table AGGREGATES with zero shuffle"
    // pins the plan; this driver key pins the RESULT against the
    // plain-aggregation oracle — the layout must be invisible in the
    // values). At 100 TB this is the repeated-rollup dividend: every
    // per-orderkey aggregate over the fact table after the one-time
    // bucketed write is a pure map-side scan.
    "x21_bucketed_agg" -> { (s, dir) =>
      import graft.Tables._
      dropBucketedTable(s, "x21_li")
      writeBucketed(
        lineitem(s, dir)
          .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
        "x21_li", Seq("l_orderkey"), 8)
      s.table("x21_li")
        .groupBy("l_orderkey")
        .agg(
          d(sum(dec(col("l_quantity")))).as("volume"),
          d(sum(dec(col("l_extendedprice")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("l_orderkey")
    })

  /** Drop a bucketed catalog table AND its managed location (a
    * previously-failed run can leave the directory behind, which makes
    * the next `saveAsTable` fail on a non-empty path). The location is
    * resolved from the catalog when the table exists, and residue from
    * a crashed run (directory without a catalog entry) is resolved
    * against the CONFIGURED warehouse dir — not a cwd-relative literal,
    * which breaks under spark.sql.warehouse.dir or a different cwd. */
  def dropBucketedTable(s: SparkSession, table: String): Unit = {
    import org.apache.hadoop.fs.Path
    val catalogLoc =
      if (s.catalog.tableExists(table))
        Some(new Path(s.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).location))
      else None
    s.sql(s"DROP TABLE IF EXISTS $table")
    val residue = new Path(new Path(s.sessionState.conf.warehousePath), table)
    (catalogLoc.toSeq :+ residue).distinct.foreach { p =>
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  val oracle: Map[String, String] = Map(
    "x01_salted_join" ->
      """SELECT c_custkey, k, n_name
        |FROM (SELECT c_custkey,
        |             CAST(CASE WHEN c_custkey % 4 = 0 THEN 0
        |                       ELSE c_nationkey END AS BIGINT) AS k
        |      FROM customer) c
        |JOIN (SELECT CAST(n_nationkey AS BIGINT) AS k, n_name
        |      FROM nation) n USING (k)
        |ORDER BY c_custkey, k, n_name""".stripMargin,
    "x10_bloom_join" ->
      """SELECT p_brand,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS STRING) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 3
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    // the bucketed layout must be invisible in the result: the oracle
    // is the plain join over the original tables
    "x15_bucketed_join" ->
      """SELECT o_orderpriority,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
        |    AS revenue,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS volume,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // likewise: partition layout + runtime pruning must be invisible
    "x16_dpp" ->
      """WITH d AS (SELECT DISTINCT strftime(o_orderdate, '%Y-%m')
        |             AS ship_month
        |           FROM orders
        |           WHERE strftime(o_orderdate, '%Y-%m')
        |             IN ('1996-01','1996-02','1996-03'))
        |SELECT ship_month,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_items
        |FROM (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        |             l_extendedprice
        |      FROM lineitem) f
        |JOIN d USING (ship_month)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the bucketed layout must be invisible here too: the oracle is
    // the plain per-orderkey rollup over the original table
    "x21_bucketed_agg" ->
      """SELECT l_orderkey,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS volume,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
