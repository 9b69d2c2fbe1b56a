package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed curation pipeline: every stage must demonstrably
  * participate (filter excludes, dedup collapses, budget cuts) — stage
  * interaction is exactly what the composite oracle hash pins in the
  * driver, and what this spec pins structurally. */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  // two distinct Gopher-passing 30-worders (word count, mean length,
  // alpha fraction, stopword hits all inside the default gates)
  private val proseA = "the cat and the dog sat in a warm house " * 3
  private val proseB =
    "a big tree grew near the old mill and it gave cool shade to all " * 2

  test("curate: filter excludes, dedup collapses to min id, budget cuts") {
    val docs = Seq(
      (1L, "en", proseA),
      (2L, "en", proseA),   // exact dup of 1 → dedup keeps id 1
      (3L, "en", "x y z"),  // fails Gopher word count
      (4L, "en", proseB)
    ).toDF("doc_id", "lang", "text")

    // generous budget: survivors are exactly the filter+dedup output
    val wide = TrainingPipeline.curate(docs, "doc_id", "text", "lang", 1000L)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(wide.keySet === Set(1L, 4L))
    assert(wide(1L) === 30L && wide(4L) === 30L)

    // tight budget: the md5 walk admits only its first survivor
    val tight = TrainingPipeline.curate(docs, "doc_id", "text", "lang", 32L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect()
    assert(tight.length === 1)
    assert(Set(1L, 4L).contains(tight.head._1))
    assert(tight.head._2 <= 32L)

    // the dup's id must never be the survivor — dedup ran BEFORE the
    // budget walk (a post-budget dedup could admit id 2 instead)
    assert(!wide.contains(2L))
  }

  test("curateNearDup: near-duplicates collapse, full-corpus evidence decides") {
    // B is a NEAR (not exact) dup of A — one occurrence of one word
    // changed, so exact fingerprints differ but the md5 minhash bands
    // still collide (verified against an out-of-band replay of the
    // engine's exact md5 banding — band 1 collides for this pair)
    val nearA = proseA
    val nearB = proseA.replaceFirst("warm", "cold")
    val docs = Seq(
      (1L, "en", nearA),
      (2L, "en", nearB),    // near-dup of 1 → keeper is min id 1
      (3L, "en", "x y z"),  // fails Gopher
      (4L, "en", proseB)
    ).toDF("doc_id", "lang", "text")
    val out = TrainingPipeline
      .curateNearDup(docs, "doc_id", "text", "lang", 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 4L), s"got $out")
    // exact dedup would NOT have collapsed the near-pair — the stage
    // genuinely differs from curate's
    val exact = TrainingPipeline.curate(docs, "doc_id", "text", "lang", 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(exact === Set(1L, 2L, 4L))
  }

  test("curateScrubbed: a doc passing Gopher on raw text drops after scrub") {
    // two docs share a 26-word boilerplate block with unique 5-word
    // tails: raw word count 31 passes Gopher, but the scrub removes the
    // shared block everywhere and the 5-word remainder fails minWords
    val block = ("the cat and dog sat in a house and it " * 2).trim +
      " the sun is up and all is well here today"
    val df = Seq(
      (1L, "en", s"$block alpha maple river stone cloud"),
      (2L, "en", s"$block brick tulip meadow frost owl"),
      (3L, "en", proseB)).toDF("doc_id", "lang", "text")
    // sanity: raw curation keeps all three
    val raw = TrainingPipeline.curate(df, "doc_id", "text", "lang", 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(raw === Set(1L, 2L, 3L))
    // scrubbed: the shared block is boilerplate; only doc 3 survives
    val out = TrainingPipeline.curateScrubbed(df, "doc_id", "text", "lang",
      1000L).select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(out.keySet === Set(3L))
    assert(out(3L) === 30L, "doc 3 shares nothing: token count unchanged")
  }

  test("curate stays one lazy plan: no eager jobs at construction") {
    val docs = Seq((1L, "en", proseA)).toDF("doc_id", "lang", "text")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    TrainingPipeline.curate(docs, "doc_id", "text", "lang", 100L)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after === before, "building the pipeline must run no Spark job")
  }

  test("p07 lineage: monotone funnel, final stage agrees with p01") {
    val docs = graft.Tables.documents(spark, sfDir)
    val rows = TrainingPipeline
      .curationLineage(docs, "doc_id", "text", "lang", 1500L)
      .collect().map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(rows.keySet ===
      Set("0_raw", "1_gopher", "2_dedup", "3_budget"))
    // each stage can only shrink the corpus
    val order = Seq("0_raw", "1_gopher", "2_dedup", "3_budget")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(rows(b)._1 <= rows(a)._1, s"$b grew docs vs $a")
      assert(rows(b)._2 <= rows(a)._2, s"$b grew tokens vs $a")
    }
    assert(rows("0_raw")._1 === docs.count())
    // the funnel genuinely narrows on this corpus (no vacuous stages)
    assert(rows("3_budget")._1 < rows("0_raw")._1)
    // the report's final stage IS the pipeline's output
    val p01 = TrainingPipeline.curate(docs, "doc_id", "text", "lang",
      1500L)
    assert(rows("3_budget")._1 === p01.count())
    assert(rows("3_budget")._2 ===
      p01.agg(sum($"n_tokens")).head().getLong(0))
  }
}
