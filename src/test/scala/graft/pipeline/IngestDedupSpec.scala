package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chained ingest dedup: verdicts depend only on STRICTLY EARLIER
  * ingests, durable state accretes one commit per batch. */
class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  // batches by doc_id % 2: batch0 = {2, 4, 10}, batch1 = {1, 3}
  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "the QUICK brown fox... jumps over the lazy dog!!"), // dup of 1
    (3L, "The quick brown fox jumps over the lazy cat"),      // near-dup
    (4L, "completely different content about spark engines"),
    (10L, "the quick brown fox jumps over the lazy dog")      // dup of 1
  ).toDF("doc_id", "text")

  test("ingestDedupChain: first ingest always clean; later ingest " +
      "flags against accumulated state; same-batch dups don't count") {
    val r = IngestDedup.ingestDedupChain(docs, "doc_id", "text",
      nBatches = 2).collect()
    assert(r.length === 5) // every doc shingles (>= 3 tokens)
    val byId = r.map(row => row.getAs[Long]("doc_id") -> row).toMap
    // batch 0 (ids 2, 4, 10): nothing before them — clean by contract,
    // even though 2 and 10 are exact dups OF EACH OTHER (same batch)
    Seq(2L, 4L, 10L).foreach { id =>
      val row = byId(id)
      assert(row.getAs[Int]("ingest_batch") === 0)
      assert(!row.getAs[Boolean]("is_dup"), s"doc $id must be clean")
      assert(row.getAs[Long]("n_matches") === 0L)
      assert(row.isNullAt(row.fieldIndex("dup_of")))
    }
    // batch 1: doc 1 is an exact dup of BOTH 2 and 10 (every band
    // collides) — flagged with the minimum colliding corpus id
    val d1 = byId(1L)
    assert(d1.getAs[Int]("ingest_batch") === 1)
    assert(d1.getAs[Boolean]("is_dup"))
    assert(d1.getAs[Long]("dup_of") === 2L)
    assert(d1.getAs[Long]("n_matches") === 2L)
  }

  test("streamIngestDedup reproduces the batch chain bit for bit " +
      "(streaming/batch parity on real testdata)") {
    val streamed = IngestDedup.streamIngestDedup(spark, sfDir, 4)
      .collect().map(_.toString).sorted.toSeq
    val batch = IngestDedup.ingestDedupChain(
      graft.Tables.documents(spark, sfDir), "doc_id", "text", 4)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("ingestDedupChain: a doc's verdict is stable under MORE batches " +
      "(state order, not batch geometry, decides)") {
    // with 5 batches every doc is alone in its batch (10 % 5 = 0, so
    // batch 0 = {10}); doc 1 (batch 1) screens against {10} only
    val r = IngestDedup.ingestDedupChain(docs, "doc_id", "text",
      nBatches = 5).collect()
    val byId = r.map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(byId(10L).getAs[Boolean]("is_dup") === false) // batch 0
    assert(byId(1L).getAs[Long]("dup_of") === 10L)       // sees only 10
    // doc 2 (batch 2) now sees both 10 and 1 — min id wins
    assert(byId(2L).getAs[Long]("dup_of") === 1L)
    assert(byId(2L).getAs[Long]("n_matches") === 2L)
  }
}
