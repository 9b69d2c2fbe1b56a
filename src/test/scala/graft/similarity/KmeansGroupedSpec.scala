package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the bit-equivalence argument [[Similarity.kmeansCentroidsGrouped]]
  * states: batching several independent Lloyd trainings into one set of
  * driver jobs (the r15 e27/s21 optimization) must reproduce EXACTLY the
  * centroids the sequential [[Similarity.kmeansCentroids]] loops produce
  * — these centroids sit under oracle-hashed results (s09, s17–s21, e27,
  * x45), so "close" is not enough; every double must match bitwise. */
class KmeansGroupedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Tables.embeddings(spark, sfDir)

  private def centSeq(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Seq[Double])] =
    df.select("cid", "cv").as[(Long, Seq[Double])].collect()
      .toSeq.sortBy(_._1)

  test("grouped multi-quantizer training == sequential per-group loops, " +
    "bit-exactly (coarse k=10/iters=3 + 4 PQ subspaces k=16/iters=2)") {
    val subspaces = 4
    val subLen = 16 // 64-dim embeddings
    val e = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val grouped = Similarity.kmeansCentroidsGrouped(e,
      Similarity.KmGroup(-1, 10, 3, v => v) +:
        (0 until subspaces).map(m => Similarity.KmGroup(m, 16, 2,
          v => slice(v, m * subLen + 1, subLen))),
      maxTrainVectors = 256)
    val seqCoarse = centSeq(
      Similarity.kmeansCentroids(corpus, 10, 3, maxTrainVectors = 256))
    assert(centSeq(grouped(-1)) === seqCoarse,
      "coarse centroids diverge from the sequential loop")
    (0 until subspaces).foreach { m =>
      val seqSub = centSeq(Similarity.kmeansCentroids(
        e.select(col("vec_id"),
          slice(col("v"), m * subLen + 1, subLen).as("embedding")),
        16, 2, maxTrainVectors = 256))
      assert(centSeq(grouped(m)) === seqSub,
        s"subspace $m codebook diverges from the sequential loop")
    }
  }

  test("unequal iteration counts freeze exactly where the sequential " +
    "loop stops (k=5/iters=1 beside k=7/iters=4)") {
    val e = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val grouped = Similarity.kmeansCentroidsGrouped(e,
      Seq(Similarity.KmGroup(0, 5, 1, v => v),
        Similarity.KmGroup(1, 7, 4, v => v)),
      maxTrainVectors = 200)
    assert(centSeq(grouped(0)) === centSeq(
      Similarity.kmeansCentroids(corpus, 5, 1, maxTrainVectors = 200)))
    assert(centSeq(grouped(1)) === centSeq(
      Similarity.kmeansCentroids(corpus, 7, 4, maxTrainVectors = 200)))
  }
}
