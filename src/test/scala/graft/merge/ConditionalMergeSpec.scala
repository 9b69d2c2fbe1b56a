package graft.merge

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Clause-level semantics of [[Merge.mergeInto]] — the cases the
  * driver's q37 oracle exercises only in aggregate. */
class ConditionalMergeSpec extends SparkSpec {
  import spark.implicits._

  private def base(): String = {
    val path = Merge.scratchTable("graft_cm_")
    Merge.upsert(spark,
      Seq((1L, "a", 10.0, 1L), (2L, "a", 20.0, 1L), (3L, "a", 30.0, 1L))
        .toDF("k", "part", "v", "pre"),
      path, Seq("k"), "pre", "part")
    path
  }

  private def state(path: String): Map[Long, Double] =
    Merge.readTable(spark, path).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("a matched row satisfying no clause survives untouched") {
    val path = base()
    // source rows for k=1 (worse price) and k=2 (better price)
    Merge.mergeInto(spark,
      Seq((1L, "a", 5.0, 2L), (2L, "a", 25.0, 2L)).toDF("k", "part", "v", "pre"),
      path, Seq("k"), "pre", Seq("part"),
      whenMatchedUpdate = Some(col("s.v") > col("t.v")))
    assert(state(path) === Map(1L -> 10.0, 2L -> 25.0, 3L -> 30.0))
  }

  test("delete wins over update when both conditions hold") {
    val path = base()
    Merge.mergeInto(spark,
      Seq((1L, "a", 99.0, 2L)).toDF("k", "part", "v", "pre"),
      path, Seq("k"), "pre", Seq("part"),
      whenMatchedDelete = Some(col("s.v") > 50),
      whenMatchedUpdate = Some(lit(true)))
    assert(state(path) === Map(2L -> 20.0, 3L -> 30.0))
  }

  test("the insert condition filters not-matched rows") {
    val path = base()
    Merge.mergeInto(spark,
      Seq((8L, "a", 1.0, 2L), (9L, "a", 2.0, 2L)).toDF("k", "part", "v", "pre"),
      path, Seq("k"), "pre", Seq("part"),
      whenNotMatchedInsert = Some(col("s.k") % 2 === 0))
    assert(state(path) ===
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 8L -> 1.0))
  }

  test("merging into a missing table degenerates to conditional insert") {
    val path = Merge.scratchTable("graft_cmn_")
    Merge.mergeInto(spark,
      Seq((1L, "a", 1.0, 1L), (2L, "a", 2.0, 1L)).toDF("k", "part", "v", "pre"),
      path, Seq("k"), "pre", Seq("part"),
      whenNotMatchedInsert = Some(col("s.k") === 2L))
    assert(state(path) === Map(2L -> 2.0))
  }

  test("a NULL delete condition falls through to the update clause") {
    val path = base()
    Merge.mergeInto(spark,
      Seq((1L, "a", 50.0, 2L)).toDF("k", "part", "v", "pre"),
      path, Seq("k"), "pre", Seq("part"),
      // s.v > null is NULL for every row: never satisfied, never a veto
      whenMatchedDelete = Some(col("s.v") > lit(null).cast("double")),
      whenMatchedUpdate = Some(col("s.v") > col("t.v")))
    assert(state(path) === Map(1L -> 50.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("precombine picks the condition-bearing row per key") {
    val path = base()
    // two source rows for k=1: the higher-pre row (v=100) wins dedup,
    // so the update applies with v=100, not 1.0
    Merge.mergeInto(spark,
      Seq((1L, "a", 1.0, 2L), (1L, "a", 100.0, 3L)).toDF("k", "part", "v", "pre"),
      path, Seq("k"), "pre", Seq("part"),
      whenMatchedUpdate = Some(col("s.v") > col("t.v")))
    assert(state(path) === Map(1L -> 100.0, 2L -> 20.0, 3L -> 30.0))
  }
}
