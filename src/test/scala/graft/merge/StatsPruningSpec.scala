package graft.merge

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** File-level behavior of footer-stats skipping — the effects the
  * driver's q36 oracle (result equivalence) cannot observe: that files
  * are actually dropped, that the distributed footer path agrees with
  * the driver loop, and that every conservative-keep rule holds. */
class StatsPruningSpec extends SparkSpec {
  import spark.implicits._

  private def rangeTable(): String = {
    val path = Merge.scratchTable("graft_sps_")
    val rows = graft.Tables.lineitem(spark, sfDir).select(
      col("l_orderkey").as("okey"), col("l_linenumber").as("lnum"),
      col("l_quantity").as("qty"), col("l_returnflag").as("part"))
    // tiny target files => many files, each with a tight okey range
    Merge.bulkInsert(rows, path, "part", keyCols = Seq("okey"),
      targetFileBytes = 8L << 10)
    path
  }

  test("a selective key range prunes files and preserves the result") {
    val path = rangeTable()
    val (kept, total) = StatsPruning.pruneFiles(spark, path, "okey", 100L, 500L)
    assert(total > 4, s"layout produced only $total files")
    assert(kept.size < total, s"no pruning: $kept of $total")
    val pruned = StatsPruning.readPruned(spark, path, "okey", 100L, 500L)
      .select("okey", "lnum", "qty", "part").orderBy("okey", "lnum", "qty")
      .collect().toSeq
    val full = Merge.readTable(spark, path)
      .filter(col("okey").between(100L, 500L))
      .select("okey", "lnum", "qty", "part").orderBy("okey", "lnum", "qty")
      .collect().toSeq
    assert(pruned.nonEmpty && pruned === full)
  }

  test("the distributed footer path agrees with the driver loop") {
    val path = rangeTable()
    val (driver, totalD) =
      StatsPruning.pruneFiles(spark, path, "okey", 100L, 500L)
    val prev = StatsPruning.distributeFooterReadsAbove
    StatsPruning.distributeFooterReadsAbove = 0
    try {
      val (dist, totalX) =
        StatsPruning.pruneFiles(spark, path, "okey", 100L, 500L)
      assert(totalD === totalX)
      assert(driver.sorted === dist.sorted)
    } finally StatsPruning.distributeFooterReadsAbove = prev
  }

  test("an all-null file is pruned; a value-bearing one is not") {
    val path = Merge.scratchTable("graft_spn_")
    Merge.insert(Seq((1L, "a"), (2L, "a")).toDF("v", "part")
      .withColumn("v", col("v").cast("long")).coalesce(1), path, "part")
    Merge.insert(Seq(("a"), ("a")).toDF("part")
      .select(lit(null).cast("long").as("v"), col("part")).coalesce(1),
      path, "part")
    val (kept, total) = StatsPruning.pruneFiles(spark, path, "v", 0L, 10L)
    assert(total === 2 && kept.size === 1, s"$kept of $total")
    assert(StatsPruning.readPruned(spark, path, "v", 0L, 10L).count() === 2)
  }

  test("absence is never pruned on: partition and pre-evolution columns") {
    val path = Merge.scratchTable("graft_spa_")
    Merge.insert(Seq((1L, "x", "a")).toDF("k", "s", "part"), path, "part")
    // additive evolution: only the second file carries column w
    Merge.insert(Seq((2L, "y", 7L, "b")).toDF("k", "s", "w", "part"),
      path, "part")
    // partition column lives in dir names, not footers: zero pruning,
    // values still recovered from the path
    val (kp, tp) = StatsPruning.pruneFiles(spark, path, "part", "a", "a")
    assert(kp.size === tp)
    assert(StatsPruning.readPruned(spark, path, "part", "a", "a")
      .select("k").as[Long].collect().toSeq === Seq(1L))
    // evolved column: the pre-evolution file lacks it, so it is kept —
    // and contributes nothing once the real predicate runs
    val (kw, tw) = StatsPruning.pruneFiles(spark, path, "w", 0L, 100L)
    assert(kw.size === tw)
    assert(StatsPruning.readPruned(spark, path, "w", 0L, 100L)
      .select("k").as[Long].collect().toSeq === Seq(2L))
  }

  test("string ranges prune on UTF8 binary stats") {
    val path = Merge.scratchTable("graft_spt_")
    Merge.insert(Seq(("apple", "a"), ("banana", "a")).toDF("s", "part")
      .coalesce(1), path, "part")
    Merge.insert(Seq(("melon", "a"), ("peach", "a")).toDF("s", "part")
      .coalesce(1), path, "part")
    val (kept, total) = StatsPruning.pruneFiles(spark, path, "s", "a", "c")
    assert(total === 2 && kept.size === 1, s"$kept of $total")
    assert(StatsPruning.readPruned(spark, path, "s", "a", "c")
      .count() === 2)
  }

  test("timestamp bounds stay correct whether or not stats can prune") {
    // Spark's parquet timestamp physical type is configuration-
    // dependent (INT96 carries no usable stats); the contract here is
    // conservative correctness, not a prune count
    val path = Merge.scratchTable("graft_spts_")
    val df = Seq(
      ("2024-01-01 00:00:00", "a"), ("2024-06-01 00:00:00", "a"))
      .toDF("ts", "part").withColumn("ts", col("ts").cast("timestamp"))
    Merge.insert(df, path, "part")
    val got = StatsPruning.readPruned(spark, path, "ts",
      java.sql.Timestamp.valueOf("2024-05-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-07-01 00:00:00")).count()
    assert(got === 1)
  }
}
