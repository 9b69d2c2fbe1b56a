package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The checkpoint-manager override matrix (r14 VERDICT task 8).
  *
  * [[graft.SessionTuning]] defaults the streaming checkpoint file
  * manager to Spark's FileSystem-based implementation because the
  * FileContext-based default forks a `readlink` process per rename on
  * the LOCAL filesystem — but HDFS/object-store deployments must be
  * able to route back to the FileContext manager via
  * `SPARK_GRAFT_CKPT_MANAGER` without the local-FS default leaking in.
  * This spec pins both halves: the default the env hook falls back to,
  * and that a stateful drain is green (same results) under EITHER
  * manager — so flipping the env var per deployment can never change
  * answers, only the rename mechanics.
  */
class CheckpointManagerSpec extends SparkSpec {

  private val confKey = "spark.sql.streaming.checkpointFileManagerClass"
  private val fsManager =
    "org.apache.spark.sql.execution.streaming.checkpointing." +
      "FileSystemBasedCheckpointFileManager"
  private val fcManager =
    "org.apache.spark.sql.execution.streaming.checkpointing." +
      "FileContextBasedCheckpointFileManager"

  test("SessionTuning's fallback when SPARK_GRAFT_CKPT_MANAGER is " +
    "absent is the FileSystem-based class") {
    assert(graft.SessionTuning.defaultCheckpointManager === fsManager)
  }

  private def drainCounts(manager: String): Seq[(String, Long)] = {
    val before = spark.conf.getOption(confKey)
    spark.conf.set(confKey, manager)
    try {
      val base = tmpDir(s"ckptmgr_")
      val in = s"$base/in"
      import spark.implicits._
      Seq((1L, "a"), (2L, "b"), (3L, "a"))
        .toDF("id", "k").write.parquet(in)
      val name = "ckpt_mgr_" + math.abs(manager.hashCode).toString
      val q = spark.readStream
        .schema("id LONG, k STRING")
        .parquet(in)
        .groupBy("k").count()
        .writeStream
        .outputMode("complete")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .format("memory").queryName(name)
        .start()
      q.awaitTermination()
      spark.table(name).select(col("k"), col("count"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .toSeq.sortBy(_._1)
    } finally before match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  test("a stateful drain is green and result-identical under BOTH " +
    "managers (the per-deployment override can't change answers)") {
    val fs = drainCounts(fsManager)
    val fc = drainCounts(fcManager)
    assert(fs === Seq(("a", 2L), ("b", 1L)))
    assert(fc === fs)
  }
}
