package graft.util

import org.apache.spark.sql.SparkSession

/** Data-derived shuffle/state partitioning for streaming drains
  * (optimization guide §2.2 applied to stateful streams).
  *
  * A stateful streaming query pins its STATE partition count to
  * `spark.sql.shuffle.partitions` at query start, and every micro-batch
  * then pays a fixed per-partition, per-store cost — load the store,
  * write a delta file plus its checksum sibling, commit — regardless of
  * how much state actually exists. AQE cannot help: state partitioning
  * must stay stable across batches, so streaming aggregations/joins are
  * exempt from partition coalescing. Measured on e10_late_outer_join at
  * sf0.1 (graft.Profile): five micro-batch stages of 32 tasks burning
  * 86 s of summed task time on < 1 MB of state — per-partition store
  * overhead, not compute.
  *
  * The fix is the same discipline AQE applies to batch shuffles — size
  * partitions by BYTES, not by core count: derive the stream's shuffle
  * partitions from the input directory's size at
  * `SPARK_GRAFT_STREAM_BYTES_PER_PART` (default 1 MB) per partition,
  * clamped to [1, session shuffle.partitions]. At bench scale a few-MB
  * drain gets 1-3 state partitions (store count drops 10-32×); at
  * production scale the byte quota saturates the clamp and the
  * partitioning is exactly what the session would have used — nothing
  * here is local-mode-specific. `SPARK_GRAFT_STREAM_PARTS` forces a
  * count for A/B runs (32 = the pre-change behavior on this box).
  *
  * The conf is lowered only across query CONSTRUCTION + `.start()`:
  * `StreamingQueryManager.startQuery` clones the session, and the
  * clone's captured conf (plus the OffsetSeqMetadata it checkpoints)
  * is what every micro-batch's stateful plan uses — so the stream
  * keeps the adapted partitioning for its whole life while the OUTER
  * session's conf is restored before the first foreachBatch body runs.
  * That split is measured, not stylistic: an A/B that kept the outer
  * conf lowered for the whole drain regressed every foreachBatch body
  * that does real merge/view work through the outer session (x09
  * maintainView 4.88→5.43 s, e27's in-body retrain +2 s) while the
  * stateful drains won; restoring after start keeps both.
  *
  * Results are partition-count-independent by construction (hash
  * aggregation, watermark semantics and join matching do not depend on
  * how keys are sharded).
  */
object StreamTuning {
  private val confKey = "spark.sql.shuffle.partitions"

  /** Recursive byte size of a directory (0 when unreadable/absent). */
  def dirBytes(spark: SparkSession, dir: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    } catch { case _: Throwable => 0L }

  /** The partition count a drain over `inputDir` should run with. */
  def streamPartitions(spark: SparkSession, inputDir: String): Int = {
    val session =
      try spark.conf.get(confKey).toInt catch { case _: Throwable => 32 }
    sys.env.get("SPARK_GRAFT_STREAM_PARTS").map(_.toInt).getOrElse {
      val perPart = sys.env.get("SPARK_GRAFT_STREAM_BYTES_PER_PART")
        .map(_.toLong).getOrElse(1L << 20)
      val bytes = dirBytes(spark, inputDir)
      math.max(1L, math.min(session.toLong,
        (bytes + perPart - 1) / perPart)).toInt
    }
  }

  /** Build and `.start()` a streaming query inside `mk` with shuffle
    * partitions sized from `inputDir`; the session value is restored
    * as soon as `mk` returns (the started query's cloned session keeps
    * the adapted value for every micro-batch — see the object doc). */
  def startAdapted[T](spark: SparkSession, inputDir: String)(
      mk: => T): T = {
    val before = spark.conf.getOption(confKey)
    spark.conf.set(confKey, streamPartitions(spark, inputDir).toString)
    try mk
    finally before match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }
}
