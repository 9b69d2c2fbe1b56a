package graft

import org.apache.spark.sql.SparkSession

/** Scale-adaptive session tuning shared by the CLI mains (Bench,
  * Verify, Profile, Plans) — optimization guide §2.2/§6.
  *
  * `canChangeCachedPlanOutputPartitioning=true` lets AQE's byte-based
  * partition coalescing see through `persist()`ed plans — above all
  * the merge path's cached deduped batches. With the stock `false`, a
  * cached plan pins its materialization to the static shuffle
  * partition count (32 here), and every consumer stage — including
  * every staged commit WRITE — inherits that fan-out: measured on
  * q18_upsert_replay at sf0.1 (graft.Profile + a file watcher), a
  * 3-commit replay of < 1 MB of data ran 825 tasks and left **176
  * parquet files averaging 958 bytes**; with the flag on it runs 43
  * tasks and leaves 6 files. The effect compounds, because every
  * later commit, key scan and snapshot read re-lists and re-opens
  * those files — the §6 small-files discipline.
  *
  * `coalescePartitions.parallelismFirst` is deliberately LEFT at its
  * stock `true`: Spark then coalesces toward
  * `max(totalBytes/defaultParallelism, minPartitionSize)` rather than
  * straight to the 64 MB advisory target, which keeps
  * byte-proportional parallelism on compute-dense small shuffles
  * (an A/B with `false` collapsed window/percentile/HLL reduce sides
  * to ONE partition and regressed q05 2.8×, q33 2.0×, q12b 1.5× at
  * sf0.1) while converging to exactly the advisory-sized behavior
  * once partitions are large — at cluster scale the two settings
  * agree. File-count-wise the cache flag alone already collapses the
  * KB-scale merge batches to single-partition writes.
  *
  * Env overrides keep the knobs parameterised per deployment; the
  * defaults are what the committed bench figures measure.
  */
object SessionTuning {
  def tuned(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      sys.env.getOrElse("SPARK_GRAFT_AQE_CACHED_REPARTITION", "true"))
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY_BYTES", "64m"))
}
