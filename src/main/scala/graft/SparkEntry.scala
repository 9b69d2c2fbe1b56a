package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query inventories. Every key with an entry in
  * [[oracleSql]] is hash-checked against DuckDB by the driver; keys without
  * one get a weaker rows-only check (reserved for ops whose semantics are
  * not SQL-expressible, e.g. HLL sketches or LSH bucketing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Relational.aggPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data extension inventory (text / dedup / similarity /
    * multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.Relational.queries ++ analytics.Markets.queries ++
      analytics.Behavior.queries ++ text.TextAnalysis.queries ++
      dedup.Dedup.queries ++ similarity.Similarity.queries ++
      multimodal.Multimodal.queries ++ merge.Merge.queries ++
      merge.MorTable.queries ++ pipeline.TrainingPipeline.queries ++
      pipeline.Expectations.queries ++ pipeline.Profile.queries ++
      pipeline.IngestDedup.queries ++
      streaming.EventStreams.queries ++ scale.Scale.queries ++
      sources.GraftSourceQueries.queries ++ merge.Occ.queries ++
      sql.AnalystDay.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    analytics.Relational.oracle ++ analytics.Markets.oracle ++
      analytics.Behavior.oracle ++ text.TextAnalysis.oracle ++
      dedup.Dedup.oracle ++ similarity.Similarity.oracle ++
      multimodal.Multimodal.oracle ++ merge.Merge.oracle ++
      merge.MorTable.oracle ++ pipeline.TrainingPipeline.oracle ++
      pipeline.Expectations.oracle ++ pipeline.Profile.oracle ++
      pipeline.IngestDedup.oracle ++
      streaming.EventStreams.oracle ++ scale.Scale.oracle ++
      sources.GraftSourceQueries.oracle ++ merge.Occ.oracle ++
      sql.AnalystDay.oracle
}
