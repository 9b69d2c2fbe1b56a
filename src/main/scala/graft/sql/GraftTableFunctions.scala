package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.merge.Merge

/** SQL table-valued functions over the engine's table metadata — the
  * observability half of the Athena-shaped surface (Delta's `DESCRIBE
  * HISTORY` / Hudi's `call show_commits` analogue):
  *
  *   SELECT * FROM graft_commits('<table path>')
  *
  * returns the recorded commit timeline (commit_ts, n_rows,
  * partitions) — the same rows [[Merge.commits]] serves to the
  * DataFrame API (q22 oracles them). Resolution-time cost is one
  * metadata listing of `_graft_commits/` (one tiny JSON per commit),
  * never a data scan, so an analyst can audit a 100 TB table's write
  * history for free. */
object GraftTableFunctions {

  val commitsName = "graft_commits"

  def commitsBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val path = exprs match {
      case Seq(Literal(s: UTF8String, _: StringType)) => s.toString
      case _ => throw new IllegalArgumentException(
        s"$commitsName(path) expects exactly one string literal argument")
    }
    Merge.commits(SparkSession.active, path).queryExecution.logical
  }

  val compactName = "graft_compact"

  /** `SELECT * FROM graft_compact('<path>'[, target_file_bytes])` —
    * the maintenance PROCEDURE half of the surface (Hudi's
    * `call run_compaction` / Iceberg's `CALL rewrite_data_files`
    * shape, expressed as a table function because Spark SQL has no
    * native CALL). Partition and key columns come from the table's
    * recorded key spec (`_graft_keys.json`, written by every keyed
    * op), so the analyst names only the table. Returns one row of
    * stats: (compacted_files, files_after).
    *
    * The rewrite runs when the function is RESOLVED — procedure
    * semantics. A re-analysis of the same statement re-invokes it,
    * which is safe by the compaction contract: content-invariant
    * always (q23's oracle law), and a second pass finds no small-file
    * candidates and rewrites nothing. */
  def compactBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val (path, target) = exprs match {
      case Seq(Literal(s: UTF8String, _: StringType)) =>
        (s.toString, 128L * 1024 * 1024)
      case Seq(Literal(s: UTF8String, _: StringType), Literal(n, t))
          if Seq[org.apache.spark.sql.types.DataType](
            org.apache.spark.sql.types.IntegerType,
            org.apache.spark.sql.types.LongType,
            org.apache.spark.sql.types.ShortType).contains(t) =>
        (s.toString, n.toString.toLong)
      case _ => throw new IllegalArgumentException(
        s"$compactName(path[, target_file_bytes]) expects a string " +
          "literal path and an optional integral literal byte target")
    }
    val spark = SparkSession.active
    val spec = graft.merge.KeyIndex.readSpec(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"$compactName: no recorded key spec at $path — compaction " +
          "derives its partition/key columns from _graft_keys.json, " +
          "which every keyed write records"))
    val n = Merge.compact(spark, path, spec.partitionCols, spec.keyCols,
      targetFileBytes = target, maxFiles = 1 << 20)
    val after = Merge.readTable(spark, path).inputFiles.length.toLong
    import spark.implicits._
    Seq((n, after)).toDF("compacted_files", "files_after")
      .queryExecution.logical
  }
}
