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
}
