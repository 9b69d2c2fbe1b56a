package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Column profiling: per-column row/null/distinct counts and numeric
  * bounds in ONE aggregation — the dataset-statistics pass a curation
  * pipeline runs before deciding schemas, rules ([[Expectations]]) and
  * partition layouts.
  *
  * Scale shape: all columns profile in a single `agg` over one scan.
  * The EXACT distinct counts make Spark plan the multi-distinct Expand
  * (shuffle input grows ×(columns+1)) — correct and oracle-matchable,
  * the right default for profiling runs that are rare and audited.
  * [[profileApprox]] is the 100 TB fast path: HLL distinct estimates,
  * no Expand, one plain partial-aggregated pass (same contract split
  * as exact q12/q17 vs sketch q12b/q17b).
  */
object Profile {

  private def aggsFor(c: String, exact: Boolean) = Seq(
    count(lit(1)).as(s"__n_$c"),
    sum(col(c).isNull.cast("long")).as(s"__nn_$c"),
    (if (exact) count_distinct(col(c))
     else approx_count_distinct(col(c))).as(s"__nd_$c"),
    min(col(c)).cast("double").as(s"__mn_$c"),
    max(col(c)).cast("double").as(s"__mx_$c"))

  private def run(df: DataFrame, cols: Seq[String], exact: Boolean)
      : DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c),
      s"column $c not in ${df.columns.mkString(",")}"))
    val aggs = cols.flatMap(aggsFor(_, exact))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col(s"__n_$c").as("n_rows"),
        col(s"__nn_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_v"),
        col(s"__mx_$c").as("max_v"))): _*)).as("p"))
      .select("p.*")
  }

  /** Exact profile: one row per column — (col_name, n_rows, n_null,
    * n_distinct, min_v, max_v); bounds cast to double (numeric /
    * castable columns). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    run(df, cols, exact = true)

  /** [[profile]] with HLL distinct estimates — no Expand, single plain
    * pass; the profiling default at 100 TB. */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    run(df, cols, exact = false)

  type Q = (SparkSession, String) => DataFrame

  /** p04: the exact profile of lineitem's measure columns. */
  val queries: Map[String, Q] = Map(
    "p04_profile" -> ((s, dir) =>
      profile(Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_name")))

  val oracle: Map[String, String] = Map(
    "p04_profile" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |  COUNT(CASE WHEN $c IS NULL THEN 1 END) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(MIN($c) AS DOUBLE) AS min_v,
           |  CAST(MAX($c) AS DOUBLE) AS max_v
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    })
}
