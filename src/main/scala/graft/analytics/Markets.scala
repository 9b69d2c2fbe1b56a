package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Market/position analytics — the query family the reference's domain
  * (a dollar-cost-averaging order manager, reference `README.md:7-14`,
  * `pkg/orders/common.go`) implies over its accumulated fill history:
  * volume-weighted prices, running cost basis / unrealized PnL, and
  * rolling time-window aggregates. Expressed over the TPC-H-ish
  * testdata (a lineitem row = one fill of a part at an implied unit
  * price; reference transactions carry the same price/vol/cost trio —
  * `pkg/orders/common.go:18-29`).
  *
  * Scale shapes:
  *  - [[vwap]] is one shuffle (groupBy brand×month) after a fact×dim
  *    join Catalyst is free to plan (broadcast at small dim sizes, SMJ
  *    beyond); partial aggregation does the heavy lifting map-side.
  *  - [[costBasis]] is one window shuffle keyed on the instrument —
  *    running sums are computed in a single pass per partition, and
  *    the partition key (partkey) has uniform cardinality, so no
  *    skew-salting is needed.
  *  - [[rollingDaily]] pre-aggregates to (priority, day) FIRST — the
  *    rolling RANGE frame then slides over ~2.4k rows per priority
  *    regardless of fact cardinality: the window's input is bounded by
  *    the calendar, not the data. That ordering (aggregate, then
  *    window over the aggregate) is what keeps a 100 TB fact table out
  *    of the sort.
  *
  * Determinism (driver hash-compare): sums go through exact decimals
  * (see [[graft.Tables]]); every ratio/PnL is a scalar double op on
  * bit-identical operands, so Spark and DuckDB agree bit-for-bit; all
  * window orders carry a total tie-break; results end in a total
  * orderBy.
  */
object Markets {

  type Q = (SparkSession, String) => DataFrame

  /** q45 — VWAP per (brand, month): Σ turnover / Σ volume, the price a
    * DCA buyer actually paid over the period vs the period's quotes. */
  val vwap: Q = (s, dir) =>
    lineitem(s, dir)
      .join(part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(
        d(sum(dec(col("l_extendedprice")))).as("turnover"),
        d(sum(dec(col("l_quantity")))).as("volume"),
        count(lit(1)).as("n_fills"))
      .withColumn("vwap", col("turnover") / col("volume"))
      .orderBy("brand", "month")

  /** q46 — running average-cost basis and unrealized PnL per
    * instrument: after each fill, position = Σqty, basis = Σcost/Σqty,
    * and PnL marks the position to the instrument's LAST fill price.
    * One window shuffle on the instrument key; the mark-to-last is the
    * same window with an unbounded frame — no second shuffle. */
  val costBasis: Q = (s, dir) => {
    val fills = lineitem(s, dir)
      .join(part(s, dir).filter(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val run = Window.partitionBy("l_partkey").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = Window.partitionBy("l_partkey").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    fills
      .withColumn("fill_price", col("l_extendedprice") / col("l_quantity"))
      .withColumn("cum_qty", d(sum(dec(col("l_quantity"))).over(run)))
      .withColumn("cum_cost", d(sum(dec(col("l_extendedprice"))).over(run)))
      .withColumn("avg_cost", col("cum_cost") / col("cum_qty"))
      .withColumn("last_price", last(col("fill_price")).over(full))
      .withColumn("unrealized",
        (col("last_price") - col("avg_cost")) * col("cum_qty"))
      .select("l_partkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "fill_price", "cum_qty", "avg_cost", "last_price", "unrealized")
      .orderBy("l_partkey", "l_shipdate", "l_orderkey", "l_linenumber")
  }

  /** q47 — rolling 7-day totals/means over a pre-aggregated daily
    * series (RANGE frame on the day number, so gaps in the calendar
    * shrink the window rather than sliding over phantom rows). */
  val rollingDaily: Q = (s, dir) => {
    val daily = orders(s, dir)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(d(sum(dec(col("o_totalprice")))).as("daily_total"))
      .withColumn("dn", datediff(col("day"), lit("1992-01-01").cast("date")))
    val w = Window.partitionBy("priority").orderBy("dn").rangeBetween(-6, 0)
    daily
      .withColumn("roll_total", d(sum(dec(col("daily_total"))).over(w)))
      .withColumn("roll_days", count(lit(1)).over(w))
      .withColumn("roll_avg", col("roll_total") / col("roll_days"))
      .select("priority", "day", "daily_total", "roll_total", "roll_days",
        "roll_avg")
      .orderBy("priority", "day")
  }

  /** q51 — period-over-period reporting: monthly totals per priority
    * with month-over-month and year-over-year deltas and the MoM
    * percentage. Lag offsets walk the OBSERVED month sequence (the
    * series is dense over the order span); the window slides over the
    * pre-aggregated ~84-row-per-priority series, never the fact table
    * — the same aggregate-below-window discipline as q47. */
  val periodOverPeriod: Q = (s, dir) => {
    val monthly = orders(s, dir)
      .groupBy(col("o_orderpriority").as("priority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(d(sum(dec(col("o_totalprice")))).as("total"))
    val w = Window.partitionBy("priority").orderBy("month")
    monthly
      .withColumn("prev_month_total", lag(col("total"), 1).over(w))
      .withColumn("prev_year_total", lag(col("total"), 12).over(w))
      .withColumn("mom_delta", col("total") - col("prev_month_total"))
      .withColumn("yoy_delta", col("total") - col("prev_year_total"))
      .withColumn("mom_pct",
        (col("total") - col("prev_month_total")) * lit(100.0) /
          col("prev_month_total"))
      .select("priority", "month", "total", "prev_month_total",
        "prev_year_total", "mom_delta", "yoy_delta", "mom_pct")
      .orderBy("priority", "month")
  }

  val queries: Map[String, Q] = Map(
    "q45_vwap" -> vwap,
    "q46_cost_basis" -> costBasis,
    "q47_rolling" -> rollingDaily,
    "q51_period_over_period" -> periodOverPeriod)

  val oracle: Map[String, String] = Map(
    "q45_vwap" ->
      """SELECT p_brand AS brand, strftime(l_shipdate, '%Y-%m') AS month,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
        |    AS turnover,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS volume,
        |  COUNT(*) AS n_fills,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
        |    / CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS vwap
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q46_cost_basis" ->
      """WITH fills AS (
        |  SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
        |         l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#23'),
        |c AS (
        |  SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
        |    l_extendedprice / l_quantity AS fill_price,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER run AS DOUBLE)
        |      AS cum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) OVER run
        |      AS DOUBLE) AS cum_cost,
        |    last_value(l_extendedprice / l_quantity) OVER wfull AS last_price
        |  FROM fills
        |  WINDOW
        |    run AS (PARTITION BY l_partkey
        |            ORDER BY l_shipdate, l_orderkey, l_linenumber
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wfull AS (PARTITION BY l_partkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber
        |             ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND UNBOUNDED FOLLOWING))
        |SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, fill_price,
        |  cum_qty, cum_cost / cum_qty AS avg_cost, last_price,
        |  (last_price - cum_cost / cum_qty) * cum_qty AS unrealized
        |FROM c
        |ORDER BY l_partkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,
    // deltas/pct are scalar double ops on identical exact-decimal-
    // derived operands; lag walks the same observed month order
    "q51_period_over_period" ->
      """WITH m AS (
        |  SELECT o_orderpriority AS priority,
        |         strftime(o_orderdate, '%Y-%m') AS month,
        |         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
        |           AS total
        |  FROM orders GROUP BY 1, 2)
        |SELECT priority, month, total,
        |  lag(total, 1) OVER w AS prev_month_total,
        |  lag(total, 12) OVER w AS prev_year_total,
        |  total - lag(total, 1) OVER w AS mom_delta,
        |  total - lag(total, 12) OVER w AS yoy_delta,
        |  (total - lag(total, 1) OVER w) * 100.0 / lag(total, 1) OVER w
        |    AS mom_pct
        |FROM m
        |WINDOW w AS (PARTITION BY priority ORDER BY month)
        |ORDER BY priority, month""".stripMargin,
    "q47_rolling" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(o_orderdate AS DATE) AS day,
        |         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
        |           AS daily_total,
        |         date_diff('day', DATE '1992-01-01',
        |                   CAST(o_orderdate AS DATE)) AS dn
        |  FROM orders GROUP BY 1, 2, 4)
        |SELECT priority, day, daily_total,
        |  CAST(SUM(CAST(daily_total AS DECIMAL(12,2))) OVER w AS DOUBLE)
        |    AS roll_total,
        |  COUNT(*) OVER w AS roll_days,
        |  CAST(SUM(CAST(daily_total AS DECIMAL(12,2))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w AS roll_avg
        |FROM daily
        |WINDOW w AS (PARTITION BY priority ORDER BY dn
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY priority, day""".stripMargin)
}
