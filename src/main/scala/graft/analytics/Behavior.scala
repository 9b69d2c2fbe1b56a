package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Behavioral event analytics: batch sessionization (the gaps-and-
  * islands dual of the streaming `EventStreams.sessionize` /
  * `sessionCounts` operators) and statistical anomaly flagging — the
  * batch-audit queries an order/event lake answers after the fact
  * (reference Athena surface, `README.md:203-204`).
  *
  * Scale shapes:
  *  - [[sessionsBatch]] is two window passes over the SAME
  *    (user_id, ts-order) partitioning — Catalyst reuses one shuffle —
  *    followed by the per-session aggregate, which groups on a superset
  *    of the window key and so repartitions only the already-reduced
  *    stream. State never exceeds a lag(1) + running sum per row,
  *    unlike a collect_list sessionizer that would buffer whole users.
  *  - [[anomalies]] is the two-pass stats shape: a 5-row per-type
  *    stats aggregate broadcast back onto the scan — at 100 TB the
  *    fact table is read twice but shuffled NEVER (the stats side
  *    reduces map-side to |event_type| rows; the flag join is a
  *    broadcast hash join).
  *
  * Determinism: session boundaries compare integer microseconds;
  * variance derives from exact decimal sums (Σx, Σx²) cast to double,
  * then one fixed IEEE expression both engines evaluate identically.
  */
object Behavior {

  type Q = (SparkSession, String) => DataFrame

  /** q48 — batch sessionization: events within `gapMinutes` of the
    * previous event of the same user share a session; per-session
    * start/end/count/value. */
  def sessionsBatch(s: SparkSession, dir: String,
      gapMinutes: Int = 30): DataFrame = {
    val gapMicros = gapMinutes * 60L * 1000000L
    val ev = events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("us", unix_micros(col("ts")))
    val order = Window.partitionBy("user_id").orderBy("us", "event_id")
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(order) > gapMicros ||
          lag(col("us"), 1).over(order).isNull, lit(1)).otherwise(lit(0)))
      .withColumn("session_idx", sum(col("new_session")).over(run))
      .groupBy("user_id", "session_idx")
      .agg(
        timestamp_micros(min(col("us"))).as("session_start"),
        timestamp_micros(max(col("us"))).as("session_end"),
        count(lit(1)).as("n_events"),
        d(sum(dec(col("value")))).as("total_value"))
      .select("user_id", "session_idx", "session_start", "session_end",
        "n_events", "total_value")
      .orderBy("user_id", "session_idx")
  }

  /** q49 — z-score anomaly flags: events whose value sits more than
    * `sigmas` sample standard deviations from their event_type's mean.
    * Only types with n > 1 have a defined sample deviation. */
  def anomalies(s: SparkSession, dir: String,
      sigmas: Double = 3.0): DataFrame = {
    val ev = events(s, dir).select(col("event_id"), col("event_type"),
      col("value"))
    val stats = ev.groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        d(sum(dec(col("value")))).as("s1"),
        d(sum(dec(col("value")) * dec(col("value")))).as("s2"))
      .filter(col("n") > 1)
      // sample variance from exact sums: all-double ops on identical
      // operands — bit-identical across engines
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("std", sqrt(
        (col("n") * col("s2") - col("s1") * col("s1")) /
          (col("n") * (col("n") - lit(1)))))
      .select("event_type", "mean", "std")
    ev.join(broadcast(stats), Seq("event_type"))
      .filter(abs(col("value") - col("mean")) > lit(sigmas) * col("std"))
      .select("event_id", "event_type", "value", "mean", "std")
      .orderBy("event_id")
  }

  /** q53 — cohort retention: users grouped by FIRST-ACTIVE day, each
    * cohort tracked by how many members are active again `offset` days
    * later — the product-analytics staple (and, for a training-data
    * lake, the "is this source still producing" freshness audit).
    *
    * Scale shape: the only corpus-sized exchange is the distinct
    * (user, day) reduction — map-side combined, then every later stage
    * operates on ≤ users × days rows. The per-user first-day aggregate
    * groups on the SAME key the distinct shuffled on (Catalyst reuses
    * the exchange), cohort sizes are a ≤|days| broadcast, and the
    * rate is one fixed integer→double division. */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val um = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val cohort = um.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
    val sizes = cohort.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"))
    um.join(cohort, "user_id")
      .withColumn("offset", datediff(col("d"), col("cohort_day"))
        .cast("long"))
      .groupBy("cohort_day", "offset")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .withColumn("retention_rate",
        col("n_active").cast("double") / col("cohort_size"))
      .select("cohort_day", "cohort_size", "offset", "n_active",
        "retention_rate")
      .orderBy("cohort_day", "offset")
  }

  val queries: Map[String, Q] = Map(
    "q48_sessions_batch" -> ((s, dir) => sessionsBatch(s, dir)),
    "q49_anomaly" -> ((s, dir) => anomalies(s, dir)),
    "q53_retention" -> ((s, dir) => retention(s, dir)))

  val oracle: Map[String, String] = Map(
    // distinct active days per user, first day = cohort, integer day
    // offsets, one double division for the rate
    "q53_retention" ->
      """WITH um AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |            FROM events),
        |c AS (SELECT user_id, MIN(d) AS cohort_day FROM um GROUP BY 1),
        |sz AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM c
        |       GROUP BY 1),
        |act AS (SELECT c.cohort_day,
        |          CAST(date_diff('day', c.cohort_day, um.d) AS BIGINT)
        |            AS "offset",
        |          COUNT(*) AS n_active
        |        FROM um JOIN c USING (user_id)
        |        GROUP BY 1, 2)
        |SELECT act.cohort_day, sz.cohort_size, act."offset",
        |  act.n_active,
        |  CAST(act.n_active AS DOUBLE) / sz.cohort_size
        |    AS retention_rate
        |FROM act JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, "offset"""".stripMargin,
    "q48_sessions_batch" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, value
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, us, event_id, value,
        |    CASE WHEN us - lag(us) OVER w > 1800000000
        |           OR lag(us) OVER w IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |sess AS (
        |  SELECT user_id, us, value,
        |    CAST(SUM(new_session) OVER (
        |      PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx,
        |  make_timestamp(min(us)) AS session_start,
        |  make_timestamp(max(us)) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS total_value
        |FROM sess
        |GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "q49_anomaly" ->
      """WITH stats AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS s1,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))
        |             * CAST(value AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1 HAVING COUNT(*) > 1),
        |m AS (
        |  SELECT event_type, s1 / n AS mean,
        |    sqrt((n * s2 - s1 * s1) / (n * (n - 1))) AS std
        |  FROM stats)
        |SELECT event_id, event_type, value, mean, std
        |FROM events JOIN m USING (event_type)
        |WHERE abs(value - mean) > 3.0 * std
        |ORDER BY event_id""".stripMargin)
}
