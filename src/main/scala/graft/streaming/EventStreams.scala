package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Event-time streaming surface: watermarked windowed aggregation and
  * custom sessionization state — the Structured Streaming operators a
  * continuously-fed `transactions`/`events` lake needs (the reference
  * defines no event-time behavior — SURVEY §2.5 "absent" — so these are
  * engine extensions on stock Spark primitives).
  *
  * Scale notes: windowed aggregation state is keyed by (window, key) and
  * pruned by the watermark — state size is bounded by keys × open
  * windows, independent of stream length. Sessionization state is one
  * small struct per active user; `GroupStateTimeout.EventTimeTimeout`
  * closes sessions exactly when the watermark passes the gap.
  */
object EventStreams {

  /** The events schema as produced by the testdata generator (ts as
    * microsecond timestamp — see [[graft.Tables.events]]). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window per-type counts/sums with a watermark: late rows
    * beyond `lateness` are dropped, on-time late rows update their
    * window (standard event-time semantics). */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  final case class SessionIn(user_id: Long, ts: java.sql.Timestamp,
      value: Double)
  final case class SessionState(start: Long, last: Long, n: Int,
      total: Double)
  final case class SessionOut(user_id: Long, start_ts: Long, end_ts: Long,
      n_events: Int, total_value: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState: events
    * within `gapMs` of each other join a session; a session closes when
    * the event-time watermark passes its last event + gap. */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30 * 60 * 1000L,
      lateness: String = "30 minutes"): DataFrame = {
    import spark.implicits._
    val typed = events.withWatermark("ts", lateness)
      .select(col("user_id"), col("ts"), col("value")).as[SessionIn]

    val fn = (user: Long, rows: Iterator[SessionIn],
        state: GroupState[SessionState]) => {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(user, s.start, s.last, s.n, s.total))
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var out = List.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last <= gapMs =>
              cur = Some(SessionState(s.start, math.max(s.last, t),
                s.n + 1, s.total + e.value))
            case Some(s) => // gap exceeded: emit and start fresh
              out ::= SessionOut(user, s.start, s.last, s.n, s.total)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapMs)
        }
        out.reverseIterator
      }
    }
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
      .toDF()
  }

  /** Drain a parquet events directory through the windowed aggregation
    * into an in-memory table (deterministic test/batch-parity runs). */
  def runWindowedAvailableNow(spark: SparkSession, inputDir: String,
      checkpointDir: String, sinkTable: String): StreamingQuery = {
    val src = spark.readStream.schema(eventSchema).parquet(inputDir)
    windowedCounts(src)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .queryName(sinkTable)
      .start()
  }
}
