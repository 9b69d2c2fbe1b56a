package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {

  test("sessionsBatch: conservation — every event lands in exactly one session") {
    val ev = graft.Tables.events(spark, sfDir)
    val out = Behavior.sessionsBatch(spark, sfDir).cache()
    assert(out.agg(sum("n_events")).head.getLong(0) === ev.count())
    // decimal-exact conservation of value
    val evTotal = ev.agg(
      sum(graft.Tables.dec(col("value")))).head.getDecimal(0)
    val sessTotal = out.agg(
      sum(graft.Tables.dec(col("total_value")))).head.getDecimal(0)
    assert(evTotal.compareTo(sessTotal) === 0)
    out.unpersist()
  }

  test("sessionsBatch: consecutive sessions of a user are separated by > gap") {
    val out = Behavior.sessionsBatch(spark, sfDir, gapMinutes = 30)
    val w = Window.partitionBy("user_id").orderBy("session_idx")
    val tight = out
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        unix_micros(col("session_start")) - unix_micros(col("prev_end"))
          <= 30L * 60 * 1000000)
    assert(tight.isEmpty)
    // and session bounds are ordered
    assert(out.filter(col("session_end") < col("session_start")).isEmpty)
  }

  test("sessionsBatch agrees with the streaming sessionizer's session count") {
    // the batch gaps-and-islands pass and the stateful streaming
    // sessionizer implement the SAME gap semantics; their session
    // inventories must coincide
    val batch = Behavior.sessionsBatch(spark, sfDir).count()
    val streaming = graft.streaming.EventStreams
      .queries("e02_sessions")(spark, sfDir).count()
    assert(batch === streaming)
  }

  test("anomalies: every flag honors the 3-sigma contract; flags are rare") {
    val ev = graft.Tables.events(spark, sfDir)
    val out = Behavior.anomalies(spark, sfDir).cache()
    assert(out.filter(
      abs(col("value") - col("mean")) <= lit(3.0) * col("std")).isEmpty)
    val frac = out.count().toDouble / ev.count()
    assert(frac < 0.05, s"flag fraction $frac")
    assert(out.count() > 0) // the synthetic tail does produce outliers
    out.unpersist()
  }
}
