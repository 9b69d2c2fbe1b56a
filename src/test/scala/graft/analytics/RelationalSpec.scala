package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Value-level checks that the driver's DuckDB oracle can't express —
  * currently the approx-percentile raw-digit tracking (the q12b/q17b
  * driver keys emit hash-checkable error-contract VERDICTS; the sketch
  * digits themselves are implementation-defined and compared to exact
  * q17 here instead). */
class RelationalSpec extends SparkSpec {

  test("q31/q32: pivot cells match groupBy; grouping sets emit no grand total") {
    // the pivot is a reshaping of the plain two-key aggregate — every
    // wide cell must equal the corresponding long row
    val long = graft.Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(graft.Tables.d(sum(graft.Tables.dec(col("o_totalprice")))).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val wide = graft.SparkEntry.queries("q31_pivot")(spark, sfDir)
      .collect()
    wide.foreach { r =>
      val p = r.getString(0)
      Seq(("F", 1), ("O", 2), ("P", 3)).foreach { case (st, i) =>
        val cell = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        assert(cell === long.get((p, st)), s"($p, $st)")
      }
    }
    // grouping sets (status), (priority): every row aggregates exactly
    // ONE dimension — no (status, priority) cell, no grand total
    val gs = graft.SparkEntry.queries("q32_grouping_sets")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(gs.forall { case (s2, p) => (s2 == "ALL") != (p == "ALL") })
  }

  test("q17b approx percentiles track exact q17 within sketch error") {
    // value-level tracking of the raw sketch outputs against exact q17
    // (the driver key now emits the rank-error VERDICT row — hash-
    // checkable — so the raw-digit comparison lives here)
    val exact = graft.SparkEntry.queries("q17_percentiles")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = graft.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("p50"),
        expr("approx_percentile(l_quantity, 0.9, 10000)").as("p90"),
        expr("approx_percentile(l_extendedprice, 0.99, 10000)").as("p99"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (flag, (p50, p90, p99)) =>
      val (a50, a90, a99) = approx(flag)
      // accuracy 10000 on ~2k-row groups ⇒ near-exact; 1% relative
      // slack absorbs interpolation-vs-nearest-rank differences
      def close(a: Double, b: Double) =
        math.abs(a - b) <= 0.01 * math.max(math.abs(b), 1.0)
      assert(close(a50, p50), s"$flag p50: $a50 vs $p50")
      assert(close(a90, p90), s"$flag p90: $a90 vs $p90")
      assert(close(a99, p99), s"$flag p99: $a99 vs $p99")
    }
    // the driver key's verdict row: every contract bit is 1
    val verdicts = graft.SparkEntry
      .queries("q17b_approx_percentiles")(spark, sfDir).collect()
    assert(verdicts.nonEmpty)
    verdicts.foreach { r =>
      assert(r.getLong(1) > 0L, s"${r.getString(0)}: empty group")
      Seq(2, 3, 4).foreach(i =>
        assert(r.getInt(i) === 1, s"${r.getString(0)} col $i"))
    }
    // q12b's HLL contract: exact cardinality present, verdict 1
    graft.SparkEntry.queries("q12b_approx_distinct")(spark, sfDir)
      .collect().foreach { r =>
        assert(r.getLong(1) > 0L)
        assert(r.getInt(2) === 1, s"${r.getString(0)} HLL out of bound")
      }
  }

  test("q40 gapfill: dense calendar, LOCF carries, leading gap stays null") {
    val rows = graft.SparkEntry.queries("q40_gapfill")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    val span = rows.map(_._2).distinct.sorted
    val nDays = java.time.temporal.ChronoUnit.DAYS
      .between(span.head, span.last) + 1
    assert(span.size.toLong === nDays, "calendar has gaps")
    // every user covers the WHOLE span — resampling is global
    rows.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.length.toLong === nDays, s"user $u missing days")
      val series = rs.sortBy(_._2).map(_._3)
      // once a value is observed the fill never returns to null (LOCF)
      val firstObs = series.indexWhere(_.isDefined)
      assert(firstObs >= 0 || series.forall(_.isEmpty))
      if (firstObs >= 0) {
        assert(series.take(firstObs).forall(_.isEmpty), "pre-obs not null")
        assert(series.drop(firstObs).forall(_.isDefined), "LOCF dropped")
      }
    }
  }

  test("q41 funnel: stage times strictly ordered, stalls stay null") {
    val rows = graft.SparkEntry.queries("q41_funnel")(spark, sfDir)
      .collect()
      .map(r => (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))
        .asInstanceOf[(Option[java.sql.Timestamp], Option[java.sql.Timestamp],
          Option[java.sql.Timestamp])])
    assert(rows.nonEmpty)
    rows.foreach { case (v, c, p) =>
      assert(v.isDefined, "every row anchors on a first view")
      // a later stage implies the earlier one, strictly after it
      (c, p) match {
        case (None, Some(_)) => fail("purchase without click")
        case _ =>
      }
      c.foreach(t => assert(t.after(v.get), "click not after view"))
      p.foreach(t => assert(t.after(c.get.asInstanceOf[java.util.Date]),
        "purchase not after click"))
    }
  }
}
