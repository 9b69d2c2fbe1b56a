package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Value-level checks that the driver's DuckDB oracle can't express —
  * currently the approx-percentile error bound (sketch contents are
  * implementation-defined, so q17b is a rows-only driver row; this spec
  * is its hard correctness signal). */
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
    def byFlag(name: String): Map[String, (Double, Double, Double)] =
      graft.SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = byFlag("q17_percentiles")
    val approx = byFlag("q17b_approx_percentiles")
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
  }
}
