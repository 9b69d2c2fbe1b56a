package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

import Expectations.Expectation

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(10.0), "ok"),
    (2L, Some(-1.0), "ok"),
    (3L, None, "bad"),
    (4L, Some(5.0), "ok")
  ).toDF("id", "v", "status")

  private val rules = Seq(
    Expectation("v_positive", col("v") > 0),
    Expectation("status_ok", col("status") === "ok"))

  test("report: one row per rule, NULL predicate counts as a violation") {
    val rep = Expectations.report(df, rules).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    // id=2 fails v_positive outright, id=3 fails it via NULL
    assert(rep("v_positive") === ((4L, 2L, false)))
    assert(rep("status_ok") === ((4L, 1L, false)))
  }

  test("split: clean + violations partition the input, evidence named") {
    val (clean, bad) = Expectations.split(df, rules)
    assert(clean.count() + bad.count() === df.count())
    assert(clean.select("id").as[Long].collect().toSet === Set(1L, 4L))
    val evidence = bad.select(col("id"), col("_failed_expectations"))
      .as[(Long, Seq[String])].collect().toMap
    assert(evidence(2L) === Seq("v_positive"))
    assert(evidence(3L).toSet === Set("v_positive", "status_ok"))
    // the split is narrow — no shuffle on either side
    assert(graft.scale.Scale.isShuffleFree(clean))
    assert(graft.scale.Scale.isShuffleFree(bad))
  }

  test("report sums agree with the split, duplicate names rejected") {
    val rep = Expectations.report(df, rules)
      .agg(sum("n_violations")).as[Long].head
    val perRow = Expectations.annotate(df, rules)
      .agg(sum(size(col("_failed_expectations")))).as[Long].head
    assert(rep === perRow)
    intercept[IllegalArgumentException] {
      Expectations.report(df, Seq(rules.head, rules.head))
    }
  }

  test("p06: summed per-batch stream reports equal the whole-corpus report") {
    val out = Expectations.queries("p06_stream_expectations")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val whole = graft.Tables.events(spark, sfDir)
    out.foreach { case (_, (nBatches, nRows, _)) =>
      assert(nBatches === 2L)
      assert(nRows === whole.count())
    }
    // the rules genuinely discriminate on this corpus
    assert(out("no_errors")._3 > 0)
    assert(out("value_cap")._3 > 0)
    assert(out("user_known")._3 === 0)
  }
}
