package graft.pipeline

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(1.0)), (2L, Some(2.0)), (3L, Some(2.0)), (4L, None)
  ).toDF("id", "v")

  test("profile: exact counts, nulls, distincts, bounds") {
    val rows = Profile.profile(df, Seq("id", "v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(rows("id") === ((4L, 0L, 4L, 1.0, 4.0)))
    assert(rows("v") === ((4L, 1L, 2L, 1.0, 2.0)))
  }

  test("profileApprox tracks exact and plans no Expand") {
    val approx = Profile.profileApprox(df, Seq("id", "v"))
    val nd = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL on tiny cardinalities is exact
    assert(nd("id") === 4L && nd("v") === 2L)
    // the exact path pays the multi-distinct Expand; the approx path
    // must not — that asymmetry IS its reason to exist
    assert(Profile.profile(df, Seq("id", "v")).queryExecution
      .executedPlan.toString.contains("Expand"))
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
  }
}
