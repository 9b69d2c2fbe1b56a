package graft.merge

import graft.SparkSpec

class OccSpec extends SparkSpec {
  test("x19: racing disjoint writers land as three commits, state sane") {
    val df = Occ.queries("x19_concurrent_writers")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every row carries the same commit count: seed + both racers
    assert(rows.map(_.getAs[Long]("n_commits")).toSet === Set(3L))
    // the bumped partitions exist on the lnum=2 slice
    assert(rows.count(r => r.getAs[Int]("l_linenumber") == 2) >= 3)
  }
}
