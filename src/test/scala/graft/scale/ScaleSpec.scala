package graft.scale

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_linenumber")
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy("l_orderkey").count()
    val salted = Scale.saltedEquiJoin(li, o, Seq("l_orderkey"), factor = 4)
      .groupBy("l_orderkey").count()
    assert(plain.count() === salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salt values actually spread rows across the factor range") {
    val li = Tables.lineitem(spark, sfDir)
    val salts = li.select(
      pmod(xxhash64(li.columns.map(col): _*), lit(8)).cast("int").as("s"))
      .distinct().as[Int].collect().toSet
    assert(salts.size >= 6) // near-uniform over 8 buckets
  }

  test("bucketed-by-key tables join with zero shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    // a previously-failed run can leave the managed location behind
    Seq("b_lineitem", "b_orders").foreach { t =>
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Scale.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"),
      "b_lineitem", Seq("l_orderkey"), 4)
    Scale.writeBucketed(
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
      "b_orders", Seq("l_orderkey"), 4)
    // force a sort-merge join so the bucketed layout (not a broadcast)
    // is what eliminates the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), Seq("l_orderkey"))
      joined.collect()
      assert(Scale.isShuffleFree(joined),
        joined.queryExecution.executedPlan.toString)
      // and the result is right
      assert(joined.count() ===
        Tables.lineitem(spark, sfDir).join(
          Tables.orders(spark, sfDir)
            .select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
