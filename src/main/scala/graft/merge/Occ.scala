package graft.merge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Optimistic concurrency, end-to-end: two writers upserting ONE
  * versioned table at the same time.
  *
  * The reference serializes its pipeline externally
  * (`max_concurrent_runs = 1`, `terraform/glue.tf:94-96`); this key
  * exercises what that setting exists to avoid — and what a 100 TB
  * deployment with several ingest pipelines hits daily. The engine's
  * concurrency model (Hudi-OCC-shaped, see [[Merge]] scaladoc):
  *
  *  - commit IDS are race-free everywhere: the exclusive-create
  *    inflight marker gives each writer a distinct id no matter the
  *    interleaving;
  *  - non-conflicting DATA commits (disjoint file groups — here,
  *    disjoint hive partitions) both land, because their supersede /
  *    rename sets never intersect;
  *  - conflicting commits are detected (vanished-superseded-file
  *    check) and fail loudly before publishing, leaving the table on
  *    the winner's state.
  *
  * The driver key runs the SUCCESS path — two threads, disjoint
  * partition sets, one table — and hash-checks the final state against
  * a serial replay in DuckDB (disjointness makes the serial order
  * irrelevant, which is exactly what makes the oracle deterministic).
  * The conflict path stays spec-pinned (`MergeSpec` "vanished
  * superseded file").
  */
object Occ {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "x19_concurrent_writers" -> { (s, dir) =>
      val t = graft.util.Scratch.fresh("graft_x19_") + "/table"
      val keys = Seq("l_orderkey", "l_linenumber")
      val base = lineitem(s, dir).select(col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"), col("l_returnflag"))
      // seed commit: all of lnum <= 2, serially
      Merge.upsertVersioned(s, base.filter(col("l_linenumber") <= 2), t,
        keys, "l_extendedprice", Seq("l_returnflag"))
      // two RACING writers on disjoint partition sets: A bumps the
      // 'A' partition, B bumps 'N' + 'R' — their file groups never
      // intersect, so OCC lets both land
      val batchA = base.filter(col("l_linenumber") === 2 &&
          col("l_returnflag") === "A")
        .withColumn("l_extendedprice", col("l_extendedprice") + lit(10.0))
      val batchB = base.filter(col("l_linenumber") === 2 &&
          col("l_returnflag").isin("N", "R"))
        .withColumn("l_extendedprice", col("l_extendedprice") + lit(20.0))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val fa = Future(Merge.upsertVersioned(s, batchA, t, keys,
        "l_extendedprice", Seq("l_returnflag")))
      val fb = Future(Merge.upsertVersioned(s, batchB, t, keys,
        "l_extendedprice", Seq("l_returnflag")))
      val ca = Await.result(fa, 10.minutes)
      val cb = Await.result(fb, 10.minutes)
      require(ca != cb, "exclusive claim shared a commit id")
      // 3 = seed + both racers: proves neither writer aborted
      // (metadata-scale count, like the x17 commit-cursor collect)
      val nCommits = Merge.commits(s, t).count()
      Merge.readTable(s, t)
        .groupBy("l_returnflag", "l_linenumber")
        .agg(count(lit(1)).as("n"),
          d(sum(dec(col("l_extendedprice")))).as("total"))
        .withColumn("n_commits", lit(nCommits))
        .orderBy("l_returnflag", "l_linenumber")
    })

  /** Serial replay: seed dedup, then both batches' per-identity
    * replacement (disjoint partitions → order-free). */
  val oracle: Map[String, String] = Map(
    "x19_concurrent_writers" ->
      """WITH seed AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag
        |  FROM (
        |    SELECT l_orderkey, l_linenumber, l_extendedprice,
        |           l_returnflag,
        |           row_number() OVER (
        |             PARTITION BY l_orderkey, l_linenumber, l_returnflag
        |             ORDER BY l_extendedprice DESC) AS rn
        |    FROM lineitem WHERE l_linenumber <= 2) WHERE rn = 1),
        |upd AS (
        |  SELECT l_orderkey, l_linenumber,
        |         max(l_extendedprice) + 10.0 AS l_extendedprice,
        |         l_returnflag
        |  FROM lineitem
        |  WHERE l_linenumber = 2 AND l_returnflag = 'A'
        |  GROUP BY l_orderkey, l_linenumber, l_returnflag
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber,
        |         max(l_extendedprice) + 20.0 AS l_extendedprice,
        |         l_returnflag
        |  FROM lineitem
        |  WHERE l_linenumber = 2 AND l_returnflag IN ('N', 'R')
        |  GROUP BY l_orderkey, l_linenumber, l_returnflag),
        |final AS (
        |  SELECT * FROM upd
        |  UNION ALL
        |  SELECT s.* FROM seed s WHERE NOT EXISTS (
        |    SELECT 1 FROM upd u
        |    WHERE u.l_orderkey = s.l_orderkey
        |      AND u.l_linenumber = s.l_linenumber
        |      AND u.l_returnflag = s.l_returnflag))
        |SELECT l_returnflag, l_linenumber, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS total,
        |  CAST(3 AS BIGINT) AS n_commits
        |FROM final
        |GROUP BY l_returnflag, l_linenumber
        |ORDER BY l_returnflag, l_linenumber""".stripMargin)
}
