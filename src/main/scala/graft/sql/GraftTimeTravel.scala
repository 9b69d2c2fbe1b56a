package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.catalog.{CatalogTable, CatalogUtils}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.merge.Merge

/** SQL time travel over graft tables: `SELECT ... FROM t VERSION AS OF
  * <commit>` resolves to the engine's as-of snapshot read — the query
  * surface for the timeline the merge layer already records (API read:
  * `option("asOf", ...)`; reference analogue: Hudi's
  * `as.of.instant` / Athena's hive-synced history queries,
  * `terraform/glue.tf:119-122`).
  *
  * Spark resolves time travel natively only for DSv2 catalogs, so this
  * resolution rule intercepts the unresolved [[RelationTimeTravel]]
  * while the main resolution batch runs and swaps in the graft
  * relation with the `asOf` option set. Semantics:
  *
  *  - `VERSION AS OF n`: the table state after commit id `n` (commit
  *    ids are the timeline's monotonically-claimed logical versions —
  *    `Merge.commits` lists them). Non-numeric versions fail loudly.
  *  - `TIMESTAMP AS OF t`: the state after the latest commit RECORDED
  *    at or before instant `t` — each commit record carries its
  *    recording wall clock (`wall_ms`), and
  *    [[graft.merge.Merge.commitAtWallClock]] maps the instant to a
  *    commit id (Hudi's `as.of.instant`). Wall clock is the writer's
  *    clock: under multi-writer skew the mapping is as honest as the
  *    clocks are, and commit-id order remains the only ordering the
  *    engine itself trusts — both caveats documented on the resolver.
  *
  * Cost shape: identical to the API as-of read — a metadata replay of
  * the commit log picks the resident file set; no data movement. */
case class ResolveGraftTimeTravel(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case RelationTimeTravel(u: UnresolvedRelation, ts, version)
          if graftMeta(u.multipartIdentifier).isDefined =>
        val meta = graftMeta(u.multipartIdentifier).get
        val path = meta.storage.properties.collectFirst {
          case (k, p) if k.equalsIgnoreCase("path") => p
        }.orElse(meta.storage.locationUri.map(CatalogUtils.URIToString))
          .getOrElse(throw new IllegalArgumentException(
            s"graft time travel: ${u.multipartIdentifier.mkString(".")} " +
              "has no recorded path"))
        val commit = ts match {
          case Some(expr) =>
            // TIMESTAMP AS OF t: evaluate the (foldable) instant in the
            // session time zone and resolve it against the recorded
            // per-commit wall clock — latest commit recorded ≤ t
            // (Merge.commitAtWallClock documents the clock-skew
            // honesty). Hudi's `as.of.instant` shape.
            if (!expr.foldable) throw new IllegalArgumentException(
              "graft time travel: TIMESTAMP AS OF requires a constant " +
                s"timestamp expression, got ${expr.sql}")
            val micros = org.apache.spark.sql.catalyst.expressions
              .Cast(expr, org.apache.spark.sql.types.TimestampType,
                Some(spark.sessionState.conf.sessionLocalTimeZone))
              .eval(null)
            if (micros == null) throw new IllegalArgumentException(
              s"graft time travel: cannot read '${expr.sql}' as a " +
                "timestamp")
            Merge.commitAtWallClock(spark, path,
              Math.floorDiv(micros.asInstanceOf[Long], 1000L))
          case None =>
            val v = version.getOrElse(throw new IllegalArgumentException(
              "graft time travel: VERSION AS OF requires a commit id"))
            try v.toLong
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"graft time travel: VERSION AS OF expects a numeric " +
                  s"commit id, got '$v'")
            }
        }
        val df = spark.read.format("graft")
          .options(meta.storage.properties)
          .option("path", path)
          .option("asOf", commit.toString)
          .load()
        SubqueryAlias(u.multipartIdentifier.last, df.queryExecution.logical)
    }

  /** The catalog entry when the identifier names a session-catalog
    * graft table; None otherwise (leave the node for Spark's own
    * resolution/error path). */
  private def graftMeta(ident: Seq[String]): Option[CatalogTable] = {
    val tid = ident match {
      case Seq(t) => Some(TableIdentifier(t))
      case Seq(db, t) => Some(TableIdentifier(t, Some(db)))
      case _ => None
    }
    tid.flatMap { id =>
      try {
        val catalog = spark.sessionState.catalog
        if (catalog.tableExists(id)) {
          val m = catalog.getTableMetadata(id)
          if (m.provider.exists(_.equalsIgnoreCase("graft"))) Some(m)
          else None
        } else None
      } catch { case _: Exception => None }
    }
  }
}
