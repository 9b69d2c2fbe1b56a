package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.catalog.{CatalogTable, CatalogUtils}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

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
  *  - `TIMESTAMP AS OF ...`: rejected with a clear message — the graft
  *    timeline records logical versions, not wall-clock instants, and
  *    mapping wall-clock onto it would silently depend on writer clock
  *    skew (the honest answer at multi-writer scale).
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
        if (ts.isDefined) throw new IllegalArgumentException(
          "graft time travel: TIMESTAMP AS OF is not supported — the " +
            "timeline records logical commit ids, not wall-clock " +
            "instants; use VERSION AS OF <commit id> (see the commits " +
            "timeline for ids)")
        val v = version.getOrElse(throw new IllegalArgumentException(
          "graft time travel: VERSION AS OF requires a commit id"))
        val commit =
          try v.toLong
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"graft time travel: VERSION AS OF expects a numeric " +
                s"commit id, got '$v'")
          }
        val path = meta.storage.properties.collectFirst {
          case (k, p) if k.equalsIgnoreCase("path") => p
        }.orElse(meta.storage.locationUri.map(CatalogUtils.URIToString))
          .getOrElse(throw new IllegalArgumentException(
            s"graft time travel: ${u.multipartIdentifier.mkString(".")} " +
              "has no recorded path"))
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
