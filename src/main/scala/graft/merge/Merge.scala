package graft.merge

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based table maintenance over a hive-partitioned parquet table —
  * the engine-native replacement for the reference's Hudi COPY_ON_WRITE
  * sink (`glue/scripts/load_transactions.py:61-80,117-122`; SURVEY §2.4).
  *
  * Semantics reproduced:
  *  - upsert (O1): incoming rows replace stored rows with the same key;
  *    `write_operation='upsert'` default per
  *    `terraform/aws_lambda_process_orders.tf:19`.
  *  - precombine dedup (O4): within one batch, duplicate keys resolved by
  *    max precombine field (`load_transactions.py:58,67`) — matching
  *    Hudi's OverwriteWithLatestAvroPayload, which dedups the *batch* by
  *    precombine and always lets the batch overwrite the table.
  *  - delete (O3): stored rows whose key appears in the batch are removed.
  *  - composite key (O5): `ComplexKeyGenerator` two-field record key.
  *
  * Scale design (100 TB): a COW upsert must never rewrite the whole
  * table. We collect the batch's distinct partition values (low
  * cardinality — trading pairs) to the driver, read ONLY those partitions
  * back (partition-pruned scan), reconcile by key, and write with
  * `partitionOverwriteMode=dynamic` so untouched partitions are never
  * re-written. The reconcile is one shuffle on the key columns; the
  * incoming batch is typically tiny vs the table, so AQE will broadcast
  * it where profitable.
  */
object Merge {

  /** O4: within-batch dedup keeping the max-precombine row per key.
    * `tieBreak` makes the choice total when precombine itself ties (Hudi
    * picks an arbitrary winner; we pick a deterministic one). */
  def precombineDedup(
      batch: DataFrame,
      keyCols: Seq[String],
      precombine: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(precombine).desc +: tieBreak.map(col(_).desc))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    batch.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** O5: ComplexKeyGenerator-style composite record key. */
  def compositeKey(keyCols: Seq[String]): Column =
    concat_ws(":", keyCols.map(col): _*)

  /** Predicate selecting only the table partitions the batch touches.
    * The distinct-value collect is a driver round-trip over a
    * low-cardinality partition column — cheap at any table size, and it
    * turns the table read into a partition-pruned scan. */
  private def touchedPartitions(
      batch: DataFrame, partitionCol: String): Seq[Any] =
    batch.select(partitionCol).distinct().collect().map(_.get(0)).toSeq

  /** Null-safe membership for the touched-partition filter: a plain
    * `isin` evaluates to NULL (= dropped) for null-partition rows, so a
    * batch touching the null partition would silently exclude its
    * stored rows from the rewrite — under delete() that turns into
    * destroying the whole __HIVE_DEFAULT_PARTITION__ directory instead
    * of removing one key. */
  private def partitionIn(partitionCol: String, parts: Seq[Any]): Column = {
    val nonNull = parts.filterNot(_ == null)
    val base =
      if (nonNull.isEmpty) lit(false)
      else col(partitionCol).isin(nonNull: _*)
    if (parts.exists(_ == null)) base || col(partitionCol).isNull else base
  }

  private def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  private def writeDynamic(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.write
      .partitionBy(partitionCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Durable two-phase commit of a merged result whose lineage READS
    * `path`: materialize to a staging dir first, then dynamic-overwrite
    * the table from the staged copy. Without staging, the overwrite job
    * consumes the very files it replaces — a failure mid-commit could
    * lose stored partitions (the durability Hudi's timeline gives COW
    * tables). On success the staging dir is removed; on failure it is
    * LEFT IN PLACE as the recovery copy and the error names it.
    *
    * Staging is written unpartitioned (partition col as a plain column)
    * so the read-back schema is bit-identical — hive-layout read-back
    * would re-infer the partition column's type.
    *
    * Dynamic overwrite only rewrites partitions PRESENT in the output,
    * so a delete that empties a whole partition must drop its directory
    * explicitly — `dropEmptied` enables that pass. Only delete() can
    * leave a touched partition with no survivors (a batch-wins upsert
    * always keeps at least the batch's rows), so the upsert path skips
    * the extra staged scan + collect. */
  private def commitMerged(
      spark: SparkSession,
      merged: DataFrame,
      path: String,
      partitionCol: String,
      touched: Seq[Any],
      dropEmptied: Boolean): Unit = {
    val staging = path.stripSuffix("/") + s"_staging_${System.nanoTime()}"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    try {
      // explicit schema: a merge that leaves NO survivors writes an
      // empty staging dir, where schema inference would throw — the
      // schema is already known from the merge plan
      val staged = spark.read.schema(merged.schema).parquet(staging)
      writeDynamic(staged, path, partitionCol)
      if (dropEmptied) {
        val remainingParts = staged.select(partitionCol).distinct()
          .collect().map(_.get(0)).toSet
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        touched.filterNot(remainingParts).foreach { v =>
          // hive path escaping (and the null-partition dir name) must
          // match what the partitioned write produced, or the "deleted"
          // rows silently survive; a false delete on an existing dir is
          // a failed commit, not a warning
          val dirName = if (v == null) "__HIVE_DEFAULT_PARTITION__"
            else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .escapePathName(v.toString)
          val p = new org.apache.hadoop.fs.Path(
            s"$path/$partitionCol=$dirName")
          if (fs.exists(p) && !fs.delete(p, true))
            throw new java.io.IOException(
              s"failed to drop emptied partition dir $p")
        }
      }
    } catch {
      case e: Throwable =>
        throw new RuntimeException(
          s"merge commit failed; staged merge result kept at $staging", e)
    }
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
  }

  /** O2: plain append (insert / bulk_insert — bulk skips the dedup). */
  def insert(batch: DataFrame, path: String, partitionCol: String,
      keyCols: Seq[String] = Nil, precombine: String = null,
      dedup: Boolean = false): Unit = {
    val b = if (dedup) precombineDedup(batch, keyCols, precombine) else batch
    b.write.partitionBy(partitionCol).mode(SaveMode.Append).parquet(path)
  }

  /** O1: key-reconciled upsert, rewriting only touched partitions.
    * Record identity is (key, partition) — Hudi's partition-scoped
    * index semantics: the same key in two partitions is two records. */
  def upsert(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCol: String): Unit = {
    val scopedKeys = keyCols :+ partitionCol
    val deduped = precombineDedup(batch, scopedKeys, precombine)
    if (!tableExists(spark, path)) {
      // Initial write: same dynamic-overwrite path (an existing-but-empty
      // dir — e.g. a just-created table location — must not error).
      writeDynamic(deduped, path, partitionCol)
      return
    }
    val parts = touchedPartitions(deduped, partitionCol)
    if (parts.isEmpty) return
    val stored = spark.read.parquet(path)
    // schema-compatibility guard: silently selecting the batch's columns
    // out of a wider stored schema would STRIP the extra columns (e.g.
    // _commit_ts on a table built by upsertVersioned) from every
    // rewritten partition — fail loudly instead
    val missing = stored.columns.toSet -- deduped.columns.toSet
    val extra = deduped.columns.toSet -- stored.columns.toSet
    require(missing.isEmpty && extra.isEmpty,
      s"upsert batch schema mismatch vs stored table at $path: " +
        s"batch lacks ${missing.mkString(",")}; " +
        s"batch adds ${extra.mkString(",")} " +
        "(a versioned table must be written via upsertVersioned)")
    val existing = stored
      .filter(partitionIn(partitionCol, parts))
      .select(deduped.columns.toIndexedSeq.map(col): _*) // column order alignment
    // Batch wins over stored for the same key (Hudi upsert semantics:
    // incoming overwrites regardless of precombine comparison vs stored).
    val w = Window.partitionBy(scopedKeys.map(col): _*)
      .orderBy(col("_is_new").desc)
    val merged = deduped.withColumn("_is_new", lit(1))
      .unionByName(existing.withColumn("_is_new", lit(0)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_is_new", "_rn")
    commitMerged(spark, merged, path, partitionCol, parts,
      dropEmptied = false)
  }

  /** O3: delete by key — anti-join rewrite of only the touched
    * partitions. */
  def delete(
      spark: SparkSession,
      keys: DataFrame,
      path: String,
      keyCols: Seq[String],
      partitionCol: String): Unit = {
    if (!tableExists(spark, path)) return
    val parts = touchedPartitions(keys, partitionCol)
    if (parts.isEmpty) return
    val existing = spark.read.parquet(path)
      .filter(partitionIn(partitionCol, parts))
    // key scope includes the partition path (Hudi ComplexKeyGenerator
    // semantics): a delete key only removes rows in ITS partition, never
    // a same-keyed row in another touched partition
    val delKeys = keyCols :+ partitionCol
    val delDistinct = keys.select(delKeys.map(col): _*).distinct()
    // null-safe equality: a delete key in the null partition (or a null
    // key component) must still match its stored row — plain equi-join
    // would never match NULL = NULL and silently keep the row
    val cond = delKeys.map(c => existing(c) <=> delDistinct(c))
      .reduce(_ && _)
    val remaining = existing.join(broadcast(delDistinct), cond, "left_anti")
    commitMerged(spark, remaining, path, partitionCol, parts,
      dropEmptied = true)
  }

  // ---- commit timeline (incremental pull) ----

  /** Per-record commit-stamp column — the engine's `_hoodie_commit_time`
    * stand-in. A record carries the id of the commit that last wrote
    * it, which is what makes "what changed since commit X" answerable
    * (the Hudi timeline capability Athena users get via
    * `glue/interactive.sh:21-23`). */
  val commitCol = "_commit_ts"

  /** Next monotonic commit id: max stored stamp + 1. One driver-side
    * aggregate over the stamp column — parquet footer min/max stats
    * keep this a metadata-ish scan, and the result is a single long. */
  private def nextCommit(spark: SparkSession, path: String): Long =
    if (!tableExists(spark, path)) 1L
    else spark.read.parquet(path)
      .agg(coalesce(max(col(commitCol)), lit(0L))).head().getLong(0) + 1L

  /** O1 with a commit timeline: the batch is stamped with a fresh
    * monotonic commit id before the upsert, so surviving stored rows
    * keep the stamp of the commit that last wrote THEM (exactly Hudi's
    * per-record `_hoodie_commit_time` semantics under
    * OverwriteWithLatestAvroPayload). Returns the commit id. */
  def upsertVersioned(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCol: String): Long = {
    val cts = nextCommit(spark, path)
    upsert(spark, batch.withColumn(commitCol, lit(cts)), path,
      keyCols, precombine, partitionCol)
    cts
  }

  /** Incremental pull: rows last written by a commit AFTER `sinceTs`
    * (Hudi incremental-query semantics — deleted rows simply stop
    * appearing, as in Hudi's COW read-optimized view). Partition/stat
    * pruning applies: the stamp predicate is pushed to the scan. */
  def readSince(spark: SparkSession, path: String, sinceTs: Long): DataFrame =
    spark.read.parquet(path).filter(col(commitCol) > sinceTs)

  // ---- query inventory ----

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic replay batch `b` over the orders table: rows whose
    * o_orderkey ≡ b (mod 7), keyed (okey = o_orderkey % 500, status
    * partition) with precombine o_orderkey. The % 500 fold makes ~4
    * same-key rows per batch, so within-batch precombine dedup (O4) is
    * genuinely exercised; precombine is unique (o_orderkey), so the
    * winner is total — no tie-break dependence. */
  private def replayBatch(spark: SparkSession, dir: String, b: Int): DataFrame =
    graft.Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 7 === b)
      .select(
        (col("o_orderkey") % 500).as("okey"),
        col("o_orderstatus").as("part"),
        col("o_totalprice").as("price"),
        col("o_orderkey").as("pre"))

  /** q18: the full Hudi-semantics write path (O1 upsert ×2, O4
    * precombine dedup, O5 partition-scoped keys, O3 delete) replayed
    * against a scratch table, then read back — the driver's DuckDB
    * oracle recomputes the same last-writer-wins + anti-join algebra
    * relationally. This is the one SURVEY §2 capability that previously
    * had only spec coverage. */
  val queries: Map[String, Q] = Map(
    "q18_upsert_replay" -> ((s, dir) => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_q18_").toString + "/table"
      val keyCols = Seq("okey")
      upsert(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      upsert(s, replayBatch(s, dir, 1), path, keyCols, "pre", "part")
      // delete a subset of batch-0 keys (partition-scoped)
      delete(s, replayBatch(s, dir, 0).filter(col("pre") % 3 === 0)
        .select("okey", "part"), path, keyCols, "part")
      s.read.parquet(path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // q19: the commit timeline end-to-end — two versioned upserts, then
    // an incremental pull since commit 1. The pull must return exactly
    // the rows OWNED by commit 2 (batch-2 winners), and none of the
    // batch-1 survivors whose keys batch 2 never touched — that
    // exclusion is what proves per-record stamps merge correctly.
    "q19_incremental_pull" -> ((s, dir) => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_q19_").toString + "/table"
      val keyCols = Seq("okey")
      val c1 = upsertVersioned(s, replayBatch(s, dir, 0), path,
        keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1), path,
        keyCols, "pre", "part")
      readSince(s, path, c1)
        .select(col("okey"), col("part"), col("price"), col("pre"),
          col(commitCol).as("commit_ts"))
        .orderBy("part", "okey")
    }))

  /** DuckDB replay of the same algebra: per-batch dedup by max
    * precombine, batch-wins-over-stored merge, distinct-key anti-join
    * delete — each window/join mirrors one Merge stage. */
  val oracle: Map[String, String] = Map(
    "q18_upsert_replay" ->
      """WITH raw AS (SELECT o_orderkey % 500 AS okey, o_orderstatus AS part,
        |               o_totalprice AS price, o_orderkey AS pre
        |             FROM orders),
        |b1 AS (SELECT okey, part, price, pre FROM (
        |         SELECT *, row_number() OVER (PARTITION BY okey, part
        |           ORDER BY pre DESC) AS rn
        |         FROM raw WHERE pre % 7 = 0) WHERE rn = 1),
        |b2 AS (SELECT okey, part, price, pre FROM (
        |         SELECT *, row_number() OVER (PARTITION BY okey, part
        |           ORDER BY pre DESC) AS rn
        |         FROM raw WHERE pre % 7 = 1) WHERE rn = 1),
        |t2 AS (SELECT * FROM b2
        |       UNION ALL
        |       SELECT b1.okey, b1.part, b1.price, b1.pre FROM b1
        |       LEFT JOIN b2 ON b1.okey = b2.okey AND b1.part = b2.part
        |       WHERE b2.pre IS NULL),
        |d AS (SELECT DISTINCT okey, part FROM raw
        |      WHERE pre % 7 = 0 AND pre % 3 = 0)
        |SELECT t2.okey, t2.part, t2.price, t2.pre
        |FROM t2 LEFT JOIN d ON t2.okey = d.okey AND t2.part = d.part
        |WHERE d.okey IS NULL
        |ORDER BY t2.part, t2.okey""".stripMargin,
    // what changed since commit 1 == exactly the deduped batch-2 rows
    // (batch 2 overwrites or inserts every key it carries; everything
    // else keeps commit 1's stamp and must NOT appear)
    "q19_incremental_pull" ->
      """WITH raw AS (SELECT o_orderkey % 500 AS okey, o_orderstatus AS part,
        |               o_totalprice AS price, o_orderkey AS pre
        |             FROM orders)
        |SELECT okey, part, price, pre, CAST(2 AS BIGINT) AS commit_ts
        |FROM (SELECT *, row_number() OVER (PARTITION BY okey, part
        |        ORDER BY pre DESC) AS rn
        |      FROM raw WHERE pre % 7 = 1)
        |WHERE rn = 1
        |ORDER BY part, okey""".stripMargin)
}
