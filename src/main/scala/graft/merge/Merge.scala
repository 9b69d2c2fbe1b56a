package graft.merge

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.storage.StorageLevel

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
  *  - schema evolution: a batch may CARRY NEW COLUMNS (Hudi's additive
  *    evolution; the reference's own `additional_columns` mechanism,
  *    `load_transactions.py:96-107`, makes "a later batch injects a new
  *    literal column" a normal workflow) — stored rows read back
  *    null-filled. A batch that DROPS stored columns still fails loudly.
  *
  * Scale design (100 TB): a COW upsert must rewrite as little as
  * possible. Write amplification is bounded at FILE-GROUP granularity,
  * exactly like Hudi COW:
  *  1. collect the batch's distinct partition values (low cardinality —
  *     trading pairs) → the table read is a partition-pruned scan;
  *  2. a column-pruned key scan over only those partitions joins against
  *     the (broadcast) batch keys to find the parquet FILES that contain
  *     matched keys;
  *  3. only those files are read back and reconciled; every other file —
  *     including files in the SAME partition whose key range the batch
  *     missed — is left physically untouched (a hot partition no longer
  *     costs a partition-sized rewrite per row);
  *  4. the merged replacement rows are staged durably, the superseded
  *     files dropped, and the replacement appended.
  * The reconcile itself is broadcast-anti-join shaped (the batch is tiny
  * vs the table), so the only table-sized cost is the key scan of the
  * touched partitions — column-pruned to the key columns, which parquet
  * serves from dictionary/stats pages.
  */
object Merge {

  /** What a merge wrote: deduped batch row count + touched partition
    * values (the commit-metadata payload for [[upsertVersioned]]). */
  final case class MergeStats(nRows: Long, partitions: Seq[Any])

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

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** "Exists" means HAS DATA: metadata entries (`_graft_commits/`,
    * `_graft_schema.json`, `_SUCCESS`) don't count — an inflight
    * timeline marker may be created before the first batch lands. */
  private def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = fsFor(spark, path)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  private def writeDynamic(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.write
      .partitionBy(partitionCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(path)

  // ---- table schema metadata ----
  // Spark's file listing skips paths starting with '_' or '.', so both
  // metadata locations below are invisible to plain `read.parquet(path)`.

  private def schemaMetaPath(path: String) = new Path(path, "_graft_schema.json")

  private def readSmallFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try src.mkString finally src.close()
    } finally in.close()
  }

  private def writeSmallFile(fs: FileSystem, p: Path, body: String): Unit = {
    val out = fs.create(p, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Crash-safe in-place metadata update: write a temp sibling, then
    * swap. `fs.create(p, true)` truncates FIRST — a JVM kill mid-write
    * would leave permanently corrupt JSON that fails every later read;
    * with the swap, the worst crash window leaves the file momentarily
    * absent, which readers treat as "no metadata" and degrade
    * gracefully (footer-merge fallback). */
  private def replaceSmallFile(fs: FileSystem, p: Path, body: String): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}.tmp${System.nanoTime()}")
    writeSmallFile(fs, tmp, body)
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"failed to move $tmp into place at $p")
  }

  /** Authoritative table schema, recorded at every write. Makes the
    * read side O(1) after additive evolution — without it a mixed-schema
    * table needs a footer-merge over every file (`mergeSchema`), which
    * at 100 TB is a full listing + footer job per read. */
  private def readSchemaMeta(spark: SparkSession, path: String)
      : Option[StructType] = {
    val fs = fsFor(spark, path)
    val p = schemaMetaPath(path)
    if (!fs.exists(p)) None
    else try {
      Some(DataType.fromJson(readSmallFile(fs, p)).asInstanceOf[StructType])
    } catch {
      case e: Exception =>
        // a corrupt metadata file must not brick the table: fall back to
        // the footer-merge read path (correct, just slower) and say so
        System.err.println(s"[graft.merge] WARN: unreadable schema " +
          s"metadata at $p (${e.getMessage}); falling back to footer merge")
        None
    }
  }

  /** Additive union of the recorded schema and this write's schema (a
    * field's FIRST recorded type wins — evolution adds columns, never
    * retypes them). */
  private def updateSchemaMeta(spark: SparkSession, path: String,
      schema: StructType): Unit = {
    // when the recorded schema is missing OR unreadable, the base must
    // come from the actual files (footer merge), NOT the batch alone —
    // otherwise one plain insert after a metadata corruption would
    // re-record a NARROWER schema and hide (or, via compact, physically
    // drop) every evolved column the batch doesn't carry. The files are
    // read DIRECTLY (no hive-layout basePath), so the partition column
    // never goes through dir-name type inference — recording an
    // inferred int for a numeric-LOOKING string partition would
    // permanently retype it (first-recorded-type-wins); instead the
    // partition column joins from the incoming schema, which carries
    // its true type.
    val base = readSchemaMeta(spark, path).orElse {
      val fs = fsFor(spark, path)
      val root = new Path(path)
      if (!fs.exists(root)) None
      else {
        val dataFiles = fs.listStatus(root).toSeq
          .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_")
            && !st.getPath.getName.startsWith("."))
          .flatMap(d => fs.listStatus(d.getPath).toSeq)
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
            && !st.getPath.getName.startsWith("."))
          .map(_.getPath.toString)
        if (dataFiles.isEmpty) None
        else Some(spark.read.option("mergeSchema", "true")
          .parquet(dataFiles: _*).schema)
      }
    }
    val merged = base match {
      case None => schema
      case Some(old) =>
        StructType(old.fields ++
          schema.fields.filterNot(f => old.fieldNames.contains(f.name)))
    }
    replaceSmallFile(fsFor(spark, path), schemaMetaPath(path), merged.json)
  }

  /** The recorded authoritative schema, if this table has one — the
    * catalog-sync path needs it to register evolved columns explicitly
    * (a footer-inferred catalog table would miss columns that only
    * newer files carry). */
  def recordedSchema(spark: SparkSession, path: String): Option[StructType] =
    readSchemaMeta(spark, path)

  /** Read a merge-managed table. Prefers the recorded schema (exact
    * types + null-fill for files written before an additive evolution);
    * falls back to a parquet footer-merge for tables written by older
    * code. Plain `spark.read.parquet(path)` stays correct for tables
    * that never evolved — this is the general entry point. */
  def readTable(spark: SparkSession, path: String): DataFrame =
    readSchemaMeta(spark, path) match {
      case Some(s) => spark.read.schema(s).parquet(path)
      case None => spark.read.option("mergeSchema", "true").parquet(path)
    }

  /** Project `df` onto `target` columns: cast where present, null-fill
    * where absent (the read-side half of additive evolution). */
  /** `input_file_name()` yields the URL-ENCODED path (a literal '%' in
    * a hive-escaped dir name arrives as "%25") and neither Path(String)
    * nor DataFrameReader decodes it — decode exactly once via the URI
    * constructor so both the FS delete and the file-list read resolve
    * the raw on-disk name. */
  private def decodeFileName(urlEncoded: String): String =
    new Path(new java.net.URI(urlEncoded)).toString

  private def alignTo(df: DataFrame, target: Seq[(String, DataType)])
      : DataFrame =
    df.select(target.map { case (n, t) =>
      if (df.columns.contains(n)) col(n).cast(t).as(n)
      else lit(null).cast(t).as(n)
    }: _*)

  /** Durable commit of a file-group merge: stage the replacement rows,
    * drop the superseded files, append the staged rows back. The staging
    * materialization is what makes this safe — the replacement exists
    * durably BEFORE any stored file is removed, so a failure mid-commit
    * leaves missing-but-recoverable data with the error naming the
    * recovery copy (never silently duplicated keys, which deleting
    * after appending would risk). On success the staging dir is removed.
    *
    * Staging is written unpartitioned (partition col as a plain column)
    * so the read-back schema is bit-identical — hive-layout read-back
    * would re-infer the partition column's type.
    *
    * Only delete() can leave a touched partition with no files (a
    * batch-wins upsert always appends the batch's rows back), so the
    * emptied-directory sweep runs only when `dropEmptied` is set. */
  private def commitFiles(
      spark: SparkSession,
      merged: DataFrame,
      path: String,
      partitionCol: String,
      supersededFiles: Seq[String],
      touched: Seq[Any],
      dropEmptied: Boolean): Unit = {
    if (supersededFiles.isEmpty && !dropEmptied) {
      // pure insert: nothing is being replaced, so a plain append is
      // already durable — skip the staging double-write (the common
      // shape for streaming micro-batches carrying only new keys)
      merged.write.partitionBy(partitionCol).mode(SaveMode.Append)
        .parquet(path)
      updateSchemaMeta(spark, path, merged.schema)
      return
    }
    val staging = path.stripSuffix("/") + s"_staging_${System.nanoTime()}"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = fsFor(spark, path)
    // explicit schema: a merge that leaves NO survivors writes an
    // empty staging dir, where schema inference would throw — the
    // schema is already known from the merge plan. Relation resolution
    // lists the staging dir EAGERLY, so this read sits inside its own
    // wrap: even a listing failure must name the staged recovery copy
    val staged =
      try spark.read.schema(merged.schema).parquet(staging)
      catch {
        case e: Throwable =>
          throw new RuntimeException(
            s"merge commit failed; staged merge result kept at $staging", e)
      }
    try {
      supersededFiles.foreach { f =>
        val p = new Path(f)
        if (fs.exists(p) && !fs.delete(p, false))
          throw new java.io.IOException(s"failed to delete superseded file $p")
      }
    } catch {
      // pre-append failures may name staging as the clean recovery
      // copy: nothing new has landed yet
      case e: Throwable =>
        throw new RuntimeException(
          s"merge commit failed; staged merge result kept at $staging", e)
    }
    try staged.write.partitionBy(partitionCol).mode(SaveMode.Append)
      .parquet(path)
    catch {
      // an append that dies mid-job-commit may have landed SOME files
      // (object-store multi-file commit is not atomic) — blindly
      // re-applying staging would duplicate every row that did land, so
      // this failure gets the inspect-first wording
      case e: Throwable =>
        throw new RuntimeException(
          "merge append may be PARTIALLY COMMITTED at " + path +
            s"; staging kept at $staging for inspection — reconcile " +
            "against the table before re-applying anything", e)
    }
    // data is committed — staging is no longer a recovery copy. A failed
    // cleanup must be VISIBLE: each leaked staging dir is a table-sized
    // sibling that accumulates silently otherwise
    if (!fs.delete(new Path(staging), true))
      System.err.println(
        s"[graft.merge] WARN: failed to remove staging dir $staging " +
          "after a successful commit; delete it manually")
    try {
      if (dropEmptied) {
        touched.foreach { v =>
          // hive path escaping (and the null-partition dir name) must
          // match what the partitioned write produced; since the data
          // files were already removed one by one, a surviving dir here
          // is empty — cosmetic, but its absence is part of delete()'s
          // contract
          val dirName = if (v == null) "__HIVE_DEFAULT_PARTITION__"
            else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .escapePathName(v.toString)
          val p = new Path(s"$path/$partitionCol=$dirName")
          val emptied = fs.exists(p) && fs.listStatus(p).forall { st =>
            val n = st.getPath.getName
            n.startsWith("_") || n.startsWith(".")
          }
          if (emptied && !fs.delete(p, true))
            throw new java.io.IOException(
              s"failed to drop emptied partition dir $p")
        }
      }
      updateSchemaMeta(spark, path, merged.schema)
    } catch {
      case e: Throwable =>
        throw new RuntimeException(
          "merge data COMMITTED, but post-commit maintenance " +
            s"(emptied-dir sweep / schema metadata) failed at $path — " +
            "do NOT re-apply any staging copy", e)
    }
  }

  /** O2: plain append (insert — combine-before-insert defaults off in
    * the reference, so no key reconciliation). */
  def insert(batch: DataFrame, path: String, partitionCol: String,
      keyCols: Seq[String] = Nil, precombine: String = null,
      dedup: Boolean = false): Unit = {
    val b = if (dedup) precombineDedup(batch, keyCols, precombine) else batch
    b.write.partitionBy(partitionCol).mode(SaveMode.Append).parquet(path)
    updateSchemaMeta(batch.sparkSession, path, batch.schema)
  }

  /** O2 bulk path: insert with TARGET-FILE-SIZE layout — the honest
    * parquet analogue of Hudi bulk_insert's small-file sizing. The batch
    * is range-repartitioned on (partition, key) so output tasks hold
    * contiguous key ranges: file count ≈ plan-size / targetFileBytes
    * regardless of row count, each hive partition's rows land in few
    * sorted files (clustered keys = effective parquet min/max pruning
    * for the later upserts' key scans), and no task writes one file per
    * partition value the way round-robin repartition would. */
  def bulkInsert(batch: DataFrame, path: String, partitionCol: String,
      keyCols: Seq[String] = Nil,
      targetFileBytes: Long = 128L * 1024 * 1024,
      maxFiles: Int = 1 << 20): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(maxFiles >= 1, "maxFiles must be >= 1")
    // sizeInBytes is a BigInt that Catalyst pins to Long.MaxValue (and
    // beyond, after join multiplications) when stats are unknown — do
    // the arithmetic in BigInt and clamp, or the Int conversion wraps
    // into a garbage (even non-positive) partition count
    val planBytes = batch.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = ((planBytes / targetFileBytes) + 1)
      .min(BigInt(maxFiles)).max(BigInt(1)).toInt
    val layout = (col(partitionCol) +: keyCols.map(col)).toIndexedSeq
    batch.repartitionByRange(nFiles, layout: _*)
      .write.partitionBy(partitionCol).mode(SaveMode.Append).parquet(path)
    updateSchemaMeta(batch.sparkSession, path, batch.schema)
  }

  /** O1: key-reconciled upsert at file-group granularity (see the
    * object scaladoc for the write-amplification argument). Record
    * identity is (key, partition) — Hudi's partition-scoped index
    * semantics: the same key in two partitions is two records. */
  def upsert(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCol: String): Unit = {
    upsertImpl(spark, batch, path, keyCols, precombine, partitionCol,
      needStats = false)
    ()
  }

  /** Stats (deduped row count) are only materialized on the versioned
    * path — the count is one extra job per commit, and the plain-upsert
    * callers (streaming micro-batches, batch loads) all discard it. */
  private def upsertImpl(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCol: String,
      needStats: Boolean): MergeStats = {
    val scopedKeys = keyCols :+ partitionCol
    // persisted: the deduped batch feeds the partition collect, the key
    // join build side, the merged union AND the stats count — one
    // materialization instead of four replays of the batch lineage
    val deduped = precombineDedup(batch, scopedKeys, precombine)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (!tableExists(spark, path)) {
        // Initial write: dynamic overwrite (an existing-but-empty dir —
        // e.g. a just-created table location — must not error).
        writeDynamic(deduped, path, partitionCol)
        updateSchemaMeta(spark, path, deduped.schema)
        return MergeStats(if (needStats) deduped.count() else 0L,
          if (needStats) touchedPartitions(deduped, partitionCol) else Nil)
      }
      val parts = touchedPartitions(deduped, partitionCol)
      if (parts.isEmpty) return MergeStats(0L, Nil)
      val stored = readTable(spark, path)
      // a batch may ADD columns (additive evolution) but never DROP
      // them: silently selecting the batch's columns out of a wider
      // stored schema would STRIP the extra columns (e.g. _commit_ts on
      // a table built by upsertVersioned) from every rewritten file
      val missing = stored.columns.toSet -- deduped.columns.toSet
      require(missing.isEmpty,
        s"upsert batch schema mismatch vs stored table at $path: " +
          s"batch lacks ${missing.mkString(",")} " +
          "(a versioned table must be written via upsertVersioned)")
      val extra = deduped.columns.filterNot(stored.columns.contains)
      val target: Seq[(String, DataType)] =
        stored.schema.fields.map(f => f.name -> f.dataType).toIndexedSeq ++
          deduped.schema.fields.filter(f => extra.contains(f.name))
            .map(f => f.name -> f.dataType)
      // file-group pruning: column-pruned key scan of the touched
      // partitions, semi-joined (broadcast) against the batch keys →
      // the files that actually contain matched keys. Null-safe <=>:
      // a null key component / null partition must still match.
      // The matched-file list is driver-resident — bounded by the
      // batch's key count (≤ one path per matched key in the worst
      // case), the same driver-side COW write planning Hudi does.
      val batchKeys = deduped.select(scopedKeys.map(col): _*).distinct()
      val keyScan = stored.filter(partitionIn(partitionCol, parts))
        .select(scopedKeys.map(col) :+ input_file_name().as("_file"): _*)
      val matchCond = scopedKeys.map(c => keyScan(c) <=> batchKeys(c))
        .reduce(_ && _)
      val matchedFiles = keyScan.join(broadcast(batchKeys), matchCond, "left_semi")
        .select("_file").distinct().collect()
        .map(r => decodeFileName(r.getString(0))).toIndexedSeq
      val newRows = alignTo(deduped, target)
      val merged =
        if (matchedFiles.isEmpty) newRows // pure insert: nothing to rewrite
        else {
          // read ONLY the matched files; explicit schema (no footer
          // reads), basePath recovers the partition column from paths
          val matchedRows = spark.read.schema(stored.schema)
            .option("basePath", path).parquet(matchedFiles: _*)
          // batch wins over stored for the same key (Hudi upsert
          // semantics: incoming overwrites regardless of precombine
          // comparison vs stored)
          val survCond = scopedKeys.map(c => matchedRows(c) <=> batchKeys(c))
            .reduce(_ && _)
          val survivors = matchedRows.join(broadcast(batchKeys), survCond,
            "left_anti")
          newRows.unionByName(alignTo(survivors, target))
        }
      commitFiles(spark, merged, path, partitionCol, matchedFiles, parts,
        dropEmptied = false)
      MergeStats(if (needStats) deduped.count() else 0L, parts)
    } finally deduped.unpersist()
  }

  /** O3: delete by key — file-group rewrite of only the parquet files
    * that contain a matched key; emptied partition dirs are dropped. */
  def delete(
      spark: SparkSession,
      keys: DataFrame,
      path: String,
      keyCols: Seq[String],
      partitionCol: String): Unit = {
    if (!tableExists(spark, path)) return
    // key scope includes the partition path (Hudi ComplexKeyGenerator
    // semantics): a delete key only removes rows in ITS partition, never
    // a same-keyed row in another touched partition
    val delKeys = keyCols :+ partitionCol
    val delDistinct = keys.select(delKeys.map(col): _*).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val parts = touchedPartitions(delDistinct, partitionCol)
      if (parts.isEmpty) return
      val stored = readTable(spark, path)
      val keyScan = stored.filter(partitionIn(partitionCol, parts))
        .select(delKeys.map(col) :+ input_file_name().as("_file"): _*)
      val matchCond = delKeys.map(c => keyScan(c) <=> delDistinct(c))
        .reduce(_ && _)
      val matchedFiles = keyScan.join(broadcast(delDistinct), matchCond, "left_semi")
        .select("_file").distinct().collect()
        .map(r => decodeFileName(r.getString(0))).toIndexedSeq
      if (matchedFiles.isEmpty) return
      val matchedRows = spark.read.schema(stored.schema)
        .option("basePath", path).parquet(matchedFiles: _*)
      val survCond = delKeys.map(c => matchedRows(c) <=> delDistinct(c))
        .reduce(_ && _)
      val remaining = matchedRows.join(broadcast(delDistinct), survCond,
        "left_anti")
      commitFiles(spark, remaining, path, partitionCol, matchedFiles, parts,
        dropEmptied = true)
    } finally delDistinct.unpersist()
  }

  /** Small-file compaction — the Hudi clustering analogue, and the
    * necessary complement of file-group upserts: streaming micro-batches
    * append roughly one file per batch, and a 100 TB table fed that way
    * degrades into millions of tiny files (listing cost, scan task
    * overhead, dead parquet stats). Partitions carrying more parquet
    * files than their bytes justify (`> ceil(bytes/targetFileBytes)`)
    * are rewritten into target-sized files, range-laid-out on
    * (partition, key) so keys cluster — which is what keeps the upsert
    * key scan's parquet min/max pruning effective afterwards. Rows pass
    * through untouched (including `_commit_ts` stamps — incremental
    * pulls are compaction-invariant), partitions already compact are not
    * read at all, and the rewrite goes through the same staged durable
    * commit as upsert/delete. Returns the number of files compacted
    * away (0 = nothing to do). */
  def compact(
      spark: SparkSession,
      path: String,
      partitionCol: String,
      keyCols: Seq[String] = Nil,
      targetFileBytes: Long = 128L * 1024 * 1024,
      maxFiles: Int = 1 << 20): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(maxFiles >= 1, "maxFiles must be >= 1")
    if (!tableExists(spark, path)) return 0L
    val fs = fsFor(spark, path)
    val partDirs = fs.listStatus(new Path(path))
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$partitionCol="))
    val candidates = partDirs.flatMap { d =>
      val files = fs.listStatus(d.getPath)
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
      val bytes = files.map(_.getLen).sum
      // Long division throughout — an Int conversion here wraps for
      // TB-scale partitions with small targets (the bulkInsert bug)
      val ideal = bytes / targetFileBytes + 1
      if (files.length > ideal) Some((files.map(_.getPath).toSeq, bytes))
      else None
    }
    if (candidates.isEmpty) return 0L
    val files = candidates.flatMap(_._1).map(_.toString).toIndexedSeq
    val totalBytes = candidates.map(_._2).sum
    val stored = readTable(spark, path)
    val rows = spark.read.schema(stored.schema)
      .option("basePath", path).parquet(files: _*)
    val nFiles = math.min(totalBytes / targetFileBytes + 1, maxFiles.toLong)
      .toInt
    val layout = (col(partitionCol) +: keyCols.map(col)).toIndexedSeq
    commitFiles(spark, rows.repartitionByRange(nFiles, layout: _*), path,
      partitionCol, files, touched = Nil, dropEmptied = false)
    files.length.toLong
  }

  /** Remove leaked staging siblings — the table-sized recovery copies a
    * failed (or failed-to-clean) commit leaves next to the table.
    * Deliberately MANUAL: a staging dir is a recovery copy until the
    * operator decides the commit outcome, so only run this when no
    * merge is running and no recovery is pending. Returns the number of
    * dirs removed. Stale `.inflight` timeline markers are NOT touched:
    * they are what keeps a crashed-but-landed commit's id from being
    * reissued, and their only cost is a skipped id. */
  def vacuum(spark: SparkSession, path: String): Long = {
    val fs = fsFor(spark, path)
    val table = new Path(path.stripSuffix("/"))
    val parent = table.getParent
    val stagingPrefix = s"${table.getName}_staging_"
    val staged =
      if (parent == null || !fs.exists(parent)) Seq.empty
      else fs.listStatus(parent).toSeq
        .filter(_.getPath.getName.startsWith(stagingPrefix))
    // count only what actually went away — reporting an undeletable
    // copy as "removed" defeats the visibility this op exists for
    staged.count { st =>
      val ok = fs.delete(st.getPath, true)
      if (!ok) System.err.println(
        s"[graft.merge] WARN: vacuum could not remove ${st.getPath}")
      ok
    }.toLong
  }

  // ---- commit timeline (incremental pull) ----

  /** Per-record commit-stamp column — the engine's `_hoodie_commit_time`
    * stand-in. A record carries the id of the commit that last wrote
    * it, which is what makes "what changed since commit X" answerable
    * (the Hudi timeline capability Athena users get via
    * `glue/interactive.sh:21-23`). */
  val commitCol = "_commit_ts"

  private def commitsDir(path: String) = new Path(path, "_graft_commits")

  /** Every id the timeline has ever ISSUED — completed commits
    * (`<id>.json`) plus inflight markers (`<id>.inflight`) left by
    * crashed runs. Both count: an id whose data may have landed must
    * never be reissued. */
  private def listIssuedIds(spark: SparkSession, path: String): Seq[Long] = {
    val fs = fsFor(spark, path)
    val p = commitsDir(path)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).map(_.getPath.getName).toSeq.collect {
      case n if n.endsWith(".json") => n.stripSuffix(".json").toLong
      case n if n.endsWith(".inflight") => n.stripSuffix(".inflight").toLong
    }
  }

  /** Next monotonic commit id. The timeline metadata (one tiny file per
    * issued commit under `_graft_commits/`) is the source of truth: it
    * never regresses, even when a delete() removes every surviving row
    * of the latest commit — a data-only max would then REUSE that
    * commit id and an incremental consumer tracking `readSince(last)`
    * would silently miss the reused commit's rows (Hudi's timeline
    * never regresses either). Because an id is marked `.inflight`
    * BEFORE its data lands (Hudi's requested→inflight→commit shape), a
    * crash mid-commit can't cause reuse — and a metadata-managed table
    * never needs a data scan here, which at 100 TB would otherwise be a
    * full stamp-column read per commit. The scan remains only as the
    * one-time floor for tables stamped before the timeline existed. */
  private def nextCommit(spark: SparkSession, path: String): Long = {
    val issued = listIssuedIds(spark, path)
    if (issued.nonEmpty) return issued.max + 1L
    val dataMax =
      if (!tableExists(spark, path)) 0L
      else {
        val t = readTable(spark, path)
        if (!t.columns.contains(commitCol)) 0L
        else t.agg(coalesce(max(col(commitCol)), lit(0L))).head().getLong(0)
      }
    dataMax + 1L
  }

  private def jsonQuote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def inflightMarker(path: String, cts: Long) =
    new Path(commitsDir(path), f"$cts%020d.inflight")

  private def markInflight(spark: SparkSession, path: String, cts: Long)
      : Unit = {
    val fs = fsFor(spark, path)
    fs.mkdirs(commitsDir(path))
    writeSmallFile(fs, inflightMarker(path, cts), "")
  }

  private def recordCommit(spark: SparkSession, path: String, cts: Long,
      stats: MergeStats): Unit = {
    val fs = fsFor(spark, path)
    fs.mkdirs(commitsDir(path))
    val parts = stats.partitions
      .map(v => if (v == null) "__HIVE_DEFAULT_PARTITION__" else v.toString)
      .sorted.mkString(",")
    val body = s"""{"commit_ts":$cts,"n_rows":${stats.nRows},""" +
      s""""partitions":${jsonQuote(parts)}}"""
    writeSmallFile(fs, new Path(commitsDir(path), f"$cts%020d.json"), body)
    fs.delete(inflightMarker(path, cts), false)
  }

  /** O1 with a commit timeline: the batch is stamped with a fresh
    * monotonic commit id before the upsert, so surviving stored rows
    * keep the stamp of the commit that last wrote THEM (exactly Hudi's
    * per-record `_hoodie_commit_time` semantics under
    * OverwriteWithLatestAvroPayload). The commit is recorded in the
    * timeline metadata only after the data commit succeeds — the
    * timeline lists durable commits. Returns the commit id.
    *
    * A first versioned upsert onto a table built by plain upsert is an
    * additive evolution: pre-existing rows carry a NULL stamp ("before
    * the timeline") and never match an incremental pull. */
  def upsertVersioned(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCol: String): Long = {
    val cts = nextCommit(spark, path)
    markInflight(spark, path, cts)
    val stats = upsertImpl(spark, batch.withColumn(commitCol, lit(cts)), path,
      keyCols, precombine, partitionCol, needStats = true)
    recordCommit(spark, path, cts, stats)
    cts
  }

  /** The commit timeline as a DataFrame: one row per recorded commit —
    * (commit_ts, n_rows written, comma-joined sorted partition list).
    * Commit enumeration is what the reference's users get from Hudi's
    * timeline via Athena (`glue/interactive.sh:21-23`), beyond plain
    * "since X" pulls. Deletes are not timeline events in this engine
    * (they version no rows); their effect is visible as rows vanishing
    * from every subsequent read. */
  def commits(spark: SparkSession, path: String): DataFrame = {
    val schema = "commit_ts LONG, n_rows LONG, partitions STRING"
    val fs = fsFor(spark, path)
    if (!fs.exists(commitsDir(path)))
      spark.read.schema(schema).json(spark.emptyDataset(
        org.apache.spark.sql.Encoders.STRING))
    else spark.read.schema(schema).json(commitsDir(path).toString)
  }

  /** Incremental pull: rows last written by a commit AFTER `sinceTs`
    * (Hudi incremental-query semantics — deleted rows simply stop
    * appearing, as in Hudi's COW read-optimized view). Partition/stat
    * pruning applies: the stamp predicate is pushed to the scan. */
  def readSince(spark: SparkSession, path: String, sinceTs: Long): DataFrame =
    readTable(spark, path).filter(col(commitCol) > sinceTs)

  /** Incremental pull between two commits: rows last written by a
    * commit in (afterTs, untilTs]. */
  def readBetween(spark: SparkSession, path: String, afterTs: Long,
      untilTs: Long): DataFrame =
    readTable(spark, path)
      .filter(col(commitCol) > afterTs && col(commitCol) <= untilTs)

  // ---- query inventory ----

  type Q = (SparkSession, String) => DataFrame

  private val scratchDirs = scala.collection.mutable.ArrayBuffer[String]()

  /** Scratch table location for a replay query — registered for removal
    * at JVM exit (a bench process runs each replay three times; without
    * the sweep every run leaves a table-sized temp dir behind). Not
    * removed eagerly: the returned DataFrame's lineage reads the dir. */
  private def scratchTable(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    // check-and-install under the SAME lock as the append: two threads
    // racing first use must not both install the hook
    synchronized {
      if (scratchDirs.isEmpty)
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          synchronized(scratchDirs.toList).foreach { dir =>
            def rm(f: java.io.File): Unit = {
              if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
              f.delete(); ()
            }
            try rm(new java.io.File(dir)) catch { case _: Throwable => () }
          }))
      scratchDirs += d
    }
    d + "/table"
  }

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
      val path = scratchTable("graft_q18_")
      val keyCols = Seq("okey")
      upsert(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      upsert(s, replayBatch(s, dir, 1), path, keyCols, "pre", "part")
      // delete a subset of batch-0 keys (partition-scoped)
      delete(s, replayBatch(s, dir, 0).filter(col("pre") % 3 === 0)
        .select("okey", "part"), path, keyCols, "part")
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // q18b: additive schema evolution end-to-end — batch 2 carries a
    // column batch 1 never had; stored batch-1 survivors read back
    // null-filled (the oracle recomputes the same NULL-filled union)
    "q18b_schema_evolution" -> ((s, dir) => {
      val path = scratchTable("graft_q18b_")
      val keyCols = Seq("okey")
      upsert(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      upsert(s, replayBatch(s, dir, 1).withColumn("src", lit("b1")),
        path, keyCols, "pre", "part")
      readTable(s, path)
        .select("okey", "part", "price", "pre", "src")
        .orderBy("part", "okey")
    }),
    // q23: compaction is content-invariant — the q18 replay (whose
    // appends leave several files per partition) compacted to one file
    // per partition must still hash-match the same relational oracle
    "q23_compact" -> ((s, dir) => {
      val path = scratchTable("graft_q23_")
      val keyCols = Seq("okey")
      upsert(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      upsert(s, replayBatch(s, dir, 1), path, keyCols, "pre", "part")
      delete(s, replayBatch(s, dir, 0).filter(col("pre") % 3 === 0)
        .select("okey", "part"), path, keyCols, "part")
      compact(s, path, "part", keyCols)
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // q19: the commit timeline end-to-end — two versioned upserts, then
    // an incremental pull since commit 1. The pull must return exactly
    // the rows OWNED by commit 2 (batch-2 winners), and none of the
    // batch-1 survivors whose keys batch 2 never touched — that
    // exclusion is what proves per-record stamps merge correctly.
    "q19_incremental_pull" -> ((s, dir) => {
      val path = scratchTable("graft_q19_")
      val keyCols = Seq("okey")
      val c1 = upsertVersioned(s, replayBatch(s, dir, 0), path,
        keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1), path,
        keyCols, "pre", "part")
      readSince(s, path, c1)
        .select(col("okey"), col("part"), col("price"), col("pre"),
          col(commitCol).as("commit_ts"))
        .orderBy("part", "okey")
    }),
    // q22: timeline introspection + monotonicity under the nastiest
    // sequence — a delete that removes EVERY row stamped with the
    // latest commit. A data-derived next-commit would reuse id 2 and an
    // incremental consumer would silently miss the reused commit; the
    // metadata timeline must keep issuing 3. Output = the commits()
    // enumeration itself, relationally recomputed by the oracle.
    "q22_timeline" -> ((s, dir) => {
      val path = scratchTable("graft_q22_")
      val keyCols = Seq("okey")
      val c1 = upsertVersioned(s, replayBatch(s, dir, 0), path,
        keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1), path,
        keyCols, "pre", "part")
      // drop every surviving commit-2 row, then commit again
      delete(s, readSince(s, path, c1).select("okey", "part"),
        path, keyCols, "part")
      upsertVersioned(s, replayBatch(s, dir, 2), path,
        keyCols, "pre", "part")
      commits(s, path).orderBy("commit_ts")
    }))

  /** DuckDB replay of the same algebra: per-batch dedup by max
    * precombine, batch-wins-over-stored merge, distinct-key anti-join
    * delete — each window/join mirrors one Merge stage. */
  /** The q18 replay algebra, shared verbatim by q23: compaction must be
    * content-invariant, so both keys check against the SAME relation. */
  private val replaySql =
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
      |ORDER BY t2.part, t2.okey""".stripMargin

  val oracle: Map[String, String] = Map(
    "q18_upsert_replay" -> replaySql,
    "q23_compact" -> replaySql,
    // evolution: batch-2 rows carry src='b1'; batch-1 survivors are
    // NULL-filled — exactly the read-back of a mixed-schema table
    "q18b_schema_evolution" ->
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
        |         FROM raw WHERE pre % 7 = 1) WHERE rn = 1)
        |SELECT okey, part, price, pre, src FROM (
        |  SELECT okey, part, price, pre, 'b1' AS src FROM b2
        |  UNION ALL
        |  SELECT b1.okey, b1.part, b1.price, b1.pre,
        |         CAST(NULL AS VARCHAR) AS src
        |  FROM b1 LEFT JOIN b2 ON b1.okey = b2.okey AND b1.part = b2.part
        |  WHERE b2.pre IS NULL)
        |ORDER BY part, okey""".stripMargin,
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
        |ORDER BY part, okey""".stripMargin,
    // the timeline enumeration: per replay batch b ∈ {0,1,2} → commit
    // b+1 with the DEDUPED row count and sorted distinct partitions;
    // the mid-sequence delete records no commit and must not shift ids
    "q22_timeline" ->
      """WITH raw AS (SELECT o_orderkey % 7 AS b, o_orderkey % 500 AS okey,
        |               o_orderstatus AS part, o_orderkey AS pre
        |             FROM orders
        |             WHERE o_orderkey % 7 IN (0, 1, 2)),
        |d AS (SELECT b, COUNT(*) AS n_rows FROM (
        |        SELECT b, okey, part, row_number() OVER (
        |          PARTITION BY b, okey, part ORDER BY pre DESC) AS rn
        |        FROM raw) WHERE rn = 1 GROUP BY b),
        |p AS (SELECT b, string_agg(DISTINCT part, ',' ORDER BY part)
        |        AS partitions
        |      FROM raw GROUP BY b)
        |SELECT CAST(d.b + 1 AS BIGINT) AS commit_ts, d.n_rows, p.partitions
        |FROM d JOIN p ON d.b = p.b
        |ORDER BY commit_ts""".stripMargin)
}
