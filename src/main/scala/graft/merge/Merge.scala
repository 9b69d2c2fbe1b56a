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
  *  4. the merged replacement rows are staged durably (written ONCE,
  *     hive-partitioned, in a staging sibling), the superseded files
  *     retired, and the staged files RENAMED into the table — on
  *     HDFS-like filesystems renames are metadata operations, so the
  *     data is never written twice. On object stores (S3A) rename is
  *     copy+delete: the publish step then re-copies the staged bytes
  *     and the partial-commit crash window widens accordingly (see
  *     [[commitFiles]]).
  * The reconcile itself is broadcast-anti-join shaped (the batch is tiny
  * vs the table), so the only table-sized cost is the key scan of the
  * touched partitions — column-pruned to the key columns, which parquet
  * serves from dictionary/stats pages.
  *
  * ==Single-writer contract==
  * A merge-managed table admits ONE writer at a time (the reference
  * enforces the same serialization via `max_concurrent_runs = 1`,
  * `terraform/glue.tf:94-96`). Two concurrent file-group merges can
  * plan against the same stored file and each retire it; the engine
  * detects the violation (a superseded file that vanished mid-commit
  * fails the commit loudly, before any replacement lands) but does not
  * arbitrate it — serialize writers externally. [[upsertVersioned]]
  * additionally claims its commit id via an exclusive-create inflight
  * marker, so even racing versioned writers can never stamp two batches
  * with the same commit id.
  */
object Merge {

  /** What a merge wrote: deduped batch row count + touched partition
    * values rendered as hive-relative strings (`a=1/b=x` for multi-level
    * partitioning, the bare value for the single-column common case) —
    * the commit-metadata payload for [[upsertVersioned]]. */
  final case class MergeStats(nRows: Long, partitions: Seq[String])

  /** The physical outcome of one durable commit: table-relative file
    * lists recorded in the commit metadata (rollback reverses exactly
    * these), plus the staging dir the caller sweeps after the commit
    * record lands. */
  private[merge] final case class CommitResult(
      added: Seq[String], removed: Seq[String], staging: String)

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
    * The distinct-value collect is a driver round-trip over
    * low-cardinality partition columns — cheap at any table size, and it
    * turns the table read into a partition-pruned scan. Each element is
    * one partition tuple in `partitionCols` order. */
  private[merge] def touchedPartitions(
      batch: DataFrame, partitionCols: Seq[String]): Seq[Seq[Any]] =
    // an unpartitioned table is one (empty-tuple) partition, always
    // touched — no job needed to know that (read-path planners like
    // the MOR snapshot merge rely on this staying job-free; WRITE
    // paths go through touchedPartitionsProbed)
    if (partitionCols.isEmpty) Seq(Seq.empty)
    else batch.select(partitionCols.map(col): _*).distinct().collect()
      .map(r => partitionCols.indices.map(r.get)).toSeq

  /** [[touchedPartitions]] for the WRITE paths (upsert /
    * insertOverwrite / delete): additionally probes an UNPARTITIONED
    * batch for emptiness (one LIMIT-1 job — the partitioned branch
    * already pays a distinct-collect job, so the layouts stay
    * comparable) so that an empty batch yields ZERO touched partitions
    * in both layouts and the callers' `parts.isEmpty` no-op guards
    * fire identically — without it an empty write against an
    * unpartitioned table ran a table-scoped merge and recorded a
    * spurious timeline commit while the partitioned path no-opped. */
  private[merge] def touchedPartitionsProbed(
      batch: DataFrame, partitionCols: Seq[String]): Seq[Seq[Any]] =
    if (partitionCols.isEmpty && batch.isEmpty) Seq.empty
    else touchedPartitions(batch, partitionCols)

  /** Null-safe membership for the touched-partition filter: a plain
    * `isin` evaluates to NULL (= dropped) for null-partition rows, so a
    * batch touching the null partition would silently exclude its
    * stored rows from the rewrite — under delete() that turns into
    * destroying the whole __HIVE_DEFAULT_PARTITION__ directory instead
    * of removing one key. Single-column keeps the `isin` shape (one
    * InSet that partition pruning folds); multi-column becomes an OR of
    * per-tuple null-safe conjunctions — partition tuples are few, so
    * the predicate stays small. */
  private[merge] def partitionIn(partitionCols: Seq[String], parts: Seq[Seq[Any]])
      : Column =
    if (partitionCols.size == 1) {
      val vals = parts.map(_.head)
      val nonNull = vals.filterNot(_ == null)
      val base =
        if (nonNull.isEmpty) lit(false)
        else col(partitionCols.head).isin(nonNull: _*)
      if (vals.exists(_ == null)) base || col(partitionCols.head).isNull
      else base
    } else
      parts.map { tuple =>
        partitionCols.zip(tuple)
          .map { case (c, v) => col(c) <=> lit(v) }
          // zero partition columns: every row lives in the one
          // (empty-tuple) partition, so its membership test is TRUE —
          // an unpartitioned table's delete/upsert scopes to the
          // whole table, not to nothing
          .reduceOption(_ && _).getOrElse(lit(true))
      }.reduceOption(_ || _).getOrElse(lit(false))

  /** One hive path segment, escaped exactly as Spark's partitioned
    * writes escape it (null → `__HIVE_DEFAULT_PARTITION__`). */
  private def partitionDirName(colName: String, v: Any): String = {
    val dir = if (v == null) "__HIVE_DEFAULT_PARTITION__"
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(v.toString)
    s"$colName=$dir"
  }

  /** The table-relative directory of one partition tuple
    * (`pair=ADAGBP` or `day=2024-01-01/pair=ADAGBP`). */
  private[merge] def partitionRelDir(cols: Seq[String], vals: Seq[Any]): String =
    cols.zip(vals).map { case (c, v) => partitionDirName(c, v) }.mkString("/")

  /** Human-readable partition tuple for commit metadata: raw values
    * joined by '/' (single-column renders as the bare value, matching
    * the pre-multi-level metadata format). */
  private[merge] def renderPartition(vals: Seq[Any]): String =
    vals.map(v => if (v == null) "__HIVE_DEFAULT_PARTITION__" else v.toString)
      .mkString("/")

  private[merge] def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** "Exists" means HAS DATA: metadata entries (`_graft_commits/`,
    * `_graft_schema.json`, `_SUCCESS`) don't count — an inflight
    * timeline marker may be created before the first batch lands. */
  private[merge] def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = fsFor(spark, path)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  // ---- table schema metadata ----
  // Spark's file listing skips paths starting with '_' or '.', so both
  // metadata locations below are invisible to plain `read.parquet(path)`.

  private def schemaMetaPath(path: String) = new Path(path, "_graft_schema.json")

  private[merge] def readSmallFile(fs: FileSystem, p: Path): String = {
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
  private[merge] def replaceSmallFile(fs: FileSystem, p: Path,
      body: String): Unit = {
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
  private[merge] def updateSchemaMeta(spark: SparkSession, path: String,
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
    // the schema file is the one metadata target CONCURRENT writers on
    // disjoint partitions both touch — a lost delete+rename race here
    // would hide the losing writer's evolved columns. Retry bounded:
    // re-read the winner's union and fold ours in (additive unions
    // commute, so any interleaving converges to the same field set).
    var attempts = 0
    var done = false
    var toWrite = merged
    while (!done) {
      try {
        replaceSmallFile(fsFor(spark, path), schemaMetaPath(path),
          toWrite.json)
        done = true
      } catch {
        case e: java.io.IOException if attempts < 5 =>
          attempts += 1
          val theirs = readSchemaMeta(spark, path)
          toWrite = theirs match {
            case None => toWrite
            case Some(t) => StructType(t.fields ++
              toWrite.fields.filterNot(f => t.fieldNames.contains(f.name)))
          }
      }
    }
  }

  /** The recorded authoritative schema, if this table has one — the
    * catalog-sync path needs it to register evolved columns explicitly
    * (a footer-inferred catalog table would miss columns that only
    * newer files carry). */
  def recordedSchema(spark: SparkSession, path: String): Option[StructType] =
    readSchemaMeta(spark, path)

  /** Create an EMPTY table: directory + recorded schema, no data files
    * (the `CREATE TABLE (cols...) USING graft` DDL shape — reads
    * resolve and return zero rows until the first write). */
  def createEmptyTable(spark: SparkSession, path: String,
      schema: StructType): Unit = {
    fsFor(spark, path).mkdirs(new Path(path))
    updateSchemaMeta(spark, path, schema)
  }

  /** Additive schema evolution as an explicit DDL operation (the
    * `ALTER TABLE ... ADD COLUMNS` shape): appends `newCols` to the
    * recorded schema. Pure metadata — no data file is touched; rows
    * written before the evolution read the new columns as null.
    * Duplicate names fail loudly (ALTER semantics), unlike the
    * implicit write-side union which treats re-sent columns as
    * already-evolved. */
  def addColumns(spark: SparkSession, path: String,
      newCols: StructType): Unit = {
    val existing = recordedSchema(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"ALTER TABLE ADD COLUMNS: no graft table recorded at $path"))
    val resolver = spark.sessionState.conf.resolver
    newCols.fields.foreach { f =>
      require(!existing.fields.exists(e => resolver(e.name, f.name)),
        s"ALTER TABLE ADD COLUMNS: column '${f.name}' already exists " +
          s"in ${existing.simpleString}")
    }
    updateSchemaMeta(spark, path, StructType(existing.fields ++ newCols.fields))
  }

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
  private[merge] def decodeFileName(urlEncoded: String): String =
    new Path(new java.net.URI(urlEncoded)).toString

  private[merge] def alignTo(df: DataFrame, target: Seq[(String, DataType)])
      : DataFrame =
    df.select(target.map { case (n, t) =>
      if (df.columns.contains(n)) col(n).cast(t).as(n)
      else lit(null).cast(t).as(n)
    }: _*)

  /** Data files under `root`, recursively, skipping metadata entries
    * ('_'/'.'-prefixed at any level — `_SUCCESS`, `.crc` siblings,
    * `_graft_commits/`...). */
  private def listDataFiles(fs: FileSystem, root: Path): Seq[Path] =
    listDataStatuses(fs, root).map(_.getPath)

  /** [[listDataFiles]] with the full `FileStatus` (the byte sizes feed
    * the key-index probe/build gates). */
  private[merge] def listDataStatuses(fs: FileSystem, root: Path)
      : Seq[org.apache.hadoop.fs.FileStatus] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) Nil
      else if (st.isDirectory) listDataStatuses(fs, st.getPath)
      else Seq(st)
    }

  private[merge] def relativize(root: Path, p: Path): String =
    root.toUri.relativize(p.toUri).getPath

  /** Drop a partition directory that holds no data, then any emptied
    * ancestors — up to `levels` levels, never the table root. The ONE
    * husk-prevention rule, shared by delete()'s emptied-partition sweep
    * and rollback's un-publish cleanup: a leaf whose only residents are
    * '_'/'.'-prefixed metadata (checksum siblings, temp files) counts
    * as emptied and is removed recursively; ancestors must be literally
    * empty. A surviving husk is worse than cosmetic — a table whose
    * only entry is an empty partition dir reads as "existing" and fails
    * schema inference on the next write. */
  private[merge] def dropEmptiedDirs(fs: FileSystem, leaf: Path, levels: Int): Unit = {
    var p = leaf
    var lv = levels
    var emptied = lv > 0 && fs.exists(p) && fs.listStatus(p).forall { st =>
      val n = st.getPath.getName
      n.startsWith("_") || n.startsWith(".")
    }
    while (emptied) {
      if (!fs.delete(p, true))
        throw new java.io.IOException(
          s"failed to drop emptied partition dir $p")
      p = p.getParent
      lv -= 1
      emptied = lv > 0 && fs.exists(p) && fs.listStatus(p).isEmpty
    }
  }

  /** Where a commit's retired (superseded) files wait between being
    * unlinked from the table and the commit record landing — the
    * crash-recovery copy [[rollback]] restores. '_'-prefixed, so
    * invisible to every read. */
  private[merge] def rollbackDir(path: String, cts: Long): Path =
    new Path(path, f"_graft_rollback/$cts%020d")

  /** Drop a commit's working state after it is durably recorded (or
    * fully rolled back): the staging sibling and, for versioned commits,
    * the retired-file copy. A failed sweep must be VISIBLE — each leaked
    * dir holds real data and accumulates silently otherwise. */
  private[merge] def sweepCommitScratch(fs: FileSystem, staging: String,
      rollback: Option[Path]): Unit = {
    val stagingPath = new Path(staging)
    if (fs.exists(stagingPath) && !fs.delete(stagingPath, true))
      System.err.println(
        s"[graft.merge] WARN: failed to remove staging dir $staging " +
          "after a successful commit; delete it manually")
    rollback.foreach { rb =>
      if (fs.exists(rb) && !fs.delete(rb, true))
        System.err.println(
          s"[graft.merge] WARN: failed to remove retired-file dir $rb " +
            "after a successful commit; delete it manually")
    }
  }

  /** Durable commit of a file-group merge, in three mechanical steps:
    *
    *  1. STAGE: write the replacement rows ONCE, hive-partitioned, into
    *     a staging sibling. The replacement exists durably before any
    *     stored file is touched, and the staged file names are the final
    *     table file names — so the full commit plan (files to add, files
    *     to remove) is known before any mutation, and is recorded in a
    *     plan sibling of the inflight marker when `cts` is set
    *     ([[rollback]] reads it back).
    *  2. RETIRE: unlink each superseded file — MOVED under
    *     `_graft_rollback/<cts>/` for versioned commits (restorable),
    *     deleted for plain ones. A superseded file that is already gone
    *     means a concurrent writer violated the single-writer contract:
    *     fail loudly here, before any replacement lands.
    *  3. PUBLISH: rename each staged file into the table. On HDFS-like
    *     filesystems renames are metadata operations — the merged data
    *     is written exactly once (the previous shape re-read staging
    *     and appended it, writing every merged row twice). On object
    *     stores (S3A) rename degrades to copy+delete: the staged bytes
    *     ARE rewritten and each publish is non-atomic, so the
    *     write-once claim and the narrow crash window below hold only
    *     on rename-atomic storage — operators on S3 should front the
    *     table with a rename-atomic committer or layer.
    *
    * A crash between 2 and 3 leaves the commit mechanically reversible:
    * versioned commits via [[rollback]] (the plan sibling holds the
    * file lists, the rollback dir holds the retired bytes); plain
    * commits by moving the remaining staged files into place (the
    * error message says which).
    *
    * Only delete() can leave a touched partition with no files (a
    * batch-wins upsert always appends the batch's rows back), so the
    * emptied-directory sweep runs only when `dropEmptied` is set.
    *
    * For versioned commits (`cts` set) the staging + rollback dirs are
    * left in place — the caller sweeps them AFTER the commit record
    * lands, so every crash window stays reversible. */
  private[merge] def commitFiles(
      spark: SparkSession,
      merged: DataFrame,
      path: String,
      partitionCols: Seq[String],
      supersededFiles: Seq[String],
      touched: Seq[Seq[Any]],
      dropEmptied: Boolean,
      cts: Option[Long] = None): CommitResult = {
    val fs = fsFor(spark, path)
    val staging = path.stripSuffix("/") + s"_staging_${System.nanoTime()}"
    merged.write.partitionBy(partitionCols: _*).mode(SaveMode.Overwrite)
      .parquet(staging)
    val stagingRoot = fs.makeQualified(new Path(staging))
    val tableRoot = fs.makeQualified(new Path(path))
    // a merge that leaves NO survivors stages zero data files — the
    // publish step is then a no-op and only the retire step acts
    val moves = listDataFiles(fs, stagingRoot).map { src =>
      (src, new Path(tableRoot, relativize(stagingRoot, src)))
    }
    val added = moves.map { case (_, dest) => relativize(tableRoot, dest) }
    val removed = supersededFiles
      .map(f => relativize(tableRoot, fs.makeQualified(new Path(f))))
    val rb = cts.map(c => rollbackDir(path, c))
    // versioned: the full plan lands in the marker's plan SIBLING
    // (complete-or-absent via temp+rename) BEFORE any mutation, so
    // rollback() after any crash below is mechanical. The inflight
    // marker itself is never rewritten — the claim stays the original
    // exclusive-create through every crash window.
    cts.foreach { c =>
      val body = s"""{"commit_ts":$c,"staging":${jsonQuote(staging)},""" +
        s""""files_added":${jsonArray(added)},""" +
        s""""files_removed":${jsonArray(removed)}}"""
      replaceSmallFile(fs, planFile(path, c), body)
    }
    try {
      supersededFiles.foreach { f =>
        val p = new Path(f)
        if (!fs.exists(p))
          throw new java.io.IOException(
            s"superseded file $p vanished mid-commit — concurrent writer " +
              s"on $path? merge tables are single-writer (Merge scaladoc)")
        rb match {
          case Some(dir) =>
            val dest = new Path(dir, relativize(tableRoot, fs.makeQualified(p)))
            fs.mkdirs(dest.getParent)
            if (!fs.rename(p, dest))
              throw new java.io.IOException(
                s"failed to retire superseded file $p")
          case None =>
            if (!fs.delete(p, false))
              throw new java.io.IOException(
                s"failed to delete superseded file $p")
        }
      }
    } catch {
      // pre-publish failures: nothing new has landed; staging is the
      // clean recovery copy (and rollback() reverses any retires)
      case e: Throwable =>
        throw new RuntimeException(
          s"merge commit failed; staged merge result kept at $staging" +
            cts.map(c => s"; rollback(path, $c) restores the table")
              .getOrElse(""), e)
    }
    try moves.foreach { case (src, dest) =>
      fs.mkdirs(dest.getParent)
      if (!fs.rename(src, dest))
        throw new java.io.IOException(s"failed to publish $src to $dest")
    } catch {
      // a publish that dies mid-way has landed SOME replacement files —
      // the un-published remainder is still in staging, so the commit
      // can be completed (move the rest in) or reversed (rollback)
      case e: Throwable =>
        throw new RuntimeException(
          "merge publish PARTIALLY COMMITTED at " + path +
            s"; unpublished replacement files remain at $staging — " +
            cts.map(c => s"rollback(path, $c) reverses this commit, or ")
              .getOrElse("") +
            "moving the remaining staged files into place completes it", e)
    }
    try {
      if (dropEmptied) {
        touched.foreach { tuple =>
          // hive path escaping (and the null-partition dir name) must
          // match what the partitioned write produced; since the data
          // files were already removed one by one, a surviving dir here
          // is empty — cosmetic, but its absence is part of delete()'s
          // contract.
          dropEmptiedDirs(fs,
            new Path(s"$path/${partitionRelDir(partitionCols, tuple)}"),
            partitionCols.size)
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
    // key-index maintenance (advisory metadata): failure here must not
    // fail a DURABLY COMMITTED data change — new files simply stay
    // unindexed (always key-scanned) and stale entries are dropped at
    // probe time by the listing intersect, so a warn suffices.
    try KeyIndex.recordCommit(spark, path, merged.schema, cts, added, removed)
    catch {
      case e: Throwable =>
        System.err.println("[graft.merge] WARN: key-index update failed " +
          s"after a durable commit at $path (${e.getMessage}); new files " +
          "are unindexed until the next KeyIndex.compactIndex/compact")
    }
    if (cts.isEmpty) sweepCommitScratch(fs, staging, None)
    CommitResult(added, removed, staging)
  }

  /** O2: plain append (insert — combine-before-insert defaults off in
    * the reference, so no key reconciliation). */
  def insert(batch: DataFrame, path: String, partitionCol: String,
      keyCols: Seq[String] = Nil, precombine: String = null,
      dedup: Boolean = false): Unit =
    insert(batch, path, Seq(partitionCol), keyCols, precombine, dedup)

  /** [[insert]] with a multi-level (hive-nested) partition layout. */
  def insert(batch: DataFrame, path: String, partitionCols: Seq[String],
      keyCols: Seq[String], precombine: String,
      dedup: Boolean): Unit = {
    val b = if (dedup) precombineDedup(batch, keyCols, precombine) else batch
    b.write.partitionBy(partitionCols: _*).mode(SaveMode.Append).parquet(path)
    updateSchemaMeta(batch.sparkSession, path, batch.schema)
    voidHistory(batch.sparkSession, path)
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
      maxFiles: Int = 1 << 20): Unit =
    bulkInsert(batch, path, Seq(partitionCol), keyCols, targetFileBytes,
      maxFiles)

  /** [[bulkInsert]] with a multi-level (hive-nested) partition layout. */
  def bulkInsert(batch: DataFrame, path: String, partitionCols: Seq[String],
      keyCols: Seq[String], targetFileBytes: Long, maxFiles: Int): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(maxFiles >= 1, "maxFiles must be >= 1")
    // sizeInBytes is a BigInt that Catalyst pins to Long.MaxValue (and
    // beyond, after join multiplications) when stats are unknown — do
    // the arithmetic in BigInt and clamp, or the Int conversion wraps
    // into a garbage (even non-positive) partition count
    val planBytes = batch.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = ((planBytes / targetFileBytes) + 1)
      .min(BigInt(maxFiles)).max(BigInt(1)).toInt
    val layout = (partitionCols.map(col) ++ keyCols.map(col)).toIndexedSeq
    val spark = batch.sparkSession
    // key-index the bulk load (bulk_insert is the canonical way to
    // prime a table that upserts will then hit): a listing diff tells
    // us which files this append created. The pre-listing is a no-op on
    // the usual fresh table; on an existing table it is one metadata
    // listing — the same magnitude as the write's own file operations.
    val indexed = keyCols.nonEmpty &&
      KeyIndex.ensureSpec(spark, path, KeySpec(keyCols, partitionCols))
    val fs = fsFor(spark, path)
    val tableRoot = fs.makeQualified(new Path(path))
    val before: Set[String] =
      if (indexed && tableExists(spark, path))
        listDataFiles(fs, tableRoot).map(p => relativize(tableRoot, p)).toSet
      else Set.empty
    batch.repartitionByRange(nFiles, layout: _*)
      .write.partitionBy(partitionCols: _*).mode(SaveMode.Append).parquet(path)
    updateSchemaMeta(spark, path, batch.schema)
    if (indexed) {
      try {
        val added = listDataFiles(fs, tableRoot)
          .map(p => relativize(tableRoot, p)).filterNot(before)
        KeyIndex.recordCommit(spark, path, batch.schema, None, added, Nil)
      } catch {
        case e: Exception => System.err.println(
          s"[graft.merge] WARN: key-index update failed after bulkInsert " +
            s"at $path (${e.getMessage}); the new files stay unindexed")
      }
    }
    voidHistory(spark, path)
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
      partitionCol: String): Unit =
    upsert(spark, batch, path, keyCols, precombine, Seq(partitionCol))

  /** [[upsert]] over a multi-level (hive-nested) partition layout —
    * record identity becomes (key, full partition tuple), the Hudi
    * composite-key-generator partition-path analogue. */
  def upsert(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCols: Seq[String]): Unit = {
    upsertImpl(spark, batch, path, keyCols, precombine, partitionCols,
      needStats = false, cts = None, ordered = false)
    voidHistory(spark, path)
  }

  /** O1 with ordered-payload semantics — Hudi's
    * `DefaultHoodieRecordPayload` (shipped in the pinned 0.10.0) vs the
    * default OverwriteWithLatest that [[upsert]] implements: a stored
    * row survives unless the incoming row's precombine is >= the stored
    * one (ties go to the incoming row, matching Hudi). This makes the
    * final table state a pure per-key argmax over everything ever
    * written — INVARIANT to batch boundaries and arrival order, which
    * is what makes it the safe payload for streaming ingestion where
    * late or replayed micro-batches must not regress a key (the
    * x04_stream_upsert driver key proves exactly that). */
  def upsertOrdered(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCols: Seq[String]): Unit = {
    upsertImpl(spark, batch, path, keyCols, precombine, partitionCols,
      needStats = false, cts = None, ordered = true)
    voidHistory(spark, path)
  }

  /** Conditional merge — MERGE INTO semantics (Delta/Hudi's
    * WHEN MATCHED [AND cond] THEN UPDATE/DELETE, WHEN NOT MATCHED
    * [AND cond] THEN INSERT) composed from the existing primitives.
    *
    * The batch is precombine-deduped first (one candidate row per
    * scoped key — conditions are evaluated on the winning row), then
    * split three ways against the CURRENT target state:
    *
    *  - matched ∧ `whenMatchedDelete`          → the target row is deleted
    *  - matched ∧ ¬delete ∧ `whenMatchedUpdate`→ the target row is
    *    replaced by the source row (full-row update, the engine's
    *    upsert payload)
    *  - matched ∧ neither                      → the target row survives
    *    untouched (the source row is DISCARDED — this is what plain
    *    upsert cannot express)
    *  - not matched ∧ `whenNotMatchedInsert`   → the source row inserts
    *
    * Conditions reference the source row as `s.<col>` and (for the two
    * matched clauses) the target row as `t.<col>`; the insert condition
    * sees only `s.<col>`. `None` means the Delta defaults: never
    * delete, always update, always insert. Delete wins over update when
    * both conditions hold (clause order in SQL MERGE).
    *
    * Scale shape: the matched/not-matched split is ONE key-scoped join
    * against a partition-pruned read of only the batch-touched
    * partitions, then the work lands through [[delete]] +
    * [[upsert]] — whose own matched-FILE discovery (key scan or bloom
    * index) limits the rewrite to the file groups that actually hold
    * the affected keys. Applied as two mutations (a delete commit, then
    * an upsert commit), not one atomic commit: a crash between them
    * leaves the deletes applied and the updates/inserts not — visible
    * and re-runnable (the second application of the same merge is NOT
    * generally idempotent though: target rows updated by the first run
    * re-match with the new state). Single-writer, like every mutation
    * here. */
  def mergeInto(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCols: Seq[String],
      whenMatchedDelete: Option[Column] = None,
      whenMatchedUpdate: Option[Column] = None,
      whenNotMatchedInsert: Option[Column] = None): Unit = {
    val scopedKeys = keyCols ++ partitionCols
    val srcCols = batch.columns.toSeq
    val deduped = precombineDedup(batch, scopedKeys, precombine)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (!tableExists(spark, path)) {
        // nothing can match: the merge degenerates to conditional insert
        val ins = whenNotMatchedInsert
          .map(c => deduped.alias("s").filter(c)).getOrElse(deduped)
          .select(srcCols.map(col): _*)
        upsert(spark, ins, path, keyCols, precombine, partitionCols)
        return
      }
      val parts = touchedPartitions(deduped, partitionCols)
      val target = readTable(spark, path)
        .filter(partitionIn(partitionCols, parts))
      val s = deduped.alias("s")
      val t = target.alias("t")
      val on = scopedKeys.map(k => col(s"s.$k") <=> col(s"t.$k"))
        .reduce(_ && _)
      // NULL-valued conditions are "not satisfied" (SQL MERGE clause
      // semantics): a null delete condition must fall through to the
      // update clause, not veto it
      val delCond = coalesce(whenMatchedDelete.getOrElse(lit(false)),
        lit(false))
      val updCond = whenMatchedUpdate.getOrElse(lit(true))
      val matched = s.join(t, on, "inner")
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        // materialize BOTH splits with lineage truncated before any
        // mutation: their plans read the target's current files, which
        // the delete commit below rewrites — a lazy plan evaluated
        // after it would chase vanished parquet paths
        val delKeys = matched.filter(delCond)
          .select(scopedKeys.map(k => col(s"s.$k").as(k)): _*)
          .localCheckpoint(true)
        val ins = whenNotMatchedInsert
          .foldLeft(s.join(t, on, "left_anti"))((df, c) => df.filter(c))
          .select(srcCols.map(c => col(s"s.$c").as(c)): _*)
        val upserts = matched.filter(!delCond && updCond)
          .select(srcCols.map(c => col(s"s.$c").as(c)): _*)
          .unionByName(ins)
          .localCheckpoint(true)
        // disjoint key sets (delete ⊥ update by construction, inserts
        // are not-matched), so ordering is content-irrelevant; delete
        // first keeps the table minimal between the two commits
        if (delKeys.limit(1).count() > 0)
          delete(spark, delKeys, path, keyCols, partitionCols)
        if (upserts.limit(1).count() > 0)
          upsert(spark, upserts, path, keyCols, precombine, partitionCols)
      } finally { matched.unpersist(); () }
    } finally { deduped.unpersist(); () }
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
      partitionCols: Seq[String],
      needStats: Boolean,
      cts: Option[Long],
      ordered: Boolean): (MergeStats, Option[CommitResult]) = {
    val scopedKeys = keyCols ++ partitionCols
    // persisted: the deduped batch feeds the partition collect, the key
    // join build side, the merged union AND the stats count — one
    // materialization instead of four replays of the batch lineage
    val deduped = precombineDedup(batch, scopedKeys, precombine)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // record the table's key spec (first keyed write wins) so every
      // commit — including table services that take no keys — can
      // maintain the file-level key index
      val spec = KeySpec(keyCols, partitionCols)
      val indexActive = KeyIndex.ensureSpec(spark, path, spec)
      if (!tableExists(spark, path)) {
        // initial write: the same staged commit as every other write —
        // the staging + rename publish knows its added-file plan before
        // any file lands, so even a FIRST versioned commit rolls back.
        // The timeline's n_rows rides the write itself as an observed
        // metric — no separate count job per commit.
        val obs = if (needStats) Some(org.apache.spark.sql.Observation())
          else None
        val body = obs.fold(deduped)(o =>
          deduped.observe(o, count(lit(1)).as("n")))
        val res = commitFiles(spark, body, path, partitionCols,
          supersededFiles = Nil, touched = Nil, dropEmptied = false, cts)
        return (MergeStats(
          obs.map(_.get("n").asInstanceOf[Long]).getOrElse(0L),
          if (needStats)
            touchedPartitions(deduped, partitionCols).map(renderPartition)
          else Nil), Some(res))
      }
      val parts = touchedPartitionsProbed(deduped, partitionCols)
      if (parts.isEmpty) return (MergeStats(0L, Nil), None)
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
      // Before the scan, the file-level key index (when active) prunes
      // the candidate set: only files whose bloom may contain a batch
      // key — plus unindexed files — are read at all, so per-commit
      // scan cost tracks the matched file count, not partition size.
      val batchKeys = deduped.select(scopedKeys.map(col): _*).distinct()
      val fs = fsFor(spark, path)
      val tableRoot = fs.makeQualified(new Path(path))
      val candidates: Option[Seq[String]] =
        if (!indexActive) None
        else {
          val storedType = target.toMap
          // probe at the STORED column types — the index build hashes
          // values as read back from the committed files
          val typedKeys = deduped.select(scopedKeys.map(c =>
            col(c).cast(storedType(c)).as(c)): _*).distinct()
          val touchedDirs = parts.map(t => partitionRelDir(partitionCols, t))
          val statuses = touchedDirs.flatMap(d =>
            listDataStatuses(fs, new Path(tableRoot, d)))
          val allFiles = statuses.map(st =>
            relativize(tableRoot, st.getPath))
          KeyIndex.candidateFiles(spark, path, spec, touchedDirs, allFiles,
            statuses.map(_.getLen).sum, typedKeys)
        }
      val keySource = candidates match {
        case Some(cand) if cand.isEmpty => None // no file can match
        case Some(cand) => Some(spark.read.schema(stored.schema)
          .option("basePath", path)
          .parquet(cand.map(f => new Path(tableRoot, f).toString): _*))
        case None => Some(stored.filter(partitionIn(partitionCols, parts)))
      }
      val matchedFiles = keySource match {
        case None => IndexedSeq.empty[String]
        case Some(src) =>
          val keyScan = src
            .select(scopedKeys.map(col) :+ input_file_name().as("_file"): _*)
          val matchCond = scopedKeys.map(c => keyScan(c) <=> batchKeys(c))
            .reduce(_ && _)
          keyScan.join(broadcast(batchKeys), matchCond, "left_semi")
            .select("_file").distinct().collect()
            .map(r => decodeFileName(r.getString(0))).toIndexedSeq
      }
      // n_rows for the timeline is observed on the batch branch of the
      // write plan itself (Observation metrics count only successful
      // tasks) — the versioned path previously paid a separate count()
      // job per commit for it
      val obs = if (needStats) Some(org.apache.spark.sql.Observation())
        else None
      val newRows0 = alignTo(deduped, target)
      val newRows = obs.fold(newRows0)(o =>
        newRows0.observe(o, count(lit(1)).as("n")))
      val merged =
        if (matchedFiles.isEmpty) newRows // pure insert: nothing to rewrite
        else {
          // read ONLY the matched files; explicit schema (no footer
          // reads), basePath recovers the partition column from paths
          val matchedRows = spark.read.schema(stored.schema)
            .option("basePath", path).parquet(matchedFiles: _*)
          if (ordered) {
            // ordered payload (DefaultHoodieRecordPayload): per key the
            // max-precombine row wins across stored ∪ batch, ties to
            // the batch. Same shuffle shape as the anti-join path —
            // the window partitions on the scoped key, and only the
            // matched files' rows (not the table) enter it. A losing
            // batch row leaves the stored row — and its original
            // `_commit_ts` stamp — untouched, so incremental pulls
            // never see a key a late batch failed to advance.
            precombineDedup(
              newRows.withColumn("_graft_src", lit(1))
                .unionByName(alignTo(matchedRows, target)
                  .withColumn("_graft_src", lit(0))),
              scopedKeys, precombine, tieBreak = Seq("_graft_src"))
              .drop("_graft_src")
          } else {
            // batch wins over stored for the same key (Hudi upsert
            // semantics: incoming overwrites regardless of precombine
            // comparison vs stored)
            val survCond = scopedKeys.map(c => matchedRows(c) <=> batchKeys(c))
              .reduce(_ && _)
            val survivors = matchedRows.join(broadcast(batchKeys), survCond,
              "left_anti")
            newRows.unionByName(alignTo(survivors, target))
          }
        }
      val res = commitFiles(spark, merged, path, partitionCols, matchedFiles,
        parts, dropEmptied = false, cts)
      (MergeStats(obs.map(_.get("n").asInstanceOf[Long]).getOrElse(0L),
        parts.map(renderPartition)), Some(res))
    } finally deduped.unpersist()
  }

  /** Metadata-only adoption of an existing PLAIN parquet layout into
    * the commit timeline — Hudi's METADATA_ONLY bootstrap: not one data
    * byte is rewritten; the adoption commit simply records every
    * current data file as added, so versioned upserts/deletes, time
    * travel back to the adoption point, CDC and the incremental
    * streams all work from here on. The one-time cost is a single
    * column-pruned count (the timeline's n_rows) and a partition-value
    * distinct — both deliberate: adoption happens once per table.
    *
    * Bootstrapped rows carry NO `_commit_ts` stamp (their files predate
    * the timeline; after the first versioned write the column appears
    * and they read back null) — so incremental pulls exclude them, the
    * honest semantics for rows that predate the timeline: a consumer
    * starting from 0 sees every post-adoption change, and a snapshot
    * read sees everything. Refuses a path that already has a timeline.
    * Returns the adoption commit id. */
  def bootstrap(spark: SparkSession, path: String,
      partitionCols: Seq[String]): Long = {
    val fs = fsFor(spark, path)
    val tableRoot = fs.makeQualified(new Path(path))
    require(tableExists(spark, path),
      s"no data files at $path — nothing to bootstrap")
    require(!fs.exists(commitsDir(path)),
      s"$path already has a commit timeline — bootstrap adopts plain " +
        "layouts only")
    val files = listDataStatuses(fs, tableRoot)
      .map(st => relativize(tableRoot, st.getPath))
    val df = readTable(spark, path)
    partitionCols.foreach(c => require(df.columns.contains(c),
      s"partition column $c not present in the layout at $path"))
    // declare the schema first: even a crash between here and the
    // commit record leaves only harmless metadata (and a tombstonable
    // inflight marker)
    updateSchemaMeta(spark, path, df.schema)
    val cts = claimCommitId(spark, path)
    val parts = touchedPartitions(df, partitionCols).map(renderPartition)
    recordCommit(spark, path, cts, MergeStats(df.count(), parts),
      Some(CommitResult(files, Nil, "")))
    cts
  }

  /** Partition replace — Hudi's INSERT_OVERWRITE, the backfill
    * primitive: every partition the batch touches is replaced WHOLESALE
    * by the batch's rows for it (within-batch precombine dedup applies;
    * stored rows are dropped without ever being read — no key scan, no
    * merge join, so backfill cost is the WRITE cost plus a metadata
    * listing, the property that makes reprocessing a bad day's
    * partition cheap at 100 TB). Untouched partitions are untouched
    * files. Same staged commit + additive-evolution contract as
    * [[upsert]]. */
  def insertOverwrite(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCol: String): Unit =
    insertOverwrite(spark, batch, path, keyCols, precombine,
      Seq(partitionCol))

  /** [[insertOverwrite]] over a multi-level partition layout. */
  def insertOverwrite(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCols: Seq[String]): Unit = {
    insertOverwriteImpl(spark, batch, path, keyCols, precombine,
      partitionCols, needStats = false, cts = None)
    ()
  }

  /** [[insertOverwrite]] as a recorded timeline commit: the replaced
    * partitions' files retire to `_graft_history/`, so time travel,
    * [[restoreTo]], [[readChanges]] and the incremental/CDC streams all
    * compose with backfills — a partition replace surfaces in CDC as
    * exactly its row-level effect (kept keys update, vanished keys
    * delete, new keys insert). Returns the commit id. */
  def insertOverwriteVersioned(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCols: Seq[String]): Long = {
    val cts = claimCommitId(spark, path)
    val (stats, commit) = insertOverwriteImpl(spark,
      batch.withColumn(commitCol, lit(cts)), path, keyCols, precombine,
      partitionCols, needStats = true, cts = Some(cts))
    recordCommit(spark, path, cts, stats, commit)
    commit.foreach(c => retireToHistory(fsFor(spark, path), path, cts,
      c.staging))
    cts
  }

  private def insertOverwriteImpl(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCols: Seq[String],
      needStats: Boolean,
      cts: Option[Long]): (MergeStats, Option[CommitResult]) = {
    val scopedKeys = keyCols ++ partitionCols
    val deduped = precombineDedup(batch, scopedKeys, precombine)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val spec = KeySpec(keyCols, partitionCols)
      KeyIndex.ensureSpec(spark, path, spec)
      val obs = if (needStats) Some(org.apache.spark.sql.Observation())
        else None
      if (!tableExists(spark, path)) {
        // overwrite of nothing = the same staged initial write as upsert
        val body = obs.fold(deduped)(o =>
          deduped.observe(o, count(lit(1)).as("n")))
        val res = commitFiles(spark, body, path, partitionCols,
          supersededFiles = Nil, touched = Nil, dropEmptied = false, cts)
        return (MergeStats(
          obs.map(_.get("n").asInstanceOf[Long]).getOrElse(0L),
          if (needStats)
            touchedPartitions(deduped, partitionCols).map(renderPartition)
          else Nil), Some(res))
      }
      val parts = touchedPartitionsProbed(deduped, partitionCols)
      if (parts.isEmpty) return (MergeStats(0L, Nil), None)
      val stored = readTable(spark, path)
      // the same additive-evolution contract as upsert: a batch may add
      // columns, never silently drop stored ones
      val missing = stored.columns.toSet -- deduped.columns.toSet
      require(missing.isEmpty,
        s"insertOverwrite batch schema mismatch vs stored table at " +
          s"$path: batch lacks ${missing.mkString(",")} " +
          "(a versioned table must be written via " +
          "insertOverwriteVersioned)")
      val extra = deduped.columns.filterNot(stored.columns.contains)
      val target: Seq[(String, DataType)] =
        stored.schema.fields.map(f => f.name -> f.dataType).toIndexedSeq ++
          deduped.schema.fields.filter(f => extra.contains(f.name))
            .map(f => f.name -> f.dataType)
      // EVERY data file in a touched partition is superseded — this is
      // a metadata listing, not a scan
      val fs = fsFor(spark, path)
      val tableRoot = fs.makeQualified(new Path(path))
      val superseded = parts.flatMap(t => listDataStatuses(fs,
        new Path(tableRoot, partitionRelDir(partitionCols, t)))
        .map(_.getPath.toString))
      val body0 = alignTo(deduped, target)
      val body = obs.fold(body0)(o => body0.observe(o, count(lit(1)).as("n")))
      val res = commitFiles(spark, body, path, partitionCols, superseded,
        parts, dropEmptied = false, cts)
      (MergeStats(obs.map(_.get("n").asInstanceOf[Long]).getOrElse(0L),
        parts.map(renderPartition)), Some(res))
    } finally deduped.unpersist()
  }

  /** O3: delete by key — file-group rewrite of only the parquet files
    * that contain a matched key; emptied partition dirs are dropped. */
  def delete(
      spark: SparkSession,
      keys: DataFrame,
      path: String,
      keyCols: Seq[String],
      partitionCol: String): Unit =
    delete(spark, keys, path, keyCols, Seq(partitionCol))

  /** [[delete]] over a multi-level (hive-nested) partition layout. */
  def delete(
      spark: SparkSession,
      keys: DataFrame,
      path: String,
      keyCols: Seq[String],
      partitionCols: Seq[String]): Unit = {
    deleteImpl(spark, keys, path, keyCols, partitionCols, cts = None)
    voidHistory(spark, path)
  }

  private def deleteImpl(
      spark: SparkSession,
      keys: DataFrame,
      path: String,
      keyCols: Seq[String],
      partitionCols: Seq[String],
      cts: Option[Long]): (MergeStats, Option[CommitResult]) = {
    if (!tableExists(spark, path)) return (MergeStats(0L, Nil), None)
    // key scope includes the partition path (Hudi ComplexKeyGenerator
    // semantics): a delete key only removes rows in ITS partition, never
    // a same-keyed row in another touched partition
    val delKeys = keyCols ++ partitionCols
    val delDistinct = keys.select(delKeys.map(col): _*).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val parts = touchedPartitionsProbed(delDistinct, partitionCols)
      if (parts.isEmpty) return (MergeStats(0L, Nil), None)
      val stored = readTable(spark, path)
      // same index-pruned candidate discovery as upsert (delete keys
      // are partition-scoped, i.e. exactly the indexed scoped key)
      val spec = KeySpec(keyCols, partitionCols)
      val indexActive = KeyIndex.ensureSpec(spark, path, spec)
      val fs = fsFor(spark, path)
      val tableRoot = fs.makeQualified(new Path(path))
      val candidates: Option[Seq[String]] =
        if (!indexActive) None
        else {
          val storedType = stored.schema.fields
            .map(f => f.name -> f.dataType).toMap
          val typedKeys = delDistinct.select(delKeys.map(c =>
            col(c).cast(storedType(c)).as(c)): _*).distinct()
          val touchedDirs = parts.map(t => partitionRelDir(partitionCols, t))
          val statuses = touchedDirs.flatMap(d =>
            listDataStatuses(fs, new Path(tableRoot, d)))
          val allFiles = statuses.map(st =>
            relativize(tableRoot, st.getPath))
          KeyIndex.candidateFiles(spark, path, spec, touchedDirs, allFiles,
            statuses.map(_.getLen).sum, typedKeys)
        }
      val keySource = candidates match {
        case Some(cand) if cand.isEmpty => None // no file holds a del key
        case Some(cand) => Some(spark.read.schema(stored.schema)
          .option("basePath", path)
          .parquet(cand.map(f => new Path(tableRoot, f).toString): _*))
        case None => Some(stored.filter(partitionIn(partitionCols, parts)))
      }
      val matchedFiles = keySource match {
        case None => IndexedSeq.empty[String]
        case Some(src) =>
          val keyScan = src
            .select(delKeys.map(col) :+ input_file_name().as("_file"): _*)
          val matchCond = delKeys.map(c => keyScan(c) <=> delDistinct(c))
            .reduce(_ && _)
          keyScan.join(broadcast(delDistinct), matchCond, "left_semi")
            .select("_file").distinct().collect()
            .map(r => decodeFileName(r.getString(0))).toIndexedSeq
      }
      if (matchedFiles.isEmpty)
        return (MergeStats(0L, parts.map(renderPartition)), None)
      val matchedRows = spark.read.schema(stored.schema)
        .option("basePath", path).parquet(matchedFiles: _*)
      val survCond = delKeys.map(c => matchedRows(c) <=> delDistinct(c))
        .reduce(_ && _)
      val remaining = matchedRows.join(broadcast(delDistinct), survCond,
        "left_anti")
      val res = commitFiles(spark, remaining, path, partitionCols,
        matchedFiles, parts, dropEmptied = true, cts)
      // a delete commit WRITES no rows (n_rows 0 in the timeline); its
      // effect is rows vanishing from every later read
      (MergeStats(0L, parts.map(renderPartition)), Some(res))
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
      maxFiles: Int = 1 << 20): Long =
    compact(spark, path, Seq(partitionCol), keyCols, targetFileBytes, maxFiles)

  /** [[compact]] over a multi-level (hive-nested) partition layout. */
  def compact(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String],
      keyCols: Seq[String],
      targetFileBytes: Long,
      maxFiles: Int): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(maxFiles >= 1, "maxFiles must be >= 1")
    if (!tableExists(spark, path)) return 0L
    val fs = fsFor(spark, path)
    val (files, totalBytes) =
      compactionCandidates(fs, path, partitionCols, targetFileBytes)
    if (files.isEmpty) return 0L
    val stored = readTable(spark, path)
    val rows = spark.read.schema(stored.schema)
      .option("basePath", path).parquet(files: _*)
    val nFiles = math.min(totalBytes / targetFileBytes + 1, maxFiles.toLong)
      .toInt
    val layout = (partitionCols.map(col) ++ keyCols.map(col)).toIndexedSeq
    commitRewrite(spark, path, partitionCols,
      rows.repartitionByRange(nFiles, layout: _*), files, versioned = false)
  }

  /** Shared tail of every layout rewrite (compaction / clustering):
    * stage + publish the rewritten rows superseding `files`, then run
    * index maintenance. Versioned rewrites land as recorded service
    * commits (stats say 0 rows — bytes moved, not state) with their
    * retired originals preserved in `_graft_history/`; unversioned
    * ones void history, because an unrecorded rewrite makes older
    * snapshots unreconstructable and the floor must say so.
    *
    * A rewrite is ALSO the key index's maintenance moment: the
    * per-commit entry log folds into one snapshot, and files from
    * plain inserts that predated the index get indexed by riding
    * through commitFiles. */
  private def commitRewrite(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String],
      rewritten: DataFrame,
      files: IndexedSeq[String],
      versioned: Boolean): Long = {
    if (versioned) {
      val cts = claimCommitId(spark, path)
      val res = commitFiles(spark, rewritten, path, partitionCols, files,
        touched = Nil, dropEmptied = false, Some(cts))
      recordCommit(spark, path, cts, MergeStats(0L, Nil), Some(res))
      retireToHistory(fsFor(spark, path), path, cts, res.staging)
    } else {
      commitFiles(spark, rewritten, path, partitionCols, files,
        touched = Nil, dropEmptied = false)
    }
    try KeyIndex.compactIndex(spark, path)
    catch {
      case e: Exception => System.err.println(
        s"[graft.merge] WARN: key-index fold failed at $path " +
          s"(${e.getMessage}); the entry log keeps working, just longer")
    }
    if (!versioned) voidHistory(spark, path)
    files.length.toLong
  }

  /** Small-file candidate selection shared by [[compact]] and
    * [[compactVersioned]]: every leaf partition holding more files
    * than its byte size justifies contributes all of them. A metadata
    * listing — no data is read. */
  private def compactionCandidates(fs: FileSystem, path: String,
      partitionCols: Seq[String], targetFileBytes: Long)
      : (IndexedSeq[String], Long) = {
    // leaf partition dirs: one `col=value` level per partition column
    def leafDirs(root: Path, cols: Seq[String]): Seq[Path] = cols match {
      case Nil => Seq(root)
      case c +: rest => fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$c="))
        .flatMap(d => leafDirs(d.getPath, rest))
    }
    val candidates = leafDirs(new Path(path), partitionCols).flatMap { d =>
      val files = fs.listStatus(d)
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
      val bytes = files.map(_.getLen).sum
      // Long division throughout — an Int conversion here wraps for
      // TB-scale partitions with small targets (the bulkInsert bug)
      val ideal = bytes / targetFileBytes + 1
      if (files.length > ideal) Some((files.map(_.getPath).toSeq, bytes))
      else None
    }
    (candidates.flatMap(_._1).map(_.toString).toIndexedSeq,
      candidates.map(_._2).sum)
  }

  /** [[compact]] recorded on the commit timeline — compaction as a
    * table SERVICE instead of a history-voiding mutation (Hudi's
    * compaction/clustering are timeline actions for the same reason).
    * The rewrite preserves every row's `_commit_ts` stamp, so the
    * commit owns NO rows: incremental pulls re-emit nothing, the CDC
    * stream classifies zero changes for it (every pre-image survives
    * into the post set with its old stamp), and [[diffSnapshots]]
    * across it is empty — while [[readAsOf]] before the compaction
    * still reconstructs the old small-file state from
    * `_graft_history/`, and [[rollback]]/[[restoreTo]] reverse it
    * mechanically like any other commit.
    *
    * Requires a table whose recorded schema carries the stamp column
    * (at least one versioned write) — on a plain table there is no
    * history to preserve and [[compact]] is the right (cheaper) tool.
    * Returns the number of small files replaced (0 = nothing to do,
    * no commit claimed). */
  def compactVersioned(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String],
      keyCols: Seq[String] = Nil,
      targetFileBytes: Long = 128L * 1024 * 1024,
      maxFiles: Int = 1 << 20): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(maxFiles >= 1, "maxFiles must be >= 1")
    if (!tableExists(spark, path)) return 0L
    require(readSchemaMeta(spark, path)
        .exists(_.fieldNames.contains(commitCol)),
      s"$path carries no $commitCol stamps (no versioned write yet) — " +
        "there is no history to preserve; use compact")
    val fs = fsFor(spark, path)
    val (files, totalBytes) =
      compactionCandidates(fs, path, partitionCols, targetFileBytes)
    if (files.isEmpty) return 0L
    val stored = readTable(spark, path)
    // stamps ride along untouched: the read schema includes commitCol,
    // and no column is rewritten — preservation IS the no-CDC contract
    val rows = spark.read.schema(stored.schema)
      .option("basePath", path).parquet(files: _*)
    val nFiles = math.min(totalBytes / targetFileBytes + 1, maxFiles.toLong)
      .toInt
    val layout = (partitionCols.map(col) ++ keyCols.map(col)).toIndexedSeq
    commitRewrite(spark, path, partitionCols,
      rows.repartitionByRange(nFiles, layout: _*), files, versioned = true)
  }

  /** Z-order clustering — the multi-column analogue of [[compact]]'s
    * linear key layout, and the clustering table service Hudi shipped
    * in exactly the release the reference pins (`hudi-spark3-bundle
    * _2.12:0.10.0`, `glue/interactive.sh:12` — 0.10.0 introduced
    * z-order/hilbert clustering). Every data file is rewritten so rows
    * are range-laid and sorted on the Morton interleave of `zCols`
    * ([[graft.scale.Scale.interleaveBits]]): each output file then
    * covers a hyper-rectangle of the zCols space, so parquet min/max
    * stats prune scans filtering on ANY subset of those columns — a
    * linear (a, b) sort layout serves only prefix predicates, and at
    * 100 TB the difference is reading 1/K of the files vs all of them
    * for a b-only predicate.
    *
    * Each zCol is normalized to a `bits`-wide non-negative cell index
    * from its observed min/max, both derived IN-PLAN (a broadcast
    * one-row aggregate, like the tf-idf corpus count) — the whole
    * service is one staged-commit job, no separate stats action. Rows,
    * including `_commit_ts` stamps, pass through untouched (incremental
    * pulls are clustering-invariant, same contract as compact).
    * Numeric zCols only — hash non-numeric columns to a number first
    * (e.g. `xxhash64`); silent coercion of strings would z-order on
    * dictionary ids the caller never sees. Nulls collapse to cell 0.
    * Goes through the same durable staged commit as every other write;
    * voids history like [[compact]] (use [[clusterZOrderVersioned]] on
    * a versioned table). Returns the number of files rewritten. */
  def clusterZOrder(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String],
      zCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024,
      maxFiles: Int = 1 << 20): Long =
    clusterZOrderImpl(spark, path, partitionCols, zCols, targetFileBytes,
      maxFiles, versioned = false)

  /** [[clusterZOrder]] recorded on the commit timeline — clustering as
    * a table service with the same contract as [[compactVersioned]]:
    * stamps pass through untouched so the commit owns no rows (no CDC,
    * no incremental re-emission, empty [[diffSnapshots]]), pre-cluster
    * snapshots stay reconstructable from `_graft_history/`, and
    * rollback/restore reverse it mechanically — exactly Hudi 0.10's
    * clustering-as-timeline-action. Requires at least one versioned
    * write, as for [[compactVersioned]]. */
  def clusterZOrderVersioned(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String],
      zCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024,
      maxFiles: Int = 1 << 20): Long = {
    require(readSchemaMeta(spark, path)
        .exists(_.fieldNames.contains(commitCol)),
      s"$path carries no $commitCol stamps (no versioned write yet) — " +
        "there is no history to preserve; use clusterZOrder")
    clusterZOrderImpl(spark, path, partitionCols, zCols, targetFileBytes,
      maxFiles, versioned = true)
  }

  private def clusterZOrderImpl(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String],
      zCols: Seq[String],
      targetFileBytes: Long,
      maxFiles: Int,
      versioned: Boolean): Long = {
    require(zCols.size >= 2,
      "z-order needs >= 2 columns (one column is a plain sort — use " +
        "compact's key layout for that)")
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(maxFiles >= 1, "maxFiles must be >= 1")
    if (!tableExists(spark, path)) return 0L
    val fs = fsFor(spark, path)
    val files = listDataFiles(fs, fs.makeQualified(new Path(path)))
      .map(_.toString).toIndexedSeq
    if (files.isEmpty) return 0L
    val totalBytes = files.map(f => fs.getFileStatus(new Path(f)).getLen).sum
    val stored = readTable(spark, path)
    val rows = spark.read.schema(stored.schema)
      .option("basePath", path).parquet(files: _*)
    val bits = math.min(16, 63 / zCols.size)
    val cells = (1L << bits) - 1
    val statAggs = zCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"_zmin_$c"),
      max(col(c).cast("double")).as(s"_zmax_$c")))
    val stats = rows.agg(statAggs.head, statAggs.tail: _*)
    val cellCols = zCols.map { c =>
      val lo = col(s"_zmin_$c")
      val hi = col(s"_zmax_$c")
      // constant / all-null dimensions contribute nothing to the curve
      coalesce(
        when(hi > lo,
          floor((col(c).cast("double") - lo) / (hi - lo) * cells)
            .cast("long")),
        lit(0L))
    }
    val nFiles = math.min(totalBytes / targetFileBytes + 1, maxFiles.toLong)
      .toInt
    val layout =
      (partitionCols.map(col) :+ col("_zval").asc).toIndexedSeq
    val clustered = rows
      .crossJoin(broadcast(stats))
      .withColumn("_zval", graft.scale.Scale.interleaveBits(cellCols, bits))
      .repartitionByRange(nFiles, layout: _*)
      .sortWithinPartitions(layout: _*)
      .select(rows.columns.toIndexedSeq.map(col): _*)
    commitRewrite(spark, path, partitionCols, clustered, files, versioned)
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

  private[merge] def commitsDir(path: String) = new Path(path, "_graft_commits")

  /** The timeline directory (for the incremental commit stream). */
  private[merge] def commitsDirPath(path: String): Path = commitsDir(path)

  /** Timeline entry names: `<zero-padded id>.json` (recorded commit),
    * `.inflight` (issued, data possibly landing), `.rolledback`
    * (reversed — tombstoned so the id is never reissued). Strictly
    * numeric stems: any other file in `_graft_commits/` (editor backup,
    * `.crc` sibling on checksum filesystems) is FOREIGN and ignored —
    * one junk entry must not brick every later versioned write. */
  private[merge] val commitEntryRe = """^(\d+)\.(json|inflight|rolledback)$""".r

  /** Every id the timeline has ever ISSUED — recorded commits, inflight
    * markers left by crashed runs, and rolled-back tombstones. All
    * count: an id whose data may have been visible, even transiently,
    * must never be reissued. */
  private def listIssuedIds(spark: SparkSession, path: String): Seq[Long] = {
    val fs = fsFor(spark, path)
    val p = commitsDir(path)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).map(_.getPath.getName).toSeq.collect {
      case commitEntryRe(id, _) => id.toLong
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

  private[merge] def jsonQuote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private[merge] def jsonArray(xs: Seq[String]): String =
    xs.map(jsonQuote).mkString("[", ",", "]")

  private def inflightMarker(path: String, cts: Long) =
    new Path(commitsDir(path), f"$cts%020d.inflight")

  /** Sibling of the inflight marker holding the full commit plan (what
    * [[rollback]] replays). Kept SEPARATE from the marker so the claim
    * file is never rewritten after its exclusive create: the plan lands
    * complete-or-absent via [[replaceSmallFile]]'s temp+rename, and a
    * crash mid-write can never corrupt (or momentarily drop) the claim
    * itself. `.plan` is not matched by [[commitEntryRe]], so these are
    * foreign to timeline listings and swept with their commit. */
  private[merge] def planFile(path: String, cts: Long) =
    new Path(commitsDir(path), f"$cts%020d.plan")

  /** Claim the next commit id by creating its inflight marker with
    * `overwrite = false` — an EXCLUSIVE create, atomic on HDFS-like
    * stores. Of two racing versioned writers exactly one owns each id;
    * the loser observes the collision and claims the next id, so two
    * batches can never land stamped with the same commit. (This
    * serializes id allocation only — concurrent DATA commits remain
    * excluded by the single-writer contract, see the object scaladoc.)
    *
    * Object-store caveat: S3A's `create(path, overwrite = false)` is a
    * check-then-write, not an atomic exclusive create, so on S3 the
    * claim degrades to best-effort — serialize versioned writers
    * externally there (the reference pipeline does exactly that via its
    * single-concurrency job setting). */
  private[merge] def claimCommitId(spark: SparkSession, path: String): Long = {
    fsFor(spark, path).mkdirs(commitsDir(path))
    claimFrom(spark, path, nextCommit(spark, path))
  }

  /** Atomic exclusive create of an empty claim marker. Hadoop's local
    * `create(path, overwrite = false)` is CHECK-THEN-TRUNCATE — two
    * racing claimants can both pass the exists check and both
    * "succeed" (the second truncates the first), sharing a commit id.
    * On local filesystems go through POSIX O_EXCL (`Files.createFile`),
    * which the kernel makes genuinely atomic; HDFS `create` is atomic
    * at the namenode already. The S3A degradation stays as documented
    * on [[claimCommitId]]. */
  private def createExclusive(fs: FileSystem, p: Path): Unit = fs match {
    case _: org.apache.hadoop.fs.LocalFileSystem |
        _: org.apache.hadoop.fs.RawLocalFileSystem =>
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      java.nio.file.Files.createFile(local)
      ()
    case _ => fs.create(p, false).close()
  }

  /** The claim loop from a given candidate id (split out so specs can
    * drive the collision path deterministically). A failed exclusive
    * create counts as a collision whenever the id is provably ISSUED —
    * its marker, recorded entry, OR rolled-back tombstone exists — not
    * merely when the marker survives: the winning writer may complete
    * its commit and delete its marker between our failed create and
    * the check, and aborting then would misreport a healthy race as an
    * IO failure. */
  private[merge] def claimFrom(
      spark: SparkSession, path: String, start: Long): Long = {
    val fs = fsFor(spark, path)
    var cts = start
    var claimed = false
    while (!claimed) {
      val stem = f"$cts%020d"
      // "retired" = this id completed (recorded) or died (tombstoned);
      // either way it has no marker left and must never be claimed —
      // a bare exclusive create would RESURRECT it
      def retired = fs.exists(new Path(commitsDir(path), s"$stem.json")) ||
        fs.exists(new Path(commitsDir(path), s"$stem.rolledback"))
      if (retired) cts += 1
      else {
        val marker = inflightMarker(path, cts)
        try {
          createExclusive(fs, marker)
          // a racing writer may have recorded/tombstoned this id between
          // the check and our create (rollback drops its marker AFTER
          // tombstoning): release the stale claim rather than keep a
          // dead id alive
          if (retired) {
            fs.delete(marker, false)
            cts += 1
          } else claimed = true
        } catch {
          // a collision and a genuine IO failure both surface as plain
          // IOException on some filesystems — any surviving trace of the
          // id having been issued proves another writer took it
          case e: java.io.IOException =>
            if (fs.exists(marker) || retired) cts += 1 else throw e
        }
      }
    }
    cts
  }

  private[merge] def recordCommit(spark: SparkSession, path: String, cts: Long,
      stats: MergeStats, files: Option[CommitResult]): Unit = {
    val fs = fsFor(spark, path)
    fs.mkdirs(commitsDir(path))
    val parts = stats.partitions.sorted.mkString(",")
    // wall_ms: the commit's RECORD wall-clock, written once here and
    // never rewritten — what `TIMESTAMP AS OF` resolves against
    // ([[commitAtWallClock]]). Subject to writer clock skew (documented
    // there); commit ids stay the only ordering the engine trusts.
    val body = s"""{"commit_ts":$cts,"n_rows":${stats.nRows},""" +
      s""""wall_ms":${System.currentTimeMillis()},""" +
      s""""partitions":${jsonQuote(parts)},""" +
      s""""files_added":${jsonArray(files.map(_.added).getOrElse(Nil))},""" +
      s""""files_removed":${jsonArray(files.map(_.removed).getOrElse(Nil))}}"""
    // complete-or-absent (temp + rename): a commit record is the unit a
    // CONCURRENT incremental stream tails (IncrementalStream), so a
    // half-written record must never be observable — the dot-prefixed
    // temp sibling is invisible to both the timeline listing and the
    // stream's glob
    replaceSmallFile(fs, new Path(commitsDir(path), f"$cts%020d.json"), body)
    fs.delete(planFile(path, cts), false)
    fs.delete(inflightMarker(path, cts), false)
  }

  /** Mechanically reverse a crashed (inflight) versioned commit from
    * the plan recorded in the marker's `.plan` sibling: un-publish the
    * files it added, restore the files it retired (from the
    * `_graft_rollback/<cts>/` copy the commit made before touching
    * them), sweep its staging dir, and tombstone the marker
    * (`<cts>.rolledback`) so the id is never reissued. A RECORDED
    * commit refuses to roll back — it is durable history an incremental
    * consumer may already have read. Idempotent across its own crash
    * windows: every step checks before acting, so a rollback that dies
    * midway can simply be re-run. */
  def rollback(spark: SparkSession, path: String, cts: Long): Unit = {
    val fs = fsFor(spark, path)
    val marker = inflightMarker(path, cts)
    val recorded = new Path(commitsDir(path), f"$cts%020d.json")
    if (fs.exists(recorded))
      throw new IllegalStateException(
        s"commit $cts at $path is RECORDED — a completed commit cannot be " +
          "rolled back (incremental consumers may already depend on it)")
    if (!fs.exists(marker))
      throw new IllegalArgumentException(
        s"no inflight commit $cts at $path — nothing to roll back")
    val tableRoot = fs.makeQualified(new Path(path))
    // drop the crashed commit's key-index entry FIRST: its add lines
    // point at files about to be un-published (phantom entries) and its
    // rm tombstones suppress files about to be restored. Missing entry
    // (crash before the index write) = no-op; orphaned stats for the
    // restored files just mean they are key-scanned until re-indexed.
    KeyIndex.dropEntry(spark, path, cts)
    val plan = planFile(path, cts)
    // the plan lives in the `.plan` sibling; earlier engine revisions
    // wrote it into the marker BODY itself — honor both, or a crashed
    // commit from an old-format table would be tombstoned as
    // "claim-only" while its half-published mutations stand (and the
    // marker delete below would destroy the only plan copy). No plan in
    // either place = crash before the plan landed: nothing was touched
    // (the plan is written before any mutation), so only the claim
    // needs tombstoning.
    val planSource: Option[(String, Path)] =
      if (fs.exists(plan)) Some((readSmallFile(fs, plan), plan))
      else Some(readSmallFile(fs, marker)).filter(_.nonEmpty).map((_, marker))
    planSource.foreach { case (body, src) =>
      val (added, removed, staging) =
        try {
          implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
          val j = org.json4s.jackson.JsonMethods.parse(body)
          ((j \ "files_added").extract[Seq[String]],
            (j \ "files_removed").extract[Seq[String]],
            (j \ "staging").extract[String])
        } catch {
          case e: Exception =>
            // the plan is written complete-or-absent (temp+rename), so
            // an unparseable body means external damage — name the
            // manual remedy instead of a bare parse stack. The remedy
            // must NEVER delete the marker itself: the marker is the
            // id's last issued-trace, and without it the re-run can't
            // tombstone, so the id would be reissued (the never-reuse
            // invariant). Plan sibling → delete it; legacy marker-body
            // plan → truncate the marker back to the bare claim.
            val clearStep =
              if (src == plan) s"delete $src"
              else s"truncate $src to empty (the bare claim — do NOT " +
                "delete it)"
            throw new IllegalStateException(
              s"rollback: commit plan $src is unreadable — cannot " +
                s"mechanically reverse commit $cts at $path. Manual " +
                s"remedy: move every file under ${rollbackDir(path, cts)} " +
                "back to its table-relative path, remove any published " +
                "replacement files not in the timeline's recorded " +
                s"commits, then $clearStep and re-run rollback to " +
                "tombstone the id", e)
        }
      added.foreach { rel =>
        val p = new Path(tableRoot, rel)
        if (fs.exists(p) && !fs.delete(p, false))
          throw new java.io.IOException(s"rollback: failed to un-publish $p")
      }
      val rb = rollbackDir(path, cts)
      removed.foreach { rel =>
        val src = new Path(rb, rel) // absent = this file was never retired
        if (fs.exists(src)) {
          val dest = new Path(tableRoot, rel)
          fs.mkdirs(dest.getParent)
          if (!fs.rename(src, dest))
            throw new java.io.IOException(s"rollback: failed to restore $dest")
        }
      }
      // un-publishing may leave behind the partition directories publish
      // created (restores above repopulate shared ones) — sweep them via
      // the shared husk-prevention rule
      added.foreach { rel =>
        dropEmptiedDirs(fs, new Path(tableRoot, rel).getParent,
          rel.count(_ == '/')) // partition dirs below the root
      }
      sweepCommitScratch(fs, staging, Some(rb))
    }
    // tombstone BEFORE dropping the plan and marker: the id stays
    // issued through every crash window, so it can never be reused
    writeSmallFile(fs, new Path(commitsDir(path), f"$cts%020d.rolledback"), "")
    fs.delete(plan, false)
    fs.delete(marker, false)
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
      partitionCol: String): Long =
    upsertVersioned(spark, batch, path, keyCols, precombine,
      Seq(partitionCol))

  /** [[upsertVersioned]] over a multi-level partition layout. */
  def upsertVersioned(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCols: Seq[String]): Long = {
    val cts = claimCommitId(spark, path)
    val (stats, commit) = upsertImpl(spark,
      batch.withColumn(commitCol, lit(cts)), path, keyCols, precombine,
      partitionCols, needStats = true, cts = Some(cts), ordered = false)
    recordCommit(spark, path, cts, stats, commit)
    // the commit record is durable — only now does the scratch stop
    // being a recovery asset: the staging sibling is swept and the
    // retired-file copy becomes this commit's time-travel history
    commit.foreach(c => retireToHistory(fsFor(spark, path), path, cts,
      c.staging))
    cts
  }

  /** [[upsertVersioned]] with ordered-payload semantics (see
    * [[upsertOrdered]]). */
  def upsertOrderedVersioned(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      precombine: String,
      partitionCols: Seq[String]): Long = {
    val cts = claimCommitId(spark, path)
    val (stats, commit) = upsertImpl(spark,
      batch.withColumn(commitCol, lit(cts)), path, keyCols, precombine,
      partitionCols, needStats = true, cts = Some(cts), ordered = true)
    recordCommit(spark, path, cts, stats, commit)
    commit.foreach(c => retireToHistory(fsFor(spark, path), path, cts,
      c.staging))
    cts
  }

  /** Versioned delete — [[delete]] recorded as a timeline event: the
    * commit metadata names the files it rewrote or removed, and the
    * retired originals move into `_graft_history/`, so [[readAsOf]]
    * can see through it and [[rollback]] can reverse a crashed one.
    * (Plain [[delete]] stays timeline-silent — q22's contract — but
    * voids time travel.) A delete commit owns no rows: `n_rows` is 0
    * in the timeline and no incremental pull ever returns it —
    * deleted rows simply stop appearing, Hudi's COW caveat. */
  def deleteVersioned(
      spark: SparkSession,
      keys: DataFrame,
      path: String,
      keyCols: Seq[String],
      partitionCols: Seq[String]): Long = {
    val cts = claimCommitId(spark, path)
    val (stats, commit) = deleteImpl(spark, keys, path, keyCols,
      partitionCols, cts = Some(cts))
    recordCommit(spark, path, cts, stats, commit)
    commit.foreach(c => retireToHistory(fsFor(spark, path), path, cts,
      c.staging))
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
    // RECORDED entries only, selected by the same strict numeric-stem
    // rule the id issuer uses (commitEntryRe): inflight markers, `.plan`
    // siblings (which carry a commit_ts and would surface as phantom
    // rows), rolled-back tombstones, AND foreign junk — even junk that
    // happens to end in .json — are all non-commits. The listing is
    // metadata-sized (one tiny file per commit), not a data scan.
    val recorded =
      if (!fs.exists(commitsDir(path))) Nil
      else fs.listStatus(commitsDir(path)).toSeq.map(_.getPath)
        .filter(_.getName match {
          case commitEntryRe(_, "json") => true
          case _ => false
        })
    if (recorded.isEmpty)
      spark.read.schema(schema).json(spark.emptyDataset(
        org.apache.spark.sql.Encoders.STRING))
    else spark.read.schema(schema).json(recorded.map(_.toString): _*)
  }

  /** Resolve a wall-clock instant to a commit id: the LATEST recorded
    * commit whose recorded `wall_ms` is ≤ `epochMs` — Hudi's
    * `as.of.instant` semantics (`glue/interactive.sh:12` pins the
    * release that accepts timestamps) on this timeline. Driver-side
    * metadata read (one tiny JSON per commit), no Spark job.
    *
    * Honesty notes, matching the [[recordCommit]] caveat: `wall_ms` is
    * the RECORDING writer's clock — multi-writer clock skew can make
    * wall-clock order disagree with commit-id order, in which case the
    * resolution still returns the max commit ID among those recorded
    * at-or-before the instant (ids are the order the engine trusts).
    * Commits recorded before this field existed carry no `wall_ms` and
    * are treated as predating every instant (they did predate the
    * feature); a table with ONLY such commits resolves to its latest
    * legacy commit rather than refusing. */
  def commitAtWallClock(spark: SparkSession, path: String,
      epochMs: Long): Long = {
    val fs = fsFor(spark, path)
    val entries =
      if (!fs.exists(commitsDir(path))) Nil
      else fs.listStatus(commitsDir(path)).toSeq.map(_.getPath)
        .filter(_.getName match {
          case commitEntryRe(_, "json") => true
          case _ => false
        })
    require(entries.nonEmpty, s"no commit timeline at $path")
    val wallRe = """"wall_ms"\s*:\s*(\d+)""".r
    val ctsRe = """"commit_ts"\s*:\s*(\d+)""".r
    val eligible = entries.flatMap { p =>
      val body = readSmallFile(fs, p)
      val cts = ctsRe.findFirstMatchIn(body).map(_.group(1).toLong)
      val wall = wallRe.findFirstMatchIn(body).map(_.group(1).toLong)
      cts.filter(_ => wall.forall(_ <= epochMs))
    }
    require(eligible.nonEmpty,
      s"no commit at $path recorded at or before epoch ms $epochMs " +
        s"(earliest recorded commit is later) — use VERSION AS OF, or a " +
        "later instant")
    eligible.max
  }

  /** Recorded wall clock (`wall_ms`) of commit `cts`, if the record
    * carries one (commits predating the field don't). Metadata read of
    * one tiny file. */
  def commitWallClock(spark: SparkSession, path: String,
      cts: Long): Option[Long] = {
    val fs = fsFor(spark, path)
    val p = new Path(commitsDir(path), f"$cts%020d.json")
    if (!fs.exists(p)) None
    else """"wall_ms"\s*:\s*(\d+)""".r
      .findFirstMatchIn(readSmallFile(fs, p)).map(_.group(1).toLong)
  }

  /** Incremental pull: rows last written by a commit AFTER `sinceTs`
    * (Hudi incremental-query semantics — deleted rows simply stop
    * appearing, as in Hudi's COW read-optimized view). Partition/stat
    * pruning applies: the stamp predicate is pushed to the scan. */
  /** Latest RECORDED commit id, driver-side (one dir listing, no Spark
    * job) — the polling primitive a streaming source's `getOffset`
    * calls every trigger. None when the table has no recorded commits.
    * Same strict numeric-stem rule as [[commits]]: inflight markers,
    * `.plan` siblings, tombstones and foreign junk never count. */
  def latestCommit(spark: SparkSession, path: String): Option[Long] = {
    val fs = fsFor(spark, path)
    val dir = commitsDir(path)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case commitEntryRe(stem, "json") => stem.toLong
    }.maxOption
  }

  def readSince(spark: SparkSession, path: String, sinceTs: Long): DataFrame =
    readTable(spark, path).filter(col(commitCol) > sinceTs)

  /** Incremental pull between two commits: rows last written by a
    * commit in (afterTs, untilTs]. */
  def readBetween(spark: SparkSession, path: String, afterTs: Long,
      untilTs: Long): DataFrame =
    readTable(spark, path)
      .filter(col(commitCol) > afterTs && col(commitCol) <= untilTs)

  // ---- time travel (Hudi `as.of.instant` analogue) ----
  // The reference pins hudi 0.10.0 (`glue/interactive.sh:12`), the
  // release that shipped time-travel queries. The engine's analogue:
  // every versioned commit RETAINS the files it superseded under
  // `_graft_history/<cts>/` (a rename of the crash-recovery copy the
  // commit already made — no extra bytes written), and the recorded
  // commit metadata already names exactly which table-relative files
  // each commit added and removed. Any past snapshot is then a pure
  // METADATA reconstruction: start from the current listing and replay
  // the recorded commits backwards. Retention is bounded by [[clean]]
  // (Hudi's cleaner); any unversioned mutation voids history (it moves
  // files without recording them), so a stale snapshot can never be
  // served silently wrong — [[readAsOf]] refuses instead.

  private def historyRoot(path: String) = new Path(path, "_graft_history")

  private[merge] def historyDir(path: String, cts: Long): Path =
    new Path(historyRoot(path), f"$cts%020d")

  /** Oldest valid `asOf` — monotonic; raised by [[clean]] (history
    * swept past it) and by unversioned mutations (history void). */
  private def floorFile(path: String) = new Path(historyRoot(path), "_floor")

  /** The oldest commit id [[readAsOf]] can still serve (0 = the full
    * recorded timeline is travelable). */
  def historyFloor(spark: SparkSession, path: String): Long = {
    val fs = fsFor(spark, path)
    val p = floorFile(path)
    if (!fs.exists(p)) 0L
    else readSmallFile(fs, p).trim.toLong
  }

  private def raiseFloor(fs: FileSystem, path: String, to: Long): Unit = {
    val p = floorFile(path)
    val cur = if (fs.exists(p)) readSmallFile(fs, p).trim.toLong else 0L
    if (to > cur) {
      fs.mkdirs(historyRoot(path))
      replaceSmallFile(fs, p, to.toString)
    }
  }

  /** Move a versioned commit's retired-file copy from the rollback
    * scratch into durable history (a rename — metadata-priced on
    * HDFS-like stores), then sweep the staging sibling. Pure-insert
    * commits retire nothing and leave no history dir. */
  private[merge] def retireToHistory(fs: FileSystem, path: String, cts: Long,
      staging: String): Unit = {
    val rb = rollbackDir(path, cts)
    if (fs.exists(rb)) {
      fs.mkdirs(historyRoot(path))
      if (!fs.rename(rb, historyDir(path, cts)))
        System.err.println(
          s"[graft.merge] WARN: failed to move retired files $rb into " +
            s"history; commit $cts is not time-travelable past")
    }
    sweepCommitScratch(fs, staging, None)
  }

  /** Unversioned mutations (plain upsert/delete, insert, bulkInsert,
    * compact, clusterZOrder) move or add files the timeline never
    * records, so NO recorded commit — not even the newest — describes
    * the table anymore. Void honestly: raise the floor PAST every
    * issued id (time travel refuses entirely until the next versioned
    * commit re-anchors the timeline) and drop the now-useless history
    * dirs. No-op on tables with no timeline (nothing to void, no floor
    * file written). */
  private[merge] def voidHistory(spark: SparkSession, path: String): Unit = {
    val fs = fsFor(spark, path)
    if (!fs.exists(commitsDir(path))) return
    val issued = listIssuedIds(spark, path)
    if (issued.isEmpty) return
    raiseFloor(fs, path, issued.max + 1)
    val root = historyRoot(path)
    // savepoint markers go too: a pin below the voided floor would be a
    // standing lie (the pinned snapshot is no longer reconstructable)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      if (st.isDirectory || st.getPath.getName.startsWith("_savepoint_"))
        fs.delete(st.getPath, true)
      ()
    }
  }

  private def savepointFile(path: String, cts: Long) =
    new Path(historyRoot(path), f"_savepoint_$cts%020d")

  /** Pin commit `cts` against [[clean]] — Hudi's savepoint: while the
    * pin exists, clean never raises the history floor past `cts`, so
    * `readAsOf(cts)` / `restoreTo(cts)` stay serviceable however small
    * the retention window gets (the disaster-recovery anchor). Requires
    * a recorded, still-travelable commit. Unversioned mutations still
    * void pins along with the history they pinned — a savepoint
    * guarantees retention, not immunity from unrecorded rewrites. */
  def savepoint(spark: SparkSession, path: String, cts: Long): Unit = {
    val fs = fsFor(spark, path)
    require(fs.exists(new Path(commitsDir(path), f"$cts%020d.json")),
      s"commit $cts is not recorded at $path — only recorded commits " +
        "can be savepointed")
    val floor = historyFloor(spark, path)
    if (cts < floor)
      throw new IllegalStateException(
        s"cannot savepoint commit $cts at $path: history floor is " +
          s"$floor — the snapshot is already gone")
    fs.mkdirs(historyRoot(path))
    writeSmallFile(fs, savepointFile(path, cts), cts.toString)
  }

  /** Release a savepoint; the next [[clean]] may sweep past it. */
  def releaseSavepoint(spark: SparkSession, path: String, cts: Long): Unit = {
    val fs = fsFor(spark, path)
    require(fs.exists(savepointFile(path, cts)),
      s"no savepoint at commit $cts for $path")
    fs.delete(savepointFile(path, cts), false)
    ()
  }

  /** The currently pinned commit ids, ascending. */
  def savepoints(spark: SparkSession, path: String): Seq[Long] = {
    val fs = fsFor(spark, path)
    val root = historyRoot(path)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.map(_.getPath.getName).collect {
      case n if n.startsWith("_savepoint_") =>
        n.stripPrefix("_savepoint_").toLong
    }.sorted
  }

  /** One recorded commit's file plan, parsed from its timeline entry. */
  private[merge] final case class RecordedCommit(
      cts: Long, added: Seq[String], removed: Seq[String])

  /** Recorded commits with id > `after`, parsed from the timeline.
    * Listing is metadata-sized; only the entries AFTER the as-of point
    * are ever read (the stems carry the id), so a deep timeline costs
    * nothing to travel near its head. */
  private[merge] def recordedCommitsAfter(spark: SparkSession, path: String,
      after: Long): Seq[RecordedCommit] = {
    val fs = fsFor(spark, path)
    val dir = commitsDir(path)
    if (!fs.exists(dir)) return Nil
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    fs.listStatus(dir).toSeq.map(_.getPath).flatMap { p =>
      p.getName match {
        case commitEntryRe(id, "json") if id.toLong > after =>
          val j = org.json4s.jackson.JsonMethods.parse(readSmallFile(fs, p))
          Some(RecordedCommit(id.toLong,
            (j \ "files_added").extractOrElse[Seq[String]](Nil),
            (j \ "files_removed").extractOrElse[Seq[String]](Nil)))
        case _ => None
      }
    }.sortBy(_.cts)
  }

  /** Time-travel read: the table exactly as of commit `asOf` (the
    * state AFTER that commit landed). Pure metadata reconstruction —
    * the current file listing, minus files later commits added, plus
    * files later commits retired into `_graft_history/` — then one
    * parquet read over the resulting file set (partition values
    * recovered from the hive layout of each file's resident base, so
    * partition pruning still applies). Rows carry their original
    * `_commit_ts` stamps (all ≤ `asOf`).
    *
    * Served with the CURRENT recorded schema: files written before an
    * additive evolution read back null-filled, exactly like a current
    * read of the same files (Hudi time travel reads through the latest
    * schema the same way).
    *
    * Fails loudly — never serves a wrong snapshot — when `asOf`
    * predates [[historyFloor]] (history cleaned past it, or voided by
    * an unversioned mutation). */
  def readAsOf(spark: SparkSession, path: String, asOf: Long): DataFrame = {
    require(!MorTable.isMor(spark, path),
      s"$path is a MERGE_ON_READ table — use MorTable.readAsOf (the " +
        "snapshot must merge base AND delta files at the as-of point)")
    snapshotAt(spark, path, asOf)
  }

  /** Replay the recorded file movements backwards from `initial`
    * (table-relative paths) to the state as of `asOf`: rel path → None
    * (resident in the table) | Some(c) (retired by commit c, resident
    * in its history dir). Shared by COW time travel and the MOR
    * delta-namespace replay — each caller supplies its namespace's
    * current listing and ignores map entries outside it (a MOR
    * compaction commit records base AND delta retirements in one
    * removed list). */
  private[merge] def replayFileMap(spark: SparkSession, path: String,
      asOf: Long, initial: Seq[String]): Map[String, Option[Long]] = {
    var files: Map[String, Option[Long]] =
      initial.map(_ -> (None: Option[Long])).toMap
    recordedCommitsAfter(spark, path, asOf).sortBy(-_.cts).foreach { c =>
      files = files -- c.added
      files ++= c.removed.map(_ -> (Some(c.cts): Option[Long]))
    }
    files
  }

  private[merge] def requireAboveFloor(spark: SparkSession, path: String,
      asOf: Long): Unit = {
    require(asOf >= 0, s"asOf must be >= 0, got $asOf")
    val floor = historyFloor(spark, path)
    if (asOf < floor)
      throw new IllegalStateException(
        s"cannot time-travel to commit $asOf at $path: history floor is " +
          s"$floor (older snapshots were cleaned, or voided by an " +
          "unversioned mutation — plain upsert/delete/insert/compact/" +
          "clusterZOrder do not record file movements)")
  }

  /** The COW snapshot reconstruction (no MOR guard): ROOT-namespace
    * files only — `_`-prefixed dirs are skipped by the listing, and
    * any `_graft_deltas/` entries a MOR compaction's removed list
    * re-introduces are filtered back out, so on a MOR table this is
    * exactly the BASE at `asOf` (MorTable.readAsOf merges the delta
    * side on top). */
  private[merge] def snapshotAt(spark: SparkSession, path: String,
      asOf: Long): DataFrame = {
    requireAboveFloor(spark, path, asOf)
    val fs = fsFor(spark, path)
    val tableRoot = fs.makeQualified(new Path(path))
    // replay backwards: location = None → resident in the table,
    // Some(c) → retired by commit c, resident in its history dir
    val files = replayFileMap(spark, path, asOf,
      listDataFiles(fs, tableRoot).map(relativize(tableRoot, _)))
      .filter { case (rel, _) => !rel.startsWith("_") }
    val schema = readSchemaMeta(spark, path).getOrElse(
      readTable(spark, path).schema)
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // one read per resident base (table + each contributing history
    // dir): basePath recovers the partition column from the preserved
    // hive layout; explicit schema, no footer reads
    val groups = files.toSeq.groupBy(_._2).toSeq.sortBy(_._1.getOrElse(-1L))
    groups.map { case (loc, fs2) =>
      val base = loc match {
        case None => tableRoot
        case Some(c) =>
          val h = historyDir(path, c)
          if (!fs.exists(h))
            throw new IllegalStateException(
              s"cannot time-travel to commit $asOf at $path: commit $c's " +
                s"retired files are missing from $h (history damaged — " +
                "was the directory removed manually?)")
          fs.makeQualified(h)
      }
      spark.read.schema(schema).option("basePath", base.toString)
        .parquet(fs2.map { case (rel, _) => new Path(base, rel).toString }: _*)
    }.reduce(_.unionByName(_))
  }

  /** Change-data-capture read: every row-level change applied by the
    * recorded commits in (afterTs, untilTs] — the Delta-CDF / Hudi
    * incremental-with-deletes shape, recovered purely from commit
    * metadata and the COW history, with NO change files written at
    * commit time and NO snapshot diffing at read time. Each commit's
    * changes derive from just the files it touched: post-images are the
    * rows in its added files stamped with its own commit id
    * (carried-over rows keep their older stamps, so the stamp filter
    * drops them at the scan), pre-images are the rows in the files it
    * retired to `_graft_history/<cts>/`. Joining the two on `keyCols`
    * classifies everything: post∖pre = insert, post∩pre = update
    * (pre- and post-image rows emitted), pre∖postAll = delete (postAll
    * = every row in the added files, so carried-over keys are not
    * mistaken for deletes). Cost scales with the commits' touched file
    * groups, never with table size.
    *
    * `keyCols` must be the FULL identifying key — for partition-scoped
    * keys (the [[upsert]] default) pass keyCols ++ partitionCols.
    *
    * Output = the table's columns (minus the `_commit_ts` stamp) plus
    * `_change_type` ∈ insert | update_preimage | update_postimage |
    * delete and `_change_commit` = the commit that applied the change;
    * deletes and update pre-images carry the pre-change payload.
    *
    * Like [[readAsOf]], requires `afterTs >= historyFloor` and refuses
    * rather than serving incomplete changes when history was cleaned or
    * voided by an unversioned mutation. [[readSince]] stays the cheap
    * path when deletes and pre-images don't matter. */
  def readChanges(spark: SparkSession, path: String, afterTs: Long,
      untilTs: Long, keyCols: Seq[String]): DataFrame = {
    require(!MorTable.isMor(spark, path),
      s"$path is a MERGE_ON_READ table — change capture is not " +
        "supported on MOR (a delta commit's rows are merge inputs, not " +
        "post-images; compact to fold deltas into base first)")
    require(afterTs >= 0 && untilTs > afterTs,
      s"need untilTs > afterTs >= 0, got ($afterTs, $untilTs]")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val floor = historyFloor(spark, path)
    if (afterTs < floor)
      throw new IllegalStateException(
        s"cannot read changes after commit $afterTs at $path: history " +
          s"floor is $floor (older pre-images were cleaned, or voided " +
          "by an unversioned mutation — see readAsOf)")
    val fs = fsFor(spark, path)
    val tableRoot = fs.makeQualified(new Path(path))
    val all = recordedCommitsAfter(spark, path, afterTs)
    val inRange = all.filter(_.cts <= untilTs)
    val schema = readSchemaMeta(spark, path).getOrElse(
      readTable(spark, path).schema)
    val payloadCols = schema.fields.map(_.name).filterNot(_ == commitCol)
    keyCols.foreach(k => require(payloadCols.contains(k),
      s"key column $k not in table schema ${payloadCols.mkString(",")}"))
    // where does each in-range added file live NOW? resident in the
    // table unless a later recorded commit retired it into its history
    // dir (that later commit is > afterTs, so floor guarantees its
    // history is still present)
    val retiredBy: Map[String, Long] =
      all.flatMap(c => c.removed.map(_ -> c.cts)).toMap
    def histDirChecked(c: Long): Path = {
      val h = historyDir(path, c)
      if (!fs.exists(h))
        throw new IllegalStateException(
          s"cannot read changes at $path: commit $c's retired files " +
            s"are missing from $h (history damaged — was the " +
            "directory removed manually?)")
      fs.makeQualified(h)
    }
    def readRels(rels: Seq[String], locate: String => Path): DataFrame =
      if (rels.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else rels.groupBy(locate).toSeq.sortBy(_._1.toString)
        .map { case (base, group) =>
          spark.read.schema(schema).option("basePath", base.toString)
            .parquet(group.map(r => new Path(base, r).toString): _*)
        }.reduce(_.unionByName(_))
    val perCommit = inRange.map { c =>
      val postAll = readRels(c.added, rel =>
        retiredBy.get(rel) match {
          case Some(later) if later > c.cts => histDirChecked(later)
          case _ => tableRoot
        })
      val pre = readRels(c.removed, _ => histDirChecked(c.cts))
      val post = postAll.filter(col(commitCol) === c.cts)
      val inserts = post.join(pre, keyCols, "left_anti")
        .withColumn("_change_type", lit("insert"))
      val updPost = post.join(pre, keyCols, "left_semi")
        .withColumn("_change_type", lit("update_postimage"))
      val updPre = pre.join(post, keyCols, "left_semi")
        .withColumn("_change_type", lit("update_preimage"))
      val deletes = pre.join(postAll, keyCols, "left_anti")
        .withColumn("_change_type", lit("delete"))
      inserts.unionByName(updPost).unionByName(updPre).unionByName(deletes)
        .withColumn("_change_commit", lit(c.cts))
    }
    val out =
      if (perCommit.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          .withColumn("_change_type", lit(""))
          .withColumn("_change_commit", lit(0L))
          .limit(0)
      else perCommit.reduce(_.unionByName(_))
    out.select(payloadCols.map(col) :+ col("_change_type") :+
      col("_change_commit"): _*)
  }

  /** Snapshot diff between two recorded commits: one row per key whose
    * STATE differs at `toTs` vs `fromTs`, classified `insert` (absent →
    * present), `delete` (present → absent) or `update` (present at
    * both with any payload column changed). The anti-entropy primitive:
    * audit what a window of commits net-changed, reconcile a replica,
    * or review a backfill before publishing downstream.
    *
    * STATE-based, not event-based: a key deleted then re-inserted with
    * identical values nets to NO row here (its state is equal), while
    * [[readChanges]] reports both events — the two views agree on net
    * effect by construction (`TimeTravelSpec` pins this against the CDC
    * stream). `keyCols` must be the full identifying key, as in
    * [[readChanges]]. Across additive schema evolution the older
    * snapshot is null-aligned to the newer schema, so a value appearing
    * in an evolved column reads as `update` — the honest answer.
    *
    * Scale shape: both snapshots are plan-time file selections
    * ([[readAsOf]] — no data copied), and the diff is ONE full-outer
    * shuffle on the key struct; payload comparison rides the same
    * exchange as a null-safe struct equality, so cost is the two
    * snapshot scans plus one key-sized join regardless of how many
    * commits separate the snapshots. */
  def diffSnapshots(spark: SparkSession, path: String, fromTs: Long,
      toTs: Long, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(fromTs <= toTs, s"need fromTs <= toTs, got ($fromTs, $toTs)")
    val a0 = readAsOf(spark, path, fromTs).drop(commitCol)
    val b0 = readAsOf(spark, path, toTs).drop(commitCol)
    keyCols.foreach(c => require(b0.columns.contains(c),
      s"key column $c not present in the table at $path"))
    // additive evolution: align the older snapshot to the newer schema
    // (missing columns read null, so evolved values surface as updates)
    val a1 = alignTo(a0, b0.schema.map(f => f.name -> f.dataType))
    val valCols = b0.columns.filterNot(keyCols.contains).toSeq
    val left = a1.select(struct(keyCols.map(col): _*).as("_ka"),
      struct(valCols.map(col): _*).as("_va"))
    val right = b0.select(struct(keyCols.map(col): _*).as("_kb"),
      struct(valCols.map(col): _*).as("_vb"))
    left.join(right, col("_ka") <=> col("_kb"), "full_outer")
      .withColumn("change",
        when(col("_ka").isNull, "insert")
          .when(col("_kb").isNull, "delete")
          .when(!(col("_va") <=> col("_vb")), "update"))
      .filter(col("change").isNotNull)
      .withColumn("_k", coalesce(col("_ka"), col("_kb")))
      .select(keyCols.map(c => col(s"_k.$c").as(c)) :+ col("change"): _*)
  }

  /** Physical revert to the state as of commit `toTs` — Hudi's
    * savepoint-restore. Walks the recorded commits after `toTs` newest
    * first, un-publishing each one's added files, restoring its retired
    * files from `_graft_history/`, and tombstoning its id
    * (`.rolledback` — issued ids are never reissued, even reverted
    * ones). Unlike [[rollback]], which refuses recorded commits, this
    * IS the operator that deletes durable history: incremental
    * consumers that already read the reverted commits must themselves
    * be reset (exactly Hudi's restore caveat — their checkpoints point
    * at commits that no longer exist). The recorded schema is left as
    * is: columns added by reverted commits stay declared and read back
    * null-filled (additive evolution never retracts).
    *
    * Requires the whole revert range to be reconstructable
    * (`toTs >= historyFloor`, every reverted commit's history present)
    * and QUIESCED: an inflight commit after `toTs` must be
    * [[rollback]]ed first. Validates both before touching any file.
    * Idempotent across its own crash windows — every step checks
    * before acting, so a restore that dies midway can be re-run. */
  def restoreTo(spark: SparkSession, path: String, toTs: Long): Unit = {
    val floor = historyFloor(spark, path)
    if (toTs < floor)
      throw new IllegalStateException(
        s"cannot restore $path to commit $toTs: history floor is $floor " +
          "(see readAsOf — the revert range is no longer reconstructable)")
    val fs = fsFor(spark, path)
    val tableRoot = fs.makeQualified(new Path(path))
    val later = recordedCommitsAfter(spark, path, toTs).sortBy(-_.cts)
    // pre-validate the WHOLE range before any mutation: missing history
    // or a still-inflight commit must abort a zero-file-touched restore
    later.filter(_.removed.nonEmpty).foreach { c =>
      if (!fs.exists(historyDir(path, c.cts)))
        throw new IllegalStateException(
          s"cannot restore $path to commit $toTs: commit ${c.cts}'s " +
            s"retired files are missing from ${historyDir(path, c.cts)}")
    }
    listIssuedIds(spark, path).filter(_ > toTs).foreach { id =>
      if (fs.exists(inflightMarker(path, id)))
        throw new IllegalStateException(
          s"cannot restore $path to commit $toTs: commit $id is still " +
            s"inflight — rollback(path, $id) it first")
    }
    later.foreach { c =>
      c.added.foreach { rel =>
        val p = new Path(tableRoot, rel)
        if (fs.exists(p) && !fs.delete(p, false))
          throw new java.io.IOException(s"restore: failed to un-publish $p")
      }
      val h = historyDir(path, c.cts)
      c.removed.foreach { rel =>
        val src = new Path(h, rel) // absent = already restored (re-run)
        if (fs.exists(src)) {
          val dest = new Path(tableRoot, rel)
          fs.mkdirs(dest.getParent)
          if (!fs.rename(src, dest))
            throw new java.io.IOException(s"restore: failed to restore $dest")
        }
      }
      c.added.foreach { rel =>
        dropEmptiedDirs(fs, new Path(tableRoot, rel).getParent,
          rel.count(_ == '/'))
      }
      // the reverted commit's index entry points at files just removed
      KeyIndex.dropEntry(spark, path, c.cts)
      // tombstone BEFORE dropping the record: the id stays issued
      // through every crash window (same order rollback uses)
      writeSmallFile(fs,
        new Path(commitsDir(path), f"${c.cts}%020d.rolledback"), "")
      fs.delete(new Path(commitsDir(path), f"${c.cts}%020d.json"), false)
      if (fs.exists(h)) fs.delete(h, true) // drained above; drop the husk
    }
  }

  /** The cleaner (Hudi's `hoodie.cleaner.commits.retained` analogue):
    * keep the retired-file history of the most recent `retainLast`
    * recorded commits, sweep everything older, and raise the floor so
    * [[readAsOf]] refuses what it can no longer serve. Bounds history
    * growth: without cleaning, a COW table's history holds every
    * superseded file version ever written. Returns the number of
    * history dirs removed. */
  def clean(spark: SparkSession, path: String, retainLast: Int): Long = {
    require(retainLast >= 1, "retainLast must be >= 1")
    val fs = fsFor(spark, path)
    val dir = commitsDir(path)
    if (!fs.exists(dir)) return 0L
    val recorded = fs.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case commitEntryRe(id, "json") => id.toLong
    }.sorted
    if (recorded.size <= retainLast) return 0L
    // a savepoint caps the floor: clean retains AT LEAST the retention
    // window, and never sweeps a pinned snapshot
    val byRetention = recorded(recorded.size - retainLast - 1)
    val pinned = savepoints(spark, path)
    val floor =
      if (pinned.isEmpty) byRetention else math.min(byRetention, pinned.min)
    raiseFloor(fs, path, floor)
    val root = historyRoot(path)
    if (!fs.exists(root)) return 0L
    fs.listStatus(root).toSeq.count { st =>
      st.isDirectory && st.getPath.getName.forall(_.isDigit) &&
        st.getPath.getName.toLong <= floor && fs.delete(st.getPath, true)
    }.toLong
  }

  // ---- query inventory ----

  type Q = (SparkSession, String) => DataFrame

  private val scratchDirs = scala.collection.mutable.ArrayBuffer[String]()

  /** Scratch table location for a replay query — registered for removal
    * at JVM exit (a bench process runs each replay three times; without
    * the sweep every run leaves a table-sized temp dir behind). Not
    * removed eagerly: the returned DataFrame's lineage reads the dir. */
  private[graft] def scratchTable(prefix: String): String = {
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
  /** Run `body` with AQE's post-shuffle partition coalescing OFF,
    * restoring the session value after. The compaction driver keys
    * (x12/x12w) use this around their SETUP commits: their subject is
    * the table service over a task-fragmented small-file layout — the
    * shape a high-parallelism production writer leaves — and the
    * session's coalescing writer (see [[graft.SessionTuning]]) would
    * otherwise land commits in one right-sized file per partition,
    * leaving `require(n > 0)` nothing to compact. Layout-only: the
    * committed ROWS are identical either way (both keys' oracles are
    * unchanged). */
  private[graft] def fragmented[T](spark: SparkSession)(body: => T): T = {
    val k = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  private[graft] def replayBatch(spark: SparkSession, dir: String, b: Int,
      keyMod: Int = 500): DataFrame =
    graft.Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 7 === b)
      .select(
        (col("o_orderkey") % keyMod).as("okey"),
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
    // q18w: the q18 replay over a WIDE key space (okey % 50000). At
    // driver scale it re-checks the same algebra; its reason to exist
    // is the 10x sf1 artifact, where the %500 scenario saturates (the
    // dense 1.5M-key data packs ~300 orders per (okey, part), the %3
    // delete covers every pair and the final table is EMPTY — 0 ≡ 0
    // proved nothing about upsert/delete at scale). Survivor density
    // here is scale-stable, so the sf1 row is real evidence.
    "q18w_upsert_replay_wide" -> ((s, dir) => {
      val path = scratchTable("graft_q18w_")
      val keyCols = Seq("okey")
      upsert(s, replayBatch(s, dir, 0, 50000), path, keyCols, "pre", "part")
      upsert(s, replayBatch(s, dir, 1, 50000), path, keyCols, "pre", "part")
      delete(s, replayBatch(s, dir, 0, 50000).filter(col("pre") % 3 === 0)
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
    // per partition must still hash-match the same relational oracle.
    // WIDE key space (okey % 50000, the q18w recipe): dense %500 keys
    // saturate at sf1 (the %3 delete covers every (okey, part) pair and
    // the compacted table is EMPTY — 0 ≡ 0 proves nothing about
    // compaction at 10x). Dense-key compaction stays covered by q28 and
    // the Merge/MorTable specs; this key's law needs survivors.
    "q23_compact" -> ((s, dir) => {
      val path = scratchTable("graft_q23_")
      val keyCols = Seq("okey")
      upsert(s, replayBatch(s, dir, 0, 50000), path, keyCols, "pre", "part")
      upsert(s, replayBatch(s, dir, 1, 50000), path, keyCols, "pre", "part")
      delete(s, replayBatch(s, dir, 0, 50000).filter(col("pre") % 3 === 0)
        .select("okey", "part"), path, keyCols, "part")
      compact(s, path, "part", keyCols)
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // x34: q23's compaction scenario driven through SQL — the
    // graft_compact('<path>') table-function procedure (partition/key
    // columns derived from the recorded key spec, no arguments beyond
    // the table). The key returns the table CONTENT after the SQL
    // compaction, sharing q23's WIDE replay oracle (okey % 50000 —
    // non-vacuous at sf1, see q23): the procedure must be
    // content-invariant; its stats row is spec-asserted.
    "x34_sql_compact" -> ((s, dir) => {
      val path = scratchTable("graft_x34_")
      val keyCols = Seq("okey")
      upsert(s, replayBatch(s, dir, 0, 50000), path, keyCols, "pre", "part")
      upsert(s, replayBatch(s, dir, 1, 50000), path, keyCols, "pre", "part")
      delete(s, replayBatch(s, dir, 0, 50000).filter(col("pre") % 3 === 0)
        .select("okey", "part"), path, keyCols, "part")
      s.sql(s"SELECT * FROM graft_compact('$path')").collect()
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // x35: x26's retention scenario driven through SQL — the
    // graft_clean('<path>', retain_last) procedure. Cleaning sweeps
    // only reconstruction history; the CURRENT state must be
    // untouched, so the key shares x26's batch-wins replay oracle.
    // x47: the read-only integrity report over a healthy versioned
    // replay — every check row is pinned by the oracle, and the
    // footer_row_count detail is cross-checked against the RELATIONAL
    // count of the same replay (footer sum == count(*), the x40 law
    // restated through the fsck surface). Corruption detection (leaks,
    // inflight residue, unrecorded deltas, dangling savepoints) is
    // spec-asserted in GraftSqlSpec, where file-level seeding is
    // observable.
    "x47_sql_fsck" -> ((s, dir) => {
      val path = scratchTable("graft_x47_")
      val keyCols = Seq("okey")
      upsertVersioned(s, replayBatch(s, dir, 0, 50000), path, keyCols,
        "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1, 50000), path, keyCols,
        "pre", "part")
      deleteVersioned(s, replayBatch(s, dir, 0, 50000)
        .filter(col("pre") % 3 === 0).select("okey", "part"),
        path, keyCols, Seq("part"))
      s.sql(s"SELECT * FROM graft_fsck('$path') ORDER BY check_name")
    }),
    "x35_sql_clean" -> ((s, dir) => {
      val path = scratchTable("graft_x35_")
      val keyCols = Seq("okey")
      upsertVersioned(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1), path, keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 2), path, keyCols, "pre", "part")
      s.sql(s"SELECT * FROM graft_clean('$path', 1)").collect()
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // x36: q24's z-order layout rewrite driven through SQL — the
    // graft_zorder('<path>', 'pk,sk') procedure (partition columns
    // from the recorded key spec, interleave columns named in the
    // call). Content-invariant by the q24 law, so the oracle is the
    // untouched relation.
    "x36_sql_zorder" -> ((s, dir) => {
      val path = scratchTable("graft_x36_")
      val rows = graft.Tables.lineitem(s, dir).select(
        col("l_orderkey").as("okey"), col("l_linenumber").as("lnum"),
        col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
        col("l_quantity").as("qty"), col("l_returnflag").as("part"))
      bulkInsert(rows, path, "part", keyCols = Seq("pk", "sk"),
        targetFileBytes = 1L << 20)
      s.sql(s"SELECT * FROM graft_zorder('$path', 'pk,sk', ${1L << 20})")
        .collect()
      readTable(s, path)
        .select("okey", "lnum", "pk", "sk", "qty", "part")
        .orderBy("okey", "lnum", "pk", "sk", "qty", "part")
    }),
    // x37: q26's disaster-recovery revert driven entirely through SQL —
    // savepoint the two-batch commit, CLEAN past it (the pin must cap
    // the floor; without it retention would sweep the revert range and
    // the restore would refuse), then physically restore. The plain
    // read of the reverted table shares q26's oracle: the two-batch
    // merge state, as if the delete and third upsert never happened.
    "x37_sql_restore" -> ((s, dir) => {
      val path = scratchTable("graft_x37_")
      val keyCols = Seq("okey")
      upsertVersioned(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      val c2 = upsertVersioned(s, replayBatch(s, dir, 1), path,
        keyCols, "pre", "part")
      deleteVersioned(s, replayBatch(s, dir, 0)
        .filter(col("pre") % 3 === 0).select("okey", "part"),
        path, keyCols, Seq("part"))
      upsertVersioned(s, replayBatch(s, dir, 2), path, keyCols, "pre", "part")
      s.sql(s"SELECT * FROM graft_savepoint('$path', $c2)").collect()
      s.sql(s"SELECT * FROM graft_clean('$path', 1)").collect()
      s.sql(s"SELECT * FROM graft_restore('$path', $c2)").collect()
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // x40: exact count(*) answered from parquet FOOTER metadata alone
    // (graft_count — zero data IO; at 100 TB the metadata-priced
    // answer to the most common analyst question). The wide replay
    // (two upserts + a delete, so live files reflect rewrites) must
    // produce the same count the oracle computes relationally — the
    // proof that a COW table's footer sum IS its row count.
    // x41: ANALYZE-grade per-column statistics from parquet FOOTER
    // metadata alone (graft_stats — zero data IO). The table carries an
    // injected-null column so the null count is non-vacuous, and asks
    // for one column of each class: a data long (okey), a nullable data
    // long (sk), and the hive partition column (part, answered from
    // directory values). The oracle computes the identical five
    // aggregates relationally — the proof that footer stats ARE the
    // table's stats on a COW layout.
    "x41_sql_stats" -> ((s, dir) => {
      val path = scratchTable("graft_x41_")
      val rows = graft.Tables.lineitem(s, dir).select(
        col("l_orderkey").as("okey"), col("l_linenumber").as("lnum"),
        when(col("l_orderkey") % 11 === 0, lit(null).cast("long"))
          .otherwise(col("l_suppkey")).as("sk"),
        col("l_returnflag").as("part"))
      bulkInsert(rows, path, "part", keyCols = Seq("okey", "lnum"),
        targetFileBytes = 1L << 20)
      s.sql(s"SELECT * FROM graft_stats('$path', 'okey,sk,part')")
        .orderBy("column")
    }),
    "x40_sql_count" -> ((s, dir) => {
      val path = scratchTable("graft_x40_")
      val keyCols = Seq("okey")
      upsert(s, replayBatch(s, dir, 0, 50000), path, keyCols, "pre", "part")
      upsert(s, replayBatch(s, dir, 1, 50000), path, keyCols, "pre", "part")
      delete(s, replayBatch(s, dir, 0, 50000).filter(col("pre") % 3 === 0)
        .select("okey", "part"), path, keyCols, "part")
      s.sql(s"SELECT n_rows FROM graft_count('$path')")
    }),
    // x39: q25's time travel driven through SQL WITHOUT catalog
    // registration — graft_snapshot('<path>', commit_ts), the
    // path-based complement of VERSION AS OF. Shares q25's oracle:
    // the as-of read must reconstruct the two-batch snapshot past the
    // versioned delete and the third upsert.
    "x39_sql_snapshot" -> ((s, dir) => {
      val path = scratchTable("graft_x39_")
      val keyCols = Seq("okey")
      upsertVersioned(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      val c2 = upsertVersioned(s, replayBatch(s, dir, 1), path,
        keyCols, "pre", "part")
      deleteVersioned(s, replayBatch(s, dir, 0)
        .filter(col("pre") % 3 === 0).select("okey", "part"),
        path, keyCols, Seq("part"))
      upsertVersioned(s, replayBatch(s, dir, 2), path, keyCols, "pre", "part")
      s.sql(
        s"""SELECT okey, part, price, pre
           |FROM graft_snapshot('$path', $c2)
           |ORDER BY part, okey""".stripMargin)
    }),
    // x38: the staging-leak sweep driven through SQL — the q18w replay
    // plus a manufactured recovery-copy leak (the table-sized sibling a
    // crashed commit leaves), swept by graft_vacuum. Content-invariant
    // by construction (vacuum touches only non-table siblings), so the
    // key shares the WIDE replay oracle (survivor density scale-stable,
    // keeping the sf1 row non-vacuous); the sweep itself and the stats
    // row are spec-asserted where file-level effects are observable.
    "x38_sql_vacuum" -> ((s, dir) => {
      val path = scratchTable("graft_x38_")
      val keyCols = Seq("okey")
      upsert(s, replayBatch(s, dir, 0, 50000), path, keyCols, "pre", "part")
      upsert(s, replayBatch(s, dir, 1, 50000), path, keyCols, "pre", "part")
      delete(s, replayBatch(s, dir, 0, 50000).filter(col("pre") % 3 === 0)
        .select("okey", "part"), path, keyCols, "part")
      val fs = fsFor(s, path)
      val t = new Path(path.stripSuffix("/"))
      val leaked = new Path(t.getParent, s"${t.getName}_staging_999")
      fs.mkdirs(leaked)
      writeSmallFile(fs, new Path(leaked, "part-junk.parquet"), "leak")
      s.sql(s"SELECT * FROM graft_vacuum('$path')").collect()
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // q24: z-order clustering is a pure LAYOUT service — the oracle is
    // the untouched relation (content invariance, the same contract
    // q23 checks for compact). The pruning benefit itself is asserted
    // in MergeSpec, where file-level effects are observable.
    "q24_zorder" -> ((s, dir) => {
      val path = scratchTable("graft_q24_")
      val rows = graft.Tables.lineitem(s, dir).select(
        col("l_orderkey").as("okey"), col("l_linenumber").as("lnum"),
        col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
        col("l_quantity").as("qty"), col("l_returnflag").as("part"))
      bulkInsert(rows, path, "part", keyCols = Seq("pk", "sk"),
        targetFileBytes = 1L << 20)
      clusterZOrder(s, path, Seq("part"), Seq("pk", "sk"),
        targetFileBytes = 1L << 20)
      readTable(s, path)
        .select("okey", "lnum", "pk", "sk", "qty", "part")
        .orderBy("okey", "lnum", "pk", "sk", "qty", "part")
    }),
    // q37: conditional merge end-to-end — batch 1 merged into the
    // batch-0 base with all three clauses live: matched sources with
    // pre%5=0 delete their target, the rest update only when the
    // incoming price beats the stored one (a source+target condition),
    // and not-matched sources insert only even keys. The oracle
    // recomputes the same three-way split relationally.
    "q37_merge_conditional" -> ((s, dir) => {
      val path = scratchTable("graft_q37_")
      upsert(s, replayBatch(s, dir, 0), path, Seq("okey"), "pre", "part")
      mergeInto(s, replayBatch(s, dir, 1), path, Seq("okey"), "pre",
        Seq("part"),
        whenMatchedDelete = Some(col("s.pre") % 5 === 0),
        whenMatchedUpdate = Some(col("s.price") > col("t.price")),
        whenNotMatchedInsert = Some(col("s.okey") % 2 === 0))
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // q36: footer-stats file skipping end-to-end — a key-range read
    // over a range-laid-out table must equal the plain relational
    // filter (the oracle), with the pruning itself asserted at file
    // level in StatsPruningSpec. bulkInsert's repartitionByRange gives
    // each file a tight okey range, so the BETWEEN scan schedules only
    // the overlapping files.
    "q36_stats_skipping" -> ((s, dir) => {
      val path = scratchTable("graft_q36_")
      val rows = graft.Tables.lineitem(s, dir).select(
        col("l_orderkey").as("okey"), col("l_linenumber").as("lnum"),
        col("l_quantity").as("qty"), col("l_extendedprice").as("price"),
        col("l_returnflag").as("part"))
      bulkInsert(rows, path, "part", keyCols = Seq("okey"),
        targetFileBytes = 256L << 10)
      StatsPruning.readPruned(s, path, "okey", 1000L, 5000L)
        .select("okey", "lnum", "qty", "price", "part")
        .orderBy("okey", "lnum", "qty", "price", "part")
    }),
    // x02: the file-level key index end-to-end — the q18 replay plus a
    // compaction (which folds the index log and re-indexes every file)
    // and a post-compaction upsert whose matched-file discovery runs
    // through bloom candidate pruning (a TABLE-SCOPED 0/0 gate policy
    // forces build+probe even at toy file counts, without touching the
    // JVM-wide defaults any concurrent merge would observe). The
    // oracle recomputes the same algebra relationally — index pruning
    // must be result-invisible.
    "x02_indexed_upsert" -> ((s, dir) => {
      val path = scratchTable("graft_x02_")
      val keyCols = Seq("okey")
      KeyIndex.setProbeGates(s, path, 0, 0L)
      upsert(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      upsert(s, replayBatch(s, dir, 1), path, keyCols, "pre", "part")
      delete(s, replayBatch(s, dir, 0).filter(col("pre") % 3 === 0)
        .select("okey", "part"), path, keyCols, "part")
      compact(s, path, "part", keyCols)
      upsert(s, replayBatch(s, dir, 2), path, keyCols, "pre", "part")
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // x03: streaming incremental pull — three versioned upserts, then
    // the commit-record stream drained AvailableNow into a parquet
    // sink. Batch boundaries can't change the union (each micro-batch
    // pulls exactly the rows its commit ids own at read time), so the
    // sink equals the stamped table state however the file source
    // groups the commit records; the oracle recomputes that state
    // relationally.
    "x03_incremental_stream" -> ((s, dir) => {
      val path = scratchTable("graft_x03_")
      val keyCols = Seq("okey")
      upsertVersioned(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1), path, keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 2), path, keyCols, "pre", "part")
      val sink = scratchTable("graft_x03sink_")
      val q = IncrementalStream.foreachIncrement(s, path,
        scratchTable("graft_x03ckpt_")) { (inc, _, _) =>
        inc.write.mode("append").parquet(sink)
      }
      q.awaitTermination()
      s.read.parquet(sink)
        .select(col("okey"), col("part"), col("price"), col("pre"),
          col(commitCol).as("commit_ts"))
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
    }),
    // x24: the same timeline read through the SESSION PARSER as a SQL
    // table function — SELECT * FROM graft_commits('<path>') (Delta
    // DESCRIBE HISTORY / Hudi show_commits shape, injected by
    // GraftExtensions). Identical replay to q22, so it shares q22's
    // oracle: the SQL surface must see exactly the API's timeline.
    // x27: BULK INSERT end-to-end — the initial-load op (Hudi
    // bulk_insert): range-laid target-size files, NO precombine dedup
    // (the batch lands verbatim, duplicates included — the documented
    // contract difference from upsert), read back identical to the
    // input relation. The file-size layout itself stays pinned in
    // MergeSpec; this driver key pins the CONTENT contract.
    "x27_bulk_insert" -> ((s, dir) => {
      val path = scratchTable("graft_x27_")
      bulkInsert(replayBatch(s, dir, 0), path, Seq("part"), Seq("okey"),
        targetFileBytes = 64L * 1024, maxFiles = 64)
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey", "pre")
    }),
    // x26: the CLEANER exercised end-to-end — three versioned upserts,
    // then clean(retainLast = 1) sweeps the older commits' history.
    // Contract under oracle: cleaning reclaims HISTORY bytes only; the
    // current state must be bit-identical to the uncleaned replay (the
    // refusal semantics for as-of reads below the floor stay pinned in
    // TimeTravelSpec).
    // x28: write-audit-publish — the clean batches publish, the
    // poisoned batch stages, fails its snapshot audit and is rolled
    // back; the final table must equal the relational replay of ONLY
    // the published batches, and the post-rollback publish proves the
    // restored timeline keeps accepting commits
    "x28_wap" -> ((s, dir) => {
      import graft.pipeline.{Expectations, Wap}
      import Expectations.Expectation
      val path = scratchTable("graft_x28_")
      val keyCols = Seq("okey")
      val rules = Seq(
        Expectation("price_nonneg", col("price") >= 0),
        Expectation("key_present", col("okey").isNotNull))
      upsertVersioned(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      val r1 = Wap.writeAuditPublish(s, replayBatch(s, dir, 1), path,
        keyCols, "pre", Seq("part"), rules)
      require(r1.published, "clean batch 1 must publish")
      val dirty = replayBatch(s, dir, 2)
        .withColumn("price", -abs(col("price")))
      val r2 = Wap.writeAuditPublish(s, dirty, path,
        keyCols, "pre", Seq("part"), rules)
      require(!r2.published, "poisoned batch must be rolled back")
      val r3 = Wap.writeAuditPublish(s, replayBatch(s, dir, 3), path,
        keyCols, "pre", Seq("part"), rules)
      require(r3.published, "post-rollback clean batch must publish")
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    "x26_clean_retention" -> ((s, dir) => {
      val path = scratchTable("graft_x26_")
      val keyCols = Seq("okey")
      upsertVersioned(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1), path, keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 2), path, keyCols, "pre", "part")
      clean(s, path, retainLast = 1)
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    "x24_sql_commits" -> ((s, dir) => {
      val path = scratchTable("graft_x24_")
      val keyCols = Seq("okey")
      val c1 = upsertVersioned(s, replayBatch(s, dir, 0), path,
        keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1), path,
        keyCols, "pre", "part")
      delete(s, readSince(s, path, c1).select("okey", "part"),
        path, keyCols, "part")
      upsertVersioned(s, replayBatch(s, dir, 2), path,
        keyCols, "pre", "part")
      s.sql(
        s"SELECT * FROM graft_commits('$path') ORDER BY commit_ts")
    }),
    // q25: time travel — the q18-style replay taken two commits PAST
    // the as-of point (a versioned delete, then a third upsert), then
    // read back as of commit 2. The reconstruction must restore the
    // delete's victims from history AND drop commit 4's rewrites in
    // favor of their retired predecessors; the oracle recomputes the
    // two-batch merge state relationally. Reading the CURRENT state of
    // the same table is x02/x03's job — this key proves the past one.
    "q25_time_travel" -> ((s, dir) => {
      val path = scratchTable("graft_q25_")
      val keyCols = Seq("okey")
      upsertVersioned(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      val c2 = upsertVersioned(s, replayBatch(s, dir, 1), path,
        keyCols, "pre", "part")
      deleteVersioned(s, replayBatch(s, dir, 0)
        .filter(col("pre") % 3 === 0).select("okey", "part"),
        path, keyCols, Seq("part"))
      upsertVersioned(s, replayBatch(s, dir, 2), path, keyCols, "pre", "part")
      readAsOf(s, path, c2)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // q26: savepoint-restore — the q25 replay physically REVERTED to
    // commit 2: commits 3 and 4's files un-published, their retired
    // predecessors restored from history, their ids tombstoned. The
    // PLAIN read of the restored table must equal the snapshot q25
    // only reads as-of.
    "q26_restore" -> ((s, dir) => {
      val path = scratchTable("graft_q26_")
      val keyCols = Seq("okey")
      upsertVersioned(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      val c2 = upsertVersioned(s, replayBatch(s, dir, 1), path,
        keyCols, "pre", "part")
      deleteVersioned(s, replayBatch(s, dir, 0)
        .filter(col("pre") % 3 === 0).select("okey", "part"),
        path, keyCols, Seq("part"))
      upsertVersioned(s, replayBatch(s, dir, 2), path, keyCols, "pre", "part")
      restoreTo(s, path, c2)
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // x07: CDC replication — the q29 3-commit source (two upserts + a
    // versioned delete) replicated into a SECOND table purely from the
    // change stream. The replica's plain read must equal the q18
    // replay algebra (the source's final state) however the commit
    // stream batched the changes — the proof that the CDC feed carries
    // everything needed to reconstruct a table.
    // x13: TRANSFORMED replica — a feature view (price band + exact
    // cents) maintained purely from the change stream; the delete must
    // propagate so the feature table serves no vanished source rows
    // WIDE key space (okey % 50000): the %500 replay saturates at sf1
    // (delete covers every key pair, the view is empty — vacuous 10x
    // evidence); survivors here are scale-stable, see q18w.
    "x13_feature_view" -> ((s, dir) => {
      val path = scratchTable("graft_x13src_")
      val keyCols = Seq("okey")
      upsertVersioned(s, replayBatch(s, dir, 0, 50000), path, keyCols,
        "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1, 50000), path, keyCols,
        "pre", "part")
      deleteVersioned(s, replayBatch(s, dir, 0, 50000)
        .filter(col("pre") % 3 === 0).select("okey", "part"),
        path, keyCols, Seq("part"))
      val dst = scratchTable("graft_x13dst_")
      val q = graft.util.StreamTuning.startAdapted(s, path) {
        IncrementalStream.replicateTransformed(s, path, dst,
          scratchTable("graft_x13ckpt_"), keyCols, "pre", Seq("part"),
          df => df.select(col("okey"), col("part"), col("pre"),
            floor(col("price") / 500).cast("long").as("band"),
            (graft.Tables.dec(col("price")) * 100).cast("long").as("cents")))
      }
      q.awaitTermination()
      readTable(s, dst)
        .select("okey", "part", "pre", "band", "cents")
        .orderBy("part", "okey")
    }),
    "x07_cdc_replica" -> ((s, dir) => {
      val path = scratchTable("graft_x07src_")
      val keyCols = Seq("okey")
      upsertVersioned(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1), path, keyCols, "pre", "part")
      deleteVersioned(s, replayBatch(s, dir, 0)
        .filter(col("pre") % 3 === 0).select("okey", "part"),
        path, keyCols, Seq("part"))
      val dst = scratchTable("graft_x07dst_")
      val q = graft.util.StreamTuning.startAdapted(s, path) {
        IncrementalStream.replicateTo(s, path, dst,
          scratchTable("graft_x07ckpt_"), keyCols, "pre", Seq("part"))
      }
      q.awaitTermination()
      readTable(s, dst)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // x07w: x07's CDC replication over the WIDE key space — the sf1
    // CDC evidence companion to q18w (the %500 replica was empty at
    // sf1 for the same saturation reason)
    "x07w_cdc_replica_wide" -> ((s, dir) => {
      val path = scratchTable("graft_x07wsrc_")
      val keyCols = Seq("okey")
      upsertVersioned(s, replayBatch(s, dir, 0, 50000), path,
        keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1, 50000), path,
        keyCols, "pre", "part")
      deleteVersioned(s, replayBatch(s, dir, 0, 50000)
        .filter(col("pre") % 3 === 0).select("okey", "part"),
        path, keyCols, Seq("part"))
      val dst = scratchTable("graft_x07wdst_")
      val q = graft.util.StreamTuning.startAdapted(s, path) {
        IncrementalStream.replicateTo(s, path, dst,
          scratchTable("graft_x07wckpt_"), keyCols, "pre", Seq("part"))
      }
      q.awaitTermination()
      readTable(s, dst)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // q35: metadata-only bootstrap — a PLAIN parquet lake (batch 0
    // written raw, duplicates and all) adopted into the timeline, then
    // upserted against. The upsert must replace every stored row whose
    // key batch 1 carries (including raw duplicates of that key) and
    // leave the other raw rows byte-identical; the oracle recomputes
    // exactly that anti-join + union.
    "q35_bootstrap" -> ((s, dir) => {
      val path = scratchTable("graft_q35_")
      val keyCols = Seq("okey")
      replayBatch(s, dir, 0).write.partitionBy("part").parquet(path)
      bootstrap(s, path, Seq("part"))
      upsertVersioned(s, replayBatch(s, dir, 1), path, keyCols, "pre", "part")
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey", "pre")
    }),
    // q30: partition replace (INSERT_OVERWRITE) — the two-batch merge
    // state with partition F then backfilled wholesale from batch 2:
    // partition F must equal ONLY the deduped batch-2 F rows (stored F
    // rows vanish unread), every other partition must be byte-stable.
    // The oracle recomputes the replace relationally.
    "q30_insert_overwrite" -> ((s, dir) => {
      val path = scratchTable("graft_q30_")
      val keyCols = Seq("okey")
      upsertVersioned(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1), path, keyCols, "pre", "part")
      insertOverwriteVersioned(s,
        replayBatch(s, dir, 2).filter(col("part") === "F"),
        path, keyCols, "pre", Seq("part"))
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // x06: streaming CDC — the q29 replay's full change history (0, c3]
    // drained through the checkpointed commit stream, each micro-batch
    // delivering exactly its commit ids' changes. The union must equal
    // the batch readChanges over the whole range however the file
    // source grouped the commit records — commit 1's pure inserts plus
    // q29's update/insert/delete classes; the oracle recomputes all of
    // it relationally.
    "x06_stream_cdc" -> ((s, dir) => {
      val path = scratchTable("graft_x06_")
      val keyCols = Seq("okey")
      upsertVersioned(s, replayBatch(s, dir, 0), path, keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1), path, keyCols, "pre", "part")
      deleteVersioned(s, replayBatch(s, dir, 0)
        .filter(col("pre") % 3 === 0).select("okey", "part"),
        path, keyCols, Seq("part"))
      val sink = scratchTable("graft_x06sink_")
      val q = graft.util.StreamTuning.startAdapted(s, path) {
        IncrementalStream.foreachChanges(s, path,
          scratchTable("graft_x06ckpt_"), Seq("okey", "part")) {
          (ch, _, _) => ch.write.mode("append").parquet(sink)
        }
      }
      q.awaitTermination()
      s.read.parquet(sink)
        .orderBy("_change_commit", "_change_type", "part", "okey")
    }),
    // q29: change-data-capture — the three-commit replay read back as
    // row-level changes in (c1, c3]: batch 2's upserts split into
    // inserts vs update pre/post-image pairs against the batch-1
    // state, and the versioned delete's victims emitted with their
    // pre-change payload. The oracle recomputes every change class
    // relationally from the same batch algebra; nothing engine-side
    // may leak a carried-over row as a change.
    "q29_cdc" -> ((s, dir) => {
      val path = scratchTable("graft_q29_")
      val keyCols = Seq("okey")
      val c1 = upsertVersioned(s, replayBatch(s, dir, 0), path,
        keyCols, "pre", "part")
      upsertVersioned(s, replayBatch(s, dir, 1), path,
        keyCols, "pre", "part")
      val c3 = deleteVersioned(s, replayBatch(s, dir, 0)
        .filter(col("pre") % 3 === 0).select("okey", "part"),
        path, keyCols, Seq("part"))
      readChanges(s, path, c1, c3, Seq("okey", "part"))
        .orderBy("_change_commit", "_change_type", "part", "okey")
    }),
    // x08: incremental view maintenance end-to-end — an aggregate
    // table built after the first source commit, then advanced to the
    // final state purely from the change stream (one refresh per
    // source commit: an update-heavy merge, then a delete). The oracle
    // recomputes the aggregate directly from the replayed final state,
    // so the incremental path must land on EXACTLY the from-scratch
    // answer (exact-decimal sums make that bit-for-bit).
    // WIDE key space (okey % 50000): non-vacuous sf1 evidence, see q18w
    "x08_incr_view" -> ((s, dir) => {
      val src = scratchTable("graft_x08s_")
      val vw = scratchTable("graft_x08v_")
      def b(i: Int): DataFrame = replayBatch(s, dir, i, 50000)
        .withColumn("bucket", col("okey") % 10)
      upsertVersioned(s, b(0), src, Seq("okey"), "pre", "part")
      IncrementalView.create(s, src, vw, srcKeys = Seq("okey", "part"),
        groupCols = Seq("part", "bucket"), sumCol = "price",
        partitionCol = "part")
      upsertVersioned(s, b(1), src, Seq("okey"), "pre", "part")
      IncrementalView.refresh(s, vw)
      deleteVersioned(s, b(0).filter(col("pre") % 3 === 0)
        .select("okey", "part"), src, Seq("okey"), Seq("part"))
      IncrementalView.refresh(s, vw)
      IncrementalView.readView(s, vw)
        .select(col("part"), col("bucket"),
          graft.Tables.d(col("sum_v")).as("sum_v"), col("n_rows"))
        .orderBy("part", "bucket")
    }),
    // x48: x08's IVM loop driven from the SQL console — the refreshes
    // run through graft_refresh_view (a command node: EXPLAIN
    // refreshes nothing, each SELECT applies exactly the source
    // commits past the view's own cursor) and the final read through
    // graft_read_view; shares x08's oracle because the final relation
    // must be identical to the API-driven loop's.
    "x48_sql_ivm" -> ((s, dir) => {
      val src = scratchTable("graft_x48s_")
      val vw = scratchTable("graft_x48v_")
      def b(i: Int): DataFrame = replayBatch(s, dir, i, 50000)
        .withColumn("bucket", col("okey") % 10)
      upsertVersioned(s, b(0), src, Seq("okey"), "pre", "part")
      IncrementalView.create(s, src, vw, srcKeys = Seq("okey", "part"),
        groupCols = Seq("part", "bucket"), sumCol = "price",
        partitionCol = "part")
      upsertVersioned(s, b(1), src, Seq("okey"), "pre", "part")
      s.sql(s"SELECT * FROM graft_refresh_view('$vw')").collect()
      deleteVersioned(s, b(0).filter(col("pre") % 3 === 0)
        .select("okey", "part"), src, Seq("okey"), Seq("part"))
      s.sql(s"SELECT * FROM graft_refresh_view('$vw')").collect()
      s.sql(s"SELECT part, bucket, CAST(sum_v AS DOUBLE) AS sum_v, " +
        s"n_rows FROM graft_read_view('$vw') ORDER BY part, bucket")
    }),
    // x09: STREAMING view maintenance — same source replay and final
    // aggregate as x08, but the refreshes are driven by draining the
    // checkpointed commit stream (batch grouping is the source's
    // choice; the cursor makes any grouping land on the same state).
    // WIDE key space (okey % 50000): non-vacuous sf1 evidence, see q18w
    "x09_stream_ivm" -> ((s, dir) => {
      val src = scratchTable("graft_x09s_")
      val vw = scratchTable("graft_x09v_")
      def b(i: Int): DataFrame = replayBatch(s, dir, i, 50000)
        .withColumn("bucket", col("okey") % 10)
      upsertVersioned(s, b(0), src, Seq("okey"), "pre", "part")
      IncrementalView.create(s, src, vw, srcKeys = Seq("okey", "part"),
        groupCols = Seq("part", "bucket"), sumCol = "price",
        partitionCol = "part")
      upsertVersioned(s, b(1), src, Seq("okey"), "pre", "part")
      deleteVersioned(s, b(0).filter(col("pre") % 3 === 0)
        .select("okey", "part"), src, Seq("okey"), Seq("part"))
      val q = graft.util.StreamTuning.startAdapted(s, src) {
        IncrementalStream.maintainView(s, src, vw,
          scratchTable("graft_x09ck_"))
      }
      q.awaitTermination()
      IncrementalView.readView(s, vw)
        .select(col("part"), col("bucket"),
          graft.Tables.d(col("sum_v")).as("sum_v"), col("n_rows"))
        .orderBy("part", "bucket")
    }),
    // x11: snapshot diff — the 4-commit replay diffed from the
    // 2-upsert snapshot to head: batch-2-only keys read insert, keys
    // it overwrites read update (batch-wins rewrites every matched
    // key; precombine `pre` differs mod 7 so no rewrite is a no-op),
    // deleted keys not re-inserted by batch 2 read delete
    "x11_snapshot_diff" -> ((s, dir) => {
      val path = scratchTable("graft_x11_")
      upsertVersioned(s, replayBatch(s, dir, 0), path, Seq("okey"),
        "pre", "part")
      val c2 = upsertVersioned(s, replayBatch(s, dir, 1), path,
        Seq("okey"), "pre", "part")
      deleteVersioned(s, replayBatch(s, dir, 0)
        .filter(col("pre") % 3 === 0).select("okey", "part"),
        path, Seq("okey"), Seq("part"))
      val c4 = upsertVersioned(s, replayBatch(s, dir, 2), path,
        Seq("okey"), "pre", "part")
      diffSnapshots(s, path, c2, c4, Seq("okey", "part"))
        .orderBy("part", "okey")
    }),
    // x12: recorded compaction — after the small-file rewrite, the
    // query time-travels BACK PAST the compaction commit to the
    // 2-upsert snapshot: the result is only correct if the compaction
    // retired (not destroyed) the old layout and owns no rows itself.
    // Same expected state as q25 through a physically different path.
    "x12_compact_versioned" -> ((s, dir) => {
      val path = scratchTable("graft_x12_")
      fragmented(s) {
        upsertVersioned(s, replayBatch(s, dir, 0), path, Seq("okey"),
          "pre", "part")
      }
      val c2 = fragmented(s) {
        upsertVersioned(s, replayBatch(s, dir, 1), path,
          Seq("okey"), "pre", "part")
      }
      fragmented(s) {
        deleteVersioned(s, replayBatch(s, dir, 0)
          .filter(col("pre") % 3 === 0).select("okey", "part"),
          path, Seq("okey"), Seq("part"))
      }
      val n = compactVersioned(s, path, Seq("part"), Seq("okey"))
      require(n > 0, "x12 expects the replay layout to need compaction")
      readAsOf(s, path, c2)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // x12w: x12's recorded-compaction time travel over the WIDE key
    // space (okey % 50000). x12's %500 scenario self-degenerates at
    // sf1 density (the saturated delete empties the table, compaction
    // finds nothing, its dead-assert fires by design) — this variant's
    // survivor density is scale-stable, so the 10x artifact gets a
    // real compaction-vs-time-travel row. Same law: travel back past
    // the compaction commit to the 2-upsert snapshot; correct only if
    // the rewrite retired (not destroyed) the old layout.
    "x12w_compact_versioned_wide" -> ((s, dir) => {
      val path = scratchTable("graft_x12w_")
      fragmented(s) {
        upsertVersioned(s, replayBatch(s, dir, 0, 50000), path, Seq("okey"),
          "pre", "part")
      }
      val c2 = fragmented(s) {
        upsertVersioned(s, replayBatch(s, dir, 1, 50000), path,
          Seq("okey"), "pre", "part")
      }
      fragmented(s) {
        deleteVersioned(s, replayBatch(s, dir, 0, 50000)
          .filter(col("pre") % 3 === 0).select("okey", "part"),
          path, Seq("okey"), Seq("part"))
      }
      val n = compactVersioned(s, path, Seq("part"), Seq("okey"))
      require(n > 0, "x12w expects the replay layout to need compaction")
      readAsOf(s, path, c2)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // x04: streaming keyed ingestion with the ORDERED payload — the
    // replay corpus split into files and drained through a checkpointed
    // file stream, each micro-batch upserted with
    // precombine-vs-stored semantics. The file source's batch grouping
    // is NOT pinned (maxFilesPerTrigger bounds it, order is the
    // source's choice); the final state must be the per-key argmax over
    // the whole corpus REGARDLESS of how the stream batched it — which
    // is exactly the property that makes ordered upsert the safe
    // payload for late/replayed data. The oracle computes that argmax.
    "x04_stream_upsert" -> ((s, dir) => {
      val path = scratchTable("graft_x04_")
      val inDir = scratchTable("graft_x04in_")
      val rows = graft.Tables.orders(s, dir)
        .filter(col("o_orderkey") % 7 <= 2)
        .select(
          (col("o_orderkey") % 500).as("okey"),
          col("o_orderstatus").as("part"),
          col("o_totalprice").as("price"),
          col("o_orderkey").as("pre"))
      rows.repartition(8).write.parquet(inDir)
      val q = graft.util.StreamTuning.startAdapted(s, inDir) {
        s.readStream.schema(rows.schema)
          .option("maxFilesPerTrigger", 3).parquet(inDir)
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", scratchTable("graft_x04ckpt_"))
          .foreachBatch { (batch: DataFrame, _: Long) =>
            upsertOrdered(s, batch, path, Seq("okey"), "pre", Seq("part"))
          }
          .start()
      }
      q.awaitTermination()
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }),
    // e18: x04's replay through the NATIVE sink — no foreachBatch hop;
    // the sink routes every micro-batch through the same option-driven
    // write dispatch as df.write.format("graft"), with per-query
    // committed-batch stamping for replay idempotency (GraftSink)
    "e18_stream_sink" -> ((s, dir) => {
      val path = scratchTable("graft_e18_")
      val inDir = scratchTable("graft_e18in_")
      val rows = graft.Tables.orders(s, dir)
        .filter(col("o_orderkey") % 7 <= 2)
        .select(
          (col("o_orderkey") % 500).as("okey"),
          col("o_orderstatus").as("part"),
          col("o_totalprice").as("price"),
          col("o_orderkey").as("pre"))
      rows.repartition(8).write.parquet(inDir)
      val q = graft.util.StreamTuning.startAdapted(s, inDir) {
        s.readStream.schema(rows.schema)
          .option("maxFilesPerTrigger", 3).parquet(inDir)
          .writeStream
          .format("graft")
          .option("path", path)
          .option("op", "upsert_ordered")
          .option("keys", "okey")
          .option("precombine", "pre")
          .option("partition", "part")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", scratchTable("graft_e18ckpt_"))
          .start()
      }
      q.awaitTermination()
      readTable(s, path)
        .select("okey", "part", "price", "pre")
        .orderBy("part", "okey")
    }))

  /** DuckDB replay of the same algebra: per-batch dedup by max
    * precombine, batch-wins-over-stored merge, distinct-key anti-join
    * delete — each window/join mirrors one Merge stage. */
  /** The q18 replay algebra at the classic %500 key space. The
    * compaction keys (q23/x34) share [[replaySqlMod]](50000) instead:
    * content-invariance is the same law at any key width, and only the
    * wide space survives sf1 density (see q18w). */
  private[merge] val replaySql = replaySqlMod(500)

  /** The q18 replay algebra over `o_orderkey % mod` keys. mod=500 is
    * the classic scenario; mod=50000 (q18w/x07w) keeps the scenario
    * meaningful at 10x+ scale — with dense 1.5M-key data the %500
    * compression packs ~300 orders behind every (okey, part), the %3
    * delete then covers every pair and the final table is EMPTY (the
    * r10 verdict's vacuous-sf1-evidence finding); the wide key space
    * keeps survivor density scale-stable. */
  /** The two-batch merge snapshot (the q25/x12 as-of state — the replay
    * algebra BEFORE the delete) at key space `okey = o_orderkey % mod`. */
  private[merge] def twoBatchSqlMod(mod: Int): String =
    s"""WITH raw AS (SELECT o_orderkey % $mod AS okey, o_orderstatus AS part,
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
      |SELECT okey, part, price, pre FROM (
      |  SELECT * FROM b2
      |  UNION ALL
      |  SELECT b1.okey, b1.part, b1.price, b1.pre FROM b1
      |  LEFT JOIN b2 ON b1.okey = b2.okey AND b1.part = b2.part
      |  WHERE b2.pre IS NULL)
      |ORDER BY part, okey""".stripMargin

  private[graft] def replaySqlMod(mod: Int): String =
    s"""WITH raw AS (SELECT o_orderkey % $mod AS okey, o_orderstatus AS part,
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

  private val oracle0: Map[String, String] = Map(
    "q18_upsert_replay" -> replaySql,
    // the wide-key variants run the same algebra over okey % 50000 —
    // the scale-stable sf1 evidence pair
    "q18w_upsert_replay_wide" -> replaySqlMod(50000),
    "x07w_cdc_replica_wide" -> replaySqlMod(50000),
    // the wide-key recorded-compaction time travel (see x12w): the
    // as-of-commit-2 snapshot = the two-batch merge state at mod 50000
    "x12w_compact_versioned_wide" -> twoBatchSqlMod(50000),
    // x47: the healthy-table report, row by row; footer_row_count's
    // detail recomputes the SAME replay relationally — the one check
    // whose value is data-derived on both sides
    "x47_sql_fsck" ->
      s"""SELECT * FROM (VALUES
         |  ('commit_timeline', 'ok', 'recorded=3 inflight=0 foreign=0'),
         |  ('footer_row_count', 'ok',
         |   'rows=' || CAST((SELECT COUNT(*) FROM (${replaySqlMod(50000)}))
         |              AS VARCHAR)),
         |  ('key_spec', 'ok', 'partition=part keys=okey'),
         |  ('mor_deltas', 'ok', 'cow table'),
         |  ('savepoints', 'ok', 'pinned=0 unrecorded=0'),
         |  ('schema_meta', 'ok', 'recorded'),
         |  ('staging', 'ok', 'leaks=0')
         |) AS t(check_name, status, detail)
         |ORDER BY check_name""".stripMargin,
    // compaction keys replay the WIDE algebra (sf1 non-vacuity)
    "q23_compact" -> replaySqlMod(50000),
    // the SQL-procedure compaction must be content-invariant too
    "x34_sql_compact" -> replaySqlMod(50000),
    // WAP replay: ONLY the published batches (0, 1, 3) fold through
    // the overwrite-latest chain — the audited-out batch 2 must leave
    // no trace
    "x28_wap" ->
      """WITH raw AS (SELECT o_orderkey % 500 AS okey, o_orderstatus AS part,
        |               o_totalprice AS price, o_orderkey AS pre
        |             FROM orders),
        |b0 AS (SELECT okey, part, price, pre FROM (
        |         SELECT *, row_number() OVER (PARTITION BY okey, part
        |           ORDER BY pre DESC) AS rn
        |         FROM raw WHERE pre % 7 = 0) WHERE rn = 1),
        |b1 AS (SELECT okey, part, price, pre FROM (
        |         SELECT *, row_number() OVER (PARTITION BY okey, part
        |           ORDER BY pre DESC) AS rn
        |         FROM raw WHERE pre % 7 = 1) WHERE rn = 1),
        |b3 AS (SELECT okey, part, price, pre FROM (
        |         SELECT *, row_number() OVER (PARTITION BY okey, part
        |           ORDER BY pre DESC) AS rn
        |         FROM raw WHERE pre % 7 = 3) WHERE rn = 1),
        |t2 AS (SELECT * FROM b1
        |       UNION ALL
        |       SELECT b0.okey, b0.part, b0.price, b0.pre FROM b0
        |       LEFT JOIN b1 ON b0.okey = b1.okey AND b0.part = b1.part
        |       WHERE b1.pre IS NULL),
        |t3 AS (SELECT * FROM b3
        |       UNION ALL
        |       SELECT t2.okey, t2.part, t2.price, t2.pre FROM t2
        |       LEFT JOIN b3 ON t2.okey = b3.okey AND t2.part = b3.part
        |       WHERE b3.pre IS NULL)
        |SELECT okey, part, price, pre FROM t3
        |ORDER BY part, okey""".stripMargin,
    // a CDC-maintained replica IS the source's final state
    "x07_cdc_replica" -> replaySql,
    // the row-local feature transform applied to the replay's final
    // state — the CDC-maintained feature view must agree with the
    // direct map over the source's end state
    "x13_feature_view" ->
      s"""SELECT okey, part, pre,
         |  CAST(FLOOR(price / 500) AS BIGINT) AS band,
         |  CAST(CAST(price AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
         |FROM (${replaySqlMod(50000)})
         |ORDER BY part, okey""".stripMargin,
    // the incrementally-maintained aggregate must equal the direct
    // aggregate of the replayed final state
    "x08_incr_view" ->
      s"""SELECT part, okey % 10 AS bucket,
         |  CAST(CAST(SUM(CAST(price AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_v,
         |  COUNT(*) AS n_rows
         |FROM (${replaySqlMod(50000)})
         |GROUP BY part, okey % 10
         |ORDER BY part, bucket""".stripMargin,
    // stream-driven refreshes land on the same state as x08's manual
    // ones — the cursor, not the batching, decides what applies
    "x09_stream_ivm" ->
      s"""SELECT part, okey % 10 AS bucket,
         |  CAST(CAST(SUM(CAST(price AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_v,
         |  COUNT(*) AS n_rows
         |FROM (${replaySqlMod(50000)})
         |GROUP BY part, okey % 10
         |ORDER BY part, bucket""".stripMargin,
    // the snapshot-vs-snapshot full-outer classification over the same
    // replay algebra: t2 = the 2-upsert snapshot, t4 = head after the
    // delete + batch-2 merge
    "x11_snapshot_diff" ->
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
        |       SELECT b1.* FROM b1
        |       LEFT JOIN b2 ON b1.okey = b2.okey AND b1.part = b2.part
        |       WHERE b2.pre IS NULL),
        |d AS (SELECT DISTINCT okey, part FROM raw
        |      WHERE pre % 7 = 0 AND pre % 3 = 0),
        |t3 AS (SELECT t2.* FROM t2
        |       LEFT JOIN d ON t2.okey = d.okey AND t2.part = d.part
        |       WHERE d.okey IS NULL),
        |b3 AS (SELECT okey, part, price, pre FROM (
        |         SELECT *, row_number() OVER (PARTITION BY okey, part
        |           ORDER BY pre DESC) AS rn
        |         FROM raw WHERE pre % 7 = 2) WHERE rn = 1),
        |t4 AS (SELECT * FROM b3
        |       UNION ALL
        |       SELECT t3.* FROM t3
        |       LEFT JOIN b3 ON t3.okey = b3.okey AND t3.part = b3.part
        |       WHERE b3.pre IS NULL)
        |SELECT COALESCE(a.okey, b.okey) AS okey,
        |       COALESCE(a.part, b.part) AS part,
        |       CASE WHEN a.okey IS NULL THEN 'insert'
        |            WHEN b.okey IS NULL THEN 'delete'
        |            ELSE 'update' END AS change
        |FROM t2 a FULL JOIN t4 b ON a.okey = b.okey AND a.part = b.part
        |WHERE a.okey IS NULL OR b.okey IS NULL
        |   OR a.price <> b.price OR a.pre <> b.pre
        |ORDER BY part, okey""".stripMargin,
    // the q18 algebra extended by one more batch-wins merge (batch 2,
    // pre%7=2) applied after the delete — the state x02 replays on an
    // index-pruned table
    "x02_indexed_upsert" ->
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
        |b3 AS (SELECT okey, part, price, pre FROM (
        |         SELECT *, row_number() OVER (PARTITION BY okey, part
        |           ORDER BY pre DESC) AS rn
        |         FROM raw WHERE pre % 7 = 2) WHERE rn = 1),
        |t2 AS (SELECT * FROM b2
        |       UNION ALL
        |       SELECT b1.okey, b1.part, b1.price, b1.pre FROM b1
        |       LEFT JOIN b2 ON b1.okey = b2.okey AND b1.part = b2.part
        |       WHERE b2.pre IS NULL),
        |d AS (SELECT DISTINCT okey, part FROM raw
        |      WHERE pre % 7 = 0 AND pre % 3 = 0),
        |t2d AS (SELECT t2.* FROM t2
        |        LEFT JOIN d ON t2.okey = d.okey AND t2.part = d.part
        |        WHERE d.okey IS NULL),
        |t3 AS (SELECT * FROM b3
        |       UNION ALL
        |       SELECT t2d.okey, t2d.part, t2d.price, t2d.pre FROM t2d
        |       LEFT JOIN b3 ON t2d.okey = b3.okey AND t2d.part = b3.part
        |       WHERE b3.pre IS NULL)
        |SELECT okey, part, price, pre FROM t3
        |ORDER BY part, okey""".stripMargin,
    "q24_zorder" ->
      """SELECT l_orderkey AS okey, l_linenumber AS lnum,
        |       l_partkey AS pk, l_suppkey AS sk,
        |       l_quantity AS qty, l_returnflag AS part
        |FROM lineitem
        |ORDER BY okey, lnum, pk, sk, qty, part""".stripMargin,
    // the three-way MERGE split, restated relationally: m = matched
    // pairs, dels/ups by the clause conditions (delete wins), ins =
    // not-matched evens; final = untouched base ∪ updates ∪ inserts
    "q37_merge_conditional" ->
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
        |m AS (SELECT b2.okey, b2.part, b2.price, b2.pre,
        |             b1.price AS tprice
        |      FROM b2 JOIN b1 ON b2.okey = b1.okey AND b2.part = b1.part),
        |dels AS (SELECT okey, part FROM m WHERE pre % 5 = 0),
        |ups AS (SELECT okey, part, price, pre FROM m
        |        WHERE pre % 5 <> 0 AND price > tprice),
        |ins AS (SELECT b2.okey, b2.part, b2.price, b2.pre FROM b2
        |        LEFT JOIN b1 ON b2.okey = b1.okey AND b2.part = b1.part
        |        WHERE b1.pre IS NULL AND b2.okey % 2 = 0),
        |kept AS (SELECT b1.okey, b1.part, b1.price, b1.pre FROM b1
        |         LEFT JOIN dels ON b1.okey = dels.okey AND b1.part = dels.part
        |         LEFT JOIN ups ON b1.okey = ups.okey AND b1.part = ups.part
        |         WHERE dels.okey IS NULL AND ups.okey IS NULL)
        |SELECT okey, part, price, pre FROM kept
        |UNION ALL SELECT okey, part, price, pre FROM ups
        |UNION ALL SELECT okey, part, price, pre FROM ins
        |ORDER BY part, okey""".stripMargin,
    // stats skipping must be result-invisible: the pruned read IS the
    // plain filter
    "q36_stats_skipping" ->
      """SELECT l_orderkey AS okey, l_linenumber AS lnum,
        |       l_quantity AS qty, l_extendedprice AS price,
        |       l_returnflag AS part
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 5000
        |ORDER BY okey, lnum, qty, price, part""".stripMargin,
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
    // the drained increments compose to the current stamped state:
    // batch 3 wins its keys, then batch-2 survivors, then batch-1
    // survivors — each row once, stamped by its last writer
    "x03_incremental_stream" ->
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
        |b3 AS (SELECT okey, part, price, pre FROM (
        |         SELECT *, row_number() OVER (PARTITION BY okey, part
        |           ORDER BY pre DESC) AS rn
        |         FROM raw WHERE pre % 7 = 2) WHERE rn = 1)
        |SELECT okey, part, price, pre, commit_ts FROM (
        |  SELECT okey, part, price, pre, CAST(3 AS BIGINT) AS commit_ts
        |  FROM b3
        |  UNION ALL
        |  SELECT b2.okey, b2.part, b2.price, b2.pre,
        |         CAST(2 AS BIGINT) AS commit_ts
        |  FROM b2 LEFT JOIN b3 ON b2.okey = b3.okey AND b2.part = b3.part
        |  WHERE b3.pre IS NULL
        |  UNION ALL
        |  SELECT b1.okey, b1.part, b1.price, b1.pre,
        |         CAST(1 AS BIGINT) AS commit_ts
        |  FROM b1
        |  LEFT JOIN b2 ON b1.okey = b2.okey AND b1.part = b2.part
        |  LEFT JOIN b3 ON b1.okey = b3.okey AND b1.part = b3.part
        |  WHERE b2.pre IS NULL AND b3.pre IS NULL)
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
        |ORDER BY commit_ts""".stripMargin,
    // the as-of-commit-2 snapshot = the two-batch merge state, before
    // the versioned delete and the third upsert that q25 replays past
    // time travel across a RECORDED compaction lands on the same
    // 2-upsert snapshot as q25 — compaction moved bytes, not state
    "x12_compact_versioned" ->
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
        |SELECT okey, part, price, pre FROM (
        |  SELECT * FROM b2
        |  UNION ALL
        |  SELECT b1.okey, b1.part, b1.price, b1.pre FROM b1
        |  LEFT JOIN b2 ON b1.okey = b2.okey AND b1.part = b2.part
        |  WHERE b2.pre IS NULL)
        |ORDER BY part, okey""".stripMargin,
    "q25_time_travel" ->
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
        |SELECT okey, part, price, pre FROM (
        |  SELECT * FROM b2
        |  UNION ALL
        |  SELECT b1.okey, b1.part, b1.price, b1.pre FROM b1
        |  LEFT JOIN b2 ON b1.okey = b2.okey AND b1.part = b2.part
        |  WHERE b2.pre IS NULL)
        |ORDER BY part, okey""".stripMargin,
    // a restored table IS the as-of snapshot, read plainly — the same
    // two-batch merge state as q25
    "q26_restore" ->
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
        |SELECT okey, part, price, pre FROM (
        |  SELECT * FROM b2
        |  UNION ALL
        |  SELECT b1.okey, b1.part, b1.price, b1.pre FROM b1
        |  LEFT JOIN b2 ON b1.okey = b2.okey AND b1.part = b2.part
        |  WHERE b2.pre IS NULL)
        |ORDER BY part, okey""".stripMargin,
    // the adopted raw batch-0 rows (duplicates preserved) anti-joined
    // by batch-1's deduped keys, plus the batch-1 winners
    "q35_bootstrap" ->
      """WITH raw AS (SELECT o_orderkey % 500 AS okey, o_orderstatus AS part,
        |               o_totalprice AS price, o_orderkey AS pre
        |             FROM orders),
        |raw0 AS (SELECT okey, part, price, pre FROM raw WHERE pre % 7 = 0),
        |b2 AS (SELECT okey, part, price, pre FROM (
        |         SELECT *, row_number() OVER (PARTITION BY okey, part
        |           ORDER BY pre DESC) AS rn
        |         FROM raw WHERE pre % 7 = 1) WHERE rn = 1)
        |SELECT okey, part, price, pre FROM (
        |  SELECT * FROM b2
        |  UNION ALL
        |  SELECT raw0.okey, raw0.part, raw0.price, raw0.pre FROM raw0
        |  LEFT JOIN b2 ON raw0.okey = b2.okey AND raw0.part = b2.part
        |  WHERE b2.pre IS NULL)
        |ORDER BY part, okey, pre""".stripMargin,
    // partition F replaced by batch 2's deduped F rows; the rest is the
    // untouched two-batch merge state
    "q30_insert_overwrite" ->
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
        |b3f AS (SELECT okey, part, price, pre FROM (
        |          SELECT *, row_number() OVER (PARTITION BY okey, part
        |            ORDER BY pre DESC) AS rn
        |          FROM raw WHERE pre % 7 = 2 AND part = 'F') WHERE rn = 1)
        |SELECT okey, part, price, pre FROM (
        |  SELECT * FROM b3f
        |  UNION ALL
        |  SELECT * FROM t2 WHERE part <> 'F')
        |ORDER BY part, okey""".stripMargin,
    // the streamed change history = commit 1's pure inserts (the
    // deduped batch-0 rows) plus the q29 change classes, however the
    // commit stream batched them
    "x06_stream_cdc" ->
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
        |      WHERE pre % 7 = 0 AND pre % 3 = 0),
        |ch AS (
        |  SELECT okey, part, price, pre,
        |         'insert' AS _change_type, CAST(1 AS BIGINT) AS _change_commit
        |  FROM b1
        |  UNION ALL
        |  SELECT b2.okey, b2.part, b2.price, b2.pre,
        |         CASE WHEN b1.pre IS NULL THEN 'insert'
        |              ELSE 'update_postimage' END,
        |         CAST(2 AS BIGINT)
        |  FROM b2 LEFT JOIN b1 ON b2.okey = b1.okey AND b2.part = b1.part
        |  UNION ALL
        |  SELECT b1.okey, b1.part, b1.price, b1.pre,
        |         'update_preimage', CAST(2 AS BIGINT)
        |  FROM b1 JOIN b2 ON b1.okey = b2.okey AND b1.part = b2.part
        |  UNION ALL
        |  SELECT t2.okey, t2.part, t2.price, t2.pre,
        |         'delete', CAST(3 AS BIGINT)
        |  FROM t2 JOIN d ON t2.okey = d.okey AND t2.part = d.part)
        |SELECT okey, part, price, pre, _change_type, _change_commit
        |FROM ch
        |ORDER BY _change_commit, _change_type, part, okey""".stripMargin,
    // every change class recomputed relationally: commit 2 = batch 2
    // vs the batch-1 state (outer join splits inserts from updates,
    // update keys emit both images), commit 3 = the delete victims
    // with their pre-change payload from the two-batch merge state
    "q29_cdc" ->
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
        |      WHERE pre % 7 = 0 AND pre % 3 = 0),
        |ch AS (
        |  SELECT b2.okey, b2.part, b2.price, b2.pre,
        |         CASE WHEN b1.pre IS NULL THEN 'insert'
        |              ELSE 'update_postimage' END AS _change_type,
        |         CAST(2 AS BIGINT) AS _change_commit
        |  FROM b2 LEFT JOIN b1 ON b2.okey = b1.okey AND b2.part = b1.part
        |  UNION ALL
        |  SELECT b1.okey, b1.part, b1.price, b1.pre,
        |         'update_preimage', CAST(2 AS BIGINT)
        |  FROM b1 JOIN b2 ON b1.okey = b2.okey AND b1.part = b2.part
        |  UNION ALL
        |  SELECT t2.okey, t2.part, t2.price, t2.pre,
        |         'delete', CAST(3 AS BIGINT)
        |  FROM t2 JOIN d ON t2.okey = d.okey AND t2.part = d.part)
        |SELECT okey, part, price, pre, _change_type, _change_commit
        |FROM ch
        |ORDER BY _change_commit, _change_type, part, okey""".stripMargin,
    // ordered-payload streaming ingestion converges to the per-key
    // precombine argmax over the whole corpus, however the stream
    // grouped it into micro-batches
    "x04_stream_upsert" ->
      """WITH raw AS (SELECT o_orderkey % 500 AS okey, o_orderstatus AS part,
        |               o_totalprice AS price, o_orderkey AS pre
        |             FROM orders WHERE o_orderkey % 7 <= 2)
        |SELECT okey, part, price, pre FROM (
        |  SELECT *, row_number() OVER (PARTITION BY okey, part
        |    ORDER BY pre DESC) AS rn
        |  FROM raw) WHERE rn = 1
        |ORDER BY part, okey""".stripMargin)

  /** x24 replays q22 exactly and reads the same timeline through SQL,
    * so the two keys share one oracle string. */
  val oracle: Map[String, String] =
    oracle0 +
      ("x24_sql_commits" -> oracle0("q22_timeline")) +
      // x48 drives x08's exact IVM loop from the SQL console
      // (graft_refresh_view advances the cursor, graft_read_view
      // emits the live groups) — same final relation, same oracle
      ("x48_sql_ivm" -> oracle0("x08_incr_view")) +
      // e18 replays x04's corpus through the NATIVE streaming sink
      // (writeStream.format("graft"), no foreachBatch hop) with the
      // same ordered payload — the final state must be the same
      // batch-geometry-invariant argmax, so the oracle is shared
      ("e18_stream_sink" -> oracle0("x04_stream_upsert")) +
      // bulk insert lands the batch VERBATIM — no dedup, duplicates
      // preserved; the oracle is the raw batch selection
      ("x27_bulk_insert" ->
        """SELECT o_orderkey % 500 AS okey, o_orderstatus AS part,
          |       o_totalprice AS price, o_orderkey AS pre
          |FROM orders WHERE o_orderkey % 7 = 0
          |ORDER BY part, okey, pre""".stripMargin) +
      // cleaning must be invisible in the current state: the oracle is
      // the plain 3-batch batch-wins replay (per-batch precombine
      // dedup, later commit replaces per key identity)
      ("x26_clean_retention" -> cleanRetentionSql) +
      // the SQL maintenance procedures are content-invariant, so each
      // shares the oracle of the API key whose scenario it replays:
      // x35 = x26's clean retention through graft_clean('path', 1),
      // x36 = q24's layout rewrite through graft_zorder('path', cols)
      ("x35_sql_clean" -> cleanRetentionSql) +
      ("x36_sql_zorder" -> oracle0("q24_zorder")) +
      // x37 = q26's savepoint-clean-restore chain through SQL (the
      // restored table IS the two-batch snapshot); x38 = the q18
      // replay with a staging leak swept by graft_vacuum (sweep is
      // content-invariant — it touches only non-table siblings)
      ("x37_sql_restore" -> oracle0("q26_restore")) +
      ("x38_sql_vacuum" -> replaySqlMod(50000)) +
      // x39 = q25's as-of snapshot through graft_snapshot('path', ts)
      ("x39_sql_snapshot" -> oracle0("q25_time_travel")) +
      // x40 = the wide replay's cardinality from footer metadata; the
      // oracle counts the same algebra relationally
      ("x40_sql_count" ->
        s"""SELECT CAST(count(*) AS BIGINT) AS n_rows FROM (
           |${replaySqlMod(50000)})""".stripMargin) +
      // x41 = footer-only column statistics; the oracle recomputes the
      // same five aggregates relationally over the identical projection
      // (incl. the injected nulls). Bounds cast to VARCHAR match the
      // engine's plain integer rendering; the partition column's bounds
      // are string-ordered in both (single-char flags).
      ("x41_sql_stats" ->
        """WITH t AS (
          |  SELECT l_orderkey AS okey, l_linenumber AS lnum,
          |         CASE WHEN l_orderkey % 11 = 0 THEN NULL
          |              ELSE l_suppkey END AS sk,
          |         l_returnflag AS part
          |  FROM lineitem)
          |SELECT * FROM (
          |  SELECT 'okey' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
          |         CAST(count(*) - count(okey) AS BIGINT) AS n_nulls,
          |         CAST(min(okey) AS VARCHAR) AS min_value,
          |         CAST(max(okey) AS VARCHAR) AS max_value,
          |         TRUE AS exact
          |  FROM t
          |  UNION ALL
          |  SELECT 'sk', CAST(count(*) AS BIGINT),
          |         CAST(count(*) - count(sk) AS BIGINT),
          |         CAST(min(sk) AS VARCHAR), CAST(max(sk) AS VARCHAR), TRUE
          |  FROM t
          |  UNION ALL
          |  SELECT 'part', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT),
          |         min(part), max(part), TRUE
          |  FROM t)
          |ORDER BY "column"""".stripMargin)

  // lazy: referenced by the `oracle` val above its definition point —
  // a plain val would still be null when `oracle` is constructed
  private lazy val cleanRetentionSql =
    """WITH raw AS (SELECT o_orderkey % 7 AS b, o_orderkey % 500 AS okey,
      |               o_orderstatus AS part, o_totalprice AS price,
      |               o_orderkey AS pre
      |             FROM orders WHERE o_orderkey % 7 IN (0, 1, 2)),
      |d AS (SELECT b, okey, part, price, pre FROM (
      |   SELECT *, row_number() OVER (PARTITION BY b, okey, part
      |     ORDER BY pre DESC) AS rn
      |   FROM raw) WHERE rn = 1),
      |cur AS (SELECT okey, part, price, pre FROM (
      |   SELECT *, row_number() OVER (PARTITION BY okey, part
      |     ORDER BY b DESC) AS rn
      |   FROM d) WHERE rn = 1)
      |SELECT okey, part, price, pre FROM cur
      |ORDER BY part, okey""".stripMargin
}
