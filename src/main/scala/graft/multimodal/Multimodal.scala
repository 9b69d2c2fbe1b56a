package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, partition-preserving
  * narrow transforms, typed mapPartitions batching — but the actual
  * codec work is stubbed (no image/audio libraries in this
  * environment): the [[MediaCodec]] trait is the production seam, and
  * its shipped [[StubMediaCodec]] derives deterministic fake pixels
  * from the payload bytes. Swapping in a real decoder implements one
  * trait; everything around it (batching, schema, partitioning) is
  * production-shaped and spec-pinned unchanged.
  *
  * Scale notes: payloads never shuffle — all stages are narrow maps
  * over the scan partitioning. Feature extraction happens before any
  * join/agg so only small feature vectors (not blobs) ever move.
  * `spark.sql.files.maxPartitionBytes` governs blob-scan granularity;
  * binary payloads in parquet keep the metadata columns readable
  * without materializing the blobs (column pruning).
  */
object Multimodal {

  /** One media item: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  /** Fixed-shape decoded features. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Float])

  val featureDim = 16

  /** Deterministic synthetic media table derived from the documents
    * table (the container ships no binary fixtures): payload = utf-8
    * bytes of the text, metadata derived from doc fields. Deterministic
    * → oracle-checkable metadata. */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      (col("n_chars") % 48 + 1).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (col("n_chars") * 10).as("duration_ms"))

  /** Stub decode (deterministic fake — the container ships no codec
    * libraries): "pixels" are a rolling byte-mix of the payload, folded
    * into `featureDim` float features. The production integration point
    * is the [[MediaCodec]] seam ([[codecDecode]]), spec-pinned
    * byte-equal to this path; this inline form stays as the zero-setup
    * default the driver keys run.
    *
    * Accumulation is DOUBLE precision with a single float narrowing at
    * the end: a float-accumulated fold would drift from any relational
    * restatement, while double-fold-then-narrow is reproducible in the
    * driver's DuckDB oracle (position-ordered SUM, then CAST(REAL)). */
  def stubDecode(media: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    codecDecode(media, () => new StubMediaCodec)

  /** Decode through the [[MediaCodec]] production seam: one codec per
    * partition (amortized library/JNI/py-worker init — per-record
    * construction is what kills a real codec), closed via the
    * task-completion listener so early-terminating consumers and task
    * failures release it too (the [[graft.orders.ExchangeClient]]
    * lifecycle, applied to decoding). `mkCodec` must be serializable
    * (it ships to executors); the constructed codec must not. */
  def codecDecode(media: Dataset[MediaRecord],
      mkCodec: () => MediaCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = mkCodec() // per-partition init, not per-record
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => codec.close()))
      it.map(codec.decode)
    }
  }

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload
    * (a video "frame" stand-in). Pure builtin expression — narrow, no
    * shuffle, codegen'd. */
  def frameSample(payload: org.apache.spark.sql.Column, frameSize: Int,
      stride: Int): org.apache.spark.sql.Column =
    transform(
      sequence(lit(0),
        greatest(floor((octet_length(payload) - 1) / (frameSize * stride))
          .cast("int"), lit(0))),
      i => payload.substr(i * frameSize * stride + 1, lit(frameSize)))

  /** "Resize" stub: truncate/pad payload to a target byte budget —
    * placeholder for a real image resize, keeps the narrow-map shape. */
  def resizeStub(payload: org.apache.spark.sql.Column,
      targetBytes: Int): org.apache.spark.sql.Column =
    substring(payload, 1, targetBytes)

  /** Block-mean perceptual hash of a fixed-size text frame (the
    * Blockhash algorithm's 1-D shape): the frame splits into `blocks`
    * equal chunks, bit b = (chunk b's byte sum ≥ the frame-wide mean),
    * packed little-endian. Two frames whose bytes differ slightly
    * usually keep identical block/frame mean RELATIONS, so near-dup
    * frames collide on the signature where exact sha256 fingerprints
    * (m05) do not. INTEGER arithmetic only — `sum*blocks >= total`
    * instead of a float mean — so the signature is bit-portable to any
    * engine. Narrow codegen'd expression; no UDF, no shuffle. */
  def blockMeanHash(frame: org.apache.spark.sql.Column, frameSize: Int,
      blocks: Int): org.apache.spark.sql.Column = {
    require(frameSize % blocks == 0, "frameSize must divide into blocks")
    val chunk = frameSize / blocks
    def blockSum(b: Int) = (1 to chunk).map(j =>
      ascii(substring(frame, b * chunk + j, 1))).reduce(_ + _)
    val sums = (0 until blocks).map(blockSum)
    val total = sums.reduce(_ + _)
    (0 until blocks).map(b =>
      when(sums(b) * lit(blocks) >= total, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  // ---- query inventory ----

  type Q = (SparkSession, String) => DataFrame

  /** Media-text PAIRING manifest — the contrastive-training assembly
    * step (LAION-style): each media item joined to its caption
    * document, kept only when both sides clear their cleanliness gates
    * (caption length inside the training window, media duration above
    * the junk floor). Payload bytes never move — the join carries
    * metadata and the caption token count only; at 100 TB the manifest
    * is what ships to the loader, which fetches blobs by id. */
  def pairedSamples(spark: SparkSession, dir: String,
      minCaptionTokens: Int = 25, maxCaptionTokens: Int = 80,
      minDurationMs: Long = 1000L): DataFrame = {
    val media = syntheticMedia(spark, dir).select(
      col("media_id"), col("kind"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      col("width"), col("height"), col("duration_ms"))
    val caps = Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      size(graft.text.TextAnalysis.tokens(col("text"))).cast("long")
        .as("n_caption_tokens"))
    media.join(caps, col("media_id") === col("doc_id"))
      .filter(col("n_caption_tokens")
        .between(minCaptionTokens, maxCaptionTokens) &&
        col("duration_ms") >= minDurationMs)
      .select("media_id", "kind", "lang", "n_caption_tokens",
        "n_bytes", "width", "height")
  }

  /** Partial-content overlap across media payloads: SLIDING byte
    * windows (size `windowBytes`, stride `stride` ≪ window) fingerprint
    * each payload densely, and media sharing ≥ `minShared` windows
    * surface as overlap pairs — the embedded/partial-duplicate
    * detector (the same clip inside two different containers, an
    * intro spliced into many videos) that m05's disjoint fixed frames
    * under-sample. Offset contract, stated exactly: a shared region
    * is caught iff its offset DELTA between the two payloads is a
    * multiple of `stride` (both sides sample at stride-aligned
    * positions) — stride 8 catches 8× more offsets than m05's
    * frame-aligned dedup at 8× the window rows; stride 1 is full
    * shift-invariance at len× cost, and content-defined chunking is
    * the constant-factor alternative when arbitrary deltas matter.
    *
    * Same Σdf² candidate law as the text near-dup family: windows in
    * more than `maxDf` media are boilerplate (codec headers, silence,
    * black frames) and are excluded BEFORE the pair join — the df cap
    * is what keeps the operator alive at corpus scale. Only windows
    * shuffle, never whole payloads. */
  def contentOverlap(media: DataFrame, idCol: String, payloadCol: String,
      windowBytes: Int = 32, stride: Int = 8, maxDf: Int = 20,
      minShared: Int = 2): DataFrame = {
    require(stride >= 1 && windowBytes > stride,
      "need overlapping windows: 1 <= stride < windowBytes")
    val wins = media.select(col(idCol).as("id"),
        explode(transform(
          sequence(lit(0), greatest(
            floor((octet_length(col(payloadCol)) - windowBytes)
              .cast("double") / stride).cast("int"), lit(0))),
          p => col(payloadCol).substr(p * stride + 1, lit(windowBytes))))
          .as("win"))
      .filter(octet_length(col("win")) === windowBytes)
      .distinct()
    val keep = wins.groupBy("win")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > 1 && col("df") <= maxDf)
    val shared = wins.join(keep.select("win"), Seq("win"), "left_semi")
    shared.as("a").join(shared.as("b"),
        col("a.win") === col("b.win") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Content-defined chunks per payload: the
    * [[graft.functions.CdcBounds]] boundary expression sliced into
    * (chunk_idx, start, len, sha256 fingerprint) rows — boundaries
    * move with the content, so identical regions at ANY offset delta
    * produce identical chunk fingerprints (the shift-invariant dedup
    * primitive [[contentOverlap]]'s aligned windows structurally
    * miss). Narrow and codegen'd end to end; only fingerprints need
    * ever shuffle downstream. */
  def cdcChunks(media: DataFrame, idCol: String, payloadCol: String,
      k: Int = 8, base: Int = 31, modulus: Int = 1 << 20,
      divisor: Int = 16): DataFrame = {
    val bnds = graft.functions.ChunkFunctions
      .cdcBounds(col(payloadCol), k, base, modulus, divisor)
    media
      .select(col(idCol).as("id"), col(payloadCol).as("p"),
        bnds.as("bnds"))
      .select(col("id"), col("p"),
        posexplode(transform(col("bnds"), (e, i) =>
          struct(
            when(i === 0, lit(1))
              .otherwise(element_at(col("bnds"), i) + 1).as("start"),
            e.as("end")))).as(Seq("chunk_idx", "c")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.start").cast("long").as("start"),
        (col("c.end") - col("c.start") + 1).cast("long").as("len"),
        sha2(col("p").substr(col("c.start"),
          col("c.end") - col("c.start") + 1), 256).as("fp"))
  }

  /** Cross-media shared content-defined chunks — m05's exact-dedup
    * algebra over [[cdcChunks]] fingerprints: shift-invariant partial
    * duplication, the report m08 can only produce for stride-aligned
    * deltas. */
  def cdcSharedChunks(media: DataFrame, idCol: String,
      payloadCol: String): DataFrame =
    cdcChunks(media, idCol, payloadCol)
      .groupBy("fp")
      .agg(countDistinct(col("id")).as("n_media"),
        count(lit(1)).as("n_occurrences"),
        min(col("id")).as("keeper_media"),
        min(col("len")).as("chunk_len"))
      .filter(col("n_media") > 1)

  val queries: Map[String, Q] = Map(
    // m09: shift-invariant shared chunks; the oracle restates the
    // rolling hash directly (O(len·k) — affordable relationally) over
    // the same ASCII bytes and replays the dedup aggregate
    "m09_cdc_chunks" -> ((s, dir) =>
      cdcSharedChunks(syntheticMedia(s, dir), "media_id", "payload")
        .orderBy("fp")),
    // m10: the storage dedup ratio per media — keep-first accounting
    // over the same CDC chunk instances, all exact integers
    "m10_chunk_dedup" -> ((s, dir) =>
      chunkDedupReport(syntheticMedia(s, dir), "media_id", "payload")
        .orderBy("media_id")),
    // m08: overlap pairs over the synthetic payloads — the oracle
    // replays the identical window/df/pair algebra on the text bytes
    // (the corpus is pure ASCII, so character windows ARE the utf-8
    // byte windows)
    "m08_content_overlap" -> ((s, dir) =>
      contentOverlap(syntheticMedia(s, dir), "media_id", "payload")
        .orderBy("id_a", "id_b")),
    "m07_paired_samples" -> ((s, dir) =>
      pairedSamples(s, dir).orderBy("media_id")),
    // metadata + content addressing over binary payloads (oracle: DuckDB
    // computes identical sha256/octet_length over the same utf-8 bytes)
    "m01_media_meta" -> ((s, dir) =>
      syntheticMedia(s, dir).select(
        col("media_id"), col("kind"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("content_sha256"),
        col("width"), col("height"), col("duration_ms"))
        .orderBy("media_id")),
    // per-kind storage/shape profile (agg over multimodal metadata)
    "m02_media_profile" -> ((s, dir) =>
      syntheticMedia(s, dir)
        .groupBy("kind")
        .agg(count(lit(1)).as("n_items"),
          sum(octet_length(col("payload")).cast("long")).as("total_bytes"),
          max(col("width")).as("max_width"),
          min(col("height")).as("min_height"))
        .orderBy("kind")),
    // frame sampling + resize over binary payloads: every 2nd 32-byte
    // chunk, content-addressed — the narrow-map video-frame path with a
    // relational oracle over the same bytes
    // cross-media duplicate frames: the exact-dedup algebra applied to
    // frame fingerprints (intro/outro/black-frame detection at corpus
    // scale) — frames stay narrow until the fingerprint aggregate, and
    // only 32-byte hashes shuffle, never payload bytes
    "m05_frame_dedup" -> ((s, dir) =>
      syntheticMedia(s, dir)
        .select(col("media_id"),
          explode(frameSample(col("payload"), frameSize = 32, stride = 2))
            .as("frame"))
        .select(col("media_id"), sha2(col("frame"), 256).as("fp"))
        .groupBy("fp")
        .agg(
          countDistinct(col("media_id")).as("n_media"),
          count(lit(1)).as("n_occurrences"),
          min(col("media_id")).as("keeper_media"))
        .filter(col("n_media") > 1)
        .orderBy("fp")),
    "m04_frame_sample" -> ((s, dir) =>
      syntheticMedia(s, dir)
        .select(col("media_id"),
          posexplode(frameSample(col("payload"), frameSize = 32, stride = 2))
            .as(Seq("frame_idx", "frame")))
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          octet_length(col("frame")).cast("long").as("frame_bytes"),
          sha2(resizeStub(col("frame"), 16), 256).as("frame_head_sha256"))
        .orderBy("media_id", "frame_idx")),
    // m06: PERCEPTUAL near-dup — frames cluster by block-mean hash, so
    // byte-different frames with the same luminance-relation profile
    // land together (n_exact_fps > 1 rows are precisely the clusters
    // sha256 dedup cannot see). Full frames only: the tail fragment's
    // missing bytes would read as zeros and skew the block relations
    "m06_frame_phash" -> ((s, dir) =>
      syntheticMedia(s, dir)
        .select(col("media_id"),
          explode(frameSample(col("payload"), frameSize = 32, stride = 2))
            .as("bframe"))
        .select(col("media_id"), decode(col("bframe"), "UTF-8").as("frame"))
        .filter(length(col("frame")) === 32)
        .select(col("media_id"), col("frame"),
          blockMeanHash(col("frame"), frameSize = 32, blocks = 8).as("sig"))
        .groupBy("sig")
        .agg(
          countDistinct(col("media_id")).as("n_media"),
          count(lit(1)).as("n_frames"),
          countDistinct(sha2(col("frame"), 256)).as("n_exact_fps"),
          min(col("media_id")).as("keeper_media"))
        .filter(col("n_media") > 1)
        .orderBy("sig")),
    // stub decode through the typed mapPartitions path; f0 is the first
    // feature widened float→double (exact), so the DuckDB oracle can
    // reproduce it bit-for-bit from the payload bytes
    "m03_media_decode" -> ((s, dir) => {
      import s.implicits._
      val media = syntheticMedia(s, dir).as[MediaRecord]
      stubDecode(media)
        .select(col("media_id"), col("kind"), col("n_bytes"),
          element_at(col("features"), 1).cast("double").as("f0"))
        .orderBy("media_id")
    }),
  )

  /** SQL mirror of [[blockMeanHash]] over a string column — the same
    * integer block/total comparison, term for term. */
  private def blockMeanHashSql(f: String, frameSize: Int,
      blocks: Int): String = {
    val chunk = frameSize / blocks
    def bs(b: Int) = (1 to chunk)
      .map(j => s"ascii(substring($f, ${b * chunk + j}, 1))")
      .mkString(" + ")
    val sums = (0 until blocks).map(bs)
    val total = sums.map(s => s"($s)").mkString(" + ")
    (0 until blocks).map(b =>
      s"(CASE WHEN (${sums(b)}) * $blocks >= ($total) " +
        s"THEN ${1L << b} ELSE 0 END)").mkString(" + ")
  }

  /** Per-media STORAGE dedup report over [[cdcChunks]] fingerprints —
    * the "what would content-addressed storage save" statement (the
    * backup/dataset-store dedup ratio): a chunk INSTANCE is redundant
    * iff it is not the globally-first occurrence of its fingerprint
    * under (media, offset) order (keep-first accounting, so
    * `sum(dup_bytes)` IS the byte count a dedup store would not
    * write — within-media repeats included, exactly as a chunk store
    * sees them). Emits per media: n_chunks, n_bytes, dup_chunks,
    * dup_bytes — all exact integers. Payload bytes never shuffle:
    * chunking is narrow/codegen'd, only (fp, offsets, lens) move. */
  def chunkDedupReport(media: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val ch = cdcChunks(media, idCol, payloadCol)
    val keep = ch.groupBy("fp")
      .agg(min(struct(col("id"), col("start"))).as("_k"))
    ch.join(keep, Seq("fp"))
      .withColumn("_red", !(col("id") === col("_k.id") &&
        col("start") === col("_k.start")))
      .groupBy(col("id").as("media_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum("len").as("n_bytes"),
        sum(when(col("_red"), lit(1L)).otherwise(lit(0L)))
          .as("dup_chunks"),
        sum(when(col("_red"), col("len")).otherwise(lit(0L)))
          .as("dup_bytes"))
  }

  /** m09 oracle: the rolling hash restated directly (weight B^j on the
    * j-th byte back from each end position — identical mod-M algebra),
    * boundaries ∪ the final position, chunks sliced by lag, sha256
    * over the same ASCII bytes. */
  /** Shared CDC chunk-instance CTE chain (through `ch`: id, start,
    * len, fp) — the rolling-hash boundary algebra both m09 and m10
    * restate. */
  private def cdcChunkCtesSql(k: Int, base: Int, modulus: Int,
      divisor: Int): String = {
    val pows = (0 until k).map(j => BigInt(base).pow(j))
      .mkString("[", ",", "]")
    s"""d AS (SELECT doc_id AS id, text FROM documents),
       |h AS (SELECT id, p,
       |        list_sum(list_transform(range(0, $k),
       |          j -> ord(substr(text, p - j, 1)) * ($pows)[j + 1]))
       |          % $modulus AS hv
       |      FROM d, unnest(range($k, length(text) + 1)) AS t(p)),
       |bnd AS (SELECT DISTINCT id, p FROM h WHERE hv % $divisor = 0
       |        UNION SELECT id, length(text) FROM d),
       |o AS (SELECT id, p AS e,
       |        lag(p, 1, 0) OVER (PARTITION BY id ORDER BY p) AS prev
       |      FROM bnd),
       |ch AS (SELECT o.id, prev + 1 AS start, e - prev AS len,
       |         sha256(substr(d.text, prev + 1, e - prev)) AS fp
       |       FROM o JOIN d USING (id))""".stripMargin
  }

  private def m09OracleSql(k: Int, base: Int, modulus: Int,
      divisor: Int): String =
    s"""WITH ${cdcChunkCtesSql(k, base, modulus, divisor)}
       |SELECT fp, COUNT(DISTINCT id) AS n_media,
       |  COUNT(*) AS n_occurrences, MIN(id) AS keeper_media,
       |  MIN(len) AS chunk_len
       |FROM ch GROUP BY fp HAVING COUNT(DISTINCT id) > 1
       |ORDER BY fp""".stripMargin

  /** m10 oracle: the same chunk instances, keep-first redundancy
    * (row_number over (id, start) per fingerprint), per-media byte
    * accounting. */
  private def m10OracleSql(k: Int, base: Int, modulus: Int,
      divisor: Int): String =
    s"""WITH ${cdcChunkCtesSql(k, base, modulus, divisor)},
       |r AS (SELECT id, len, row_number() OVER (PARTITION BY fp
       |        ORDER BY id, start) AS rn FROM ch)
       |SELECT id AS media_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |  CAST(SUM(len) AS BIGINT) AS n_bytes,
       |  CAST(SUM(CASE WHEN rn >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS dup_chunks,
       |  CAST(SUM(CASE WHEN rn >= 2 THEN len ELSE 0 END) AS BIGINT)
       |    AS dup_bytes
       |FROM r GROUP BY id ORDER BY media_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "m09_cdc_chunks" -> m09OracleSql(k = 8, base = 31,
      modulus = 1 << 20, divisor = 16),
    "m10_chunk_dedup" -> m10OracleSql(k = 8, base = 31,
      modulus = 1 << 20, divisor = 16),
    // ASCII corpus: substr over text == the engine's byte windows
    "m08_content_overlap" ->
      """WITH w AS (
        |  SELECT DISTINCT doc_id AS id, substr(text, p * 8 + 1, 32) AS win
        |  FROM documents,
        |       unnest(range(0, greatest((length(text) - 32) // 8, 0) + 1))
        |         AS t(p)
        |  WHERE length(substr(text, p * 8 + 1, 32)) = 32),
        |keep AS (SELECT win FROM w GROUP BY win
        |         HAVING COUNT(*) > 1 AND COUNT(*) <= 20),
        |sh AS (SELECT id, win FROM w SEMI JOIN keep USING (win))
        |SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_shared
        |FROM sh a JOIN sh b ON a.win = b.win AND a.id < b.id
        |GROUP BY 1, 2
        |HAVING COUNT(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,
    // both gate expressions replayed verbatim; kind/width/height are
    // m01's derivations
    "m07_paired_samples" ->
      s"""WITH m AS (SELECT doc_id AS media_id,
         |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)]
         |      AS kind,
         |    octet_length(encode(text)) AS n_bytes,
         |    CAST(n_chars % 64 + 1 AS INT) AS width,
         |    CAST(n_chars % 48 + 1 AS INT) AS height,
         |    n_chars * 10 AS duration_ms
         |  FROM documents),
         |c AS (SELECT doc_id, lang,
         |    CAST(len(${graft.text.TextAnalysis.toksSql}) AS BIGINT)
         |      AS n_caption_tokens
         |  FROM documents)
         |SELECT media_id, kind, lang, n_caption_tokens, n_bytes,
         |       width, height
         |FROM m JOIN c ON media_id = c.doc_id
         |WHERE n_caption_tokens BETWEEN 25 AND 80
         |  AND duration_ms >= 1000
         |ORDER BY media_id""".stripMargin,
    "m06_frame_phash" ->
      s"""WITH f AS (
         |  SELECT doc_id AS media_id,
         |    substring(text, CAST(i * 64 + 1 AS INT), 32) AS frame
         |  FROM documents,
         |       unnest(generate_series(0, greatest((length(text) - 1) // 64, 0))) AS t(i)),
         |ff AS (SELECT media_id, frame FROM f WHERE length(frame) = 32),
         |sigs AS (SELECT media_id, frame,
         |           CAST(${blockMeanHashSql("frame", 32, 8)} AS BIGINT)
         |             AS sig
         |         FROM ff)
         |SELECT sig,
         |  CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
         |  COUNT(*) AS n_frames,
         |  CAST(COUNT(DISTINCT sha256(frame)) AS BIGINT) AS n_exact_fps,
         |  MIN(media_id) AS keeper_media
         |FROM sigs GROUP BY 1
         |HAVING COUNT(DISTINCT media_id) > 1
         |ORDER BY sig""".stripMargin,
    "m01_media_meta" ->
      """SELECT doc_id AS media_id,
        |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |  octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS content_sha256,
        |  CAST(n_chars % 64 + 1 AS INT) AS width,
        |  CAST(n_chars % 48 + 1 AS INT) AS height,
        |  n_chars * 10 AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,
    "m02_media_profile" ->
      """SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  MAX(CAST(n_chars % 64 + 1 AS INT)) AS max_width,
        |  MIN(CAST(n_chars % 48 + 1 AS INT)) AS min_height
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin,
    // frames start every frameSize×stride = 64 bytes; ASCII text (see
    // m03 note) makes char slicing == byte slicing
    "m05_frame_dedup" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id,
        |    substring(text, CAST(i * 64 + 1 AS INT), 32) AS frame
        |  FROM documents,
        |       unnest(generate_series(0, greatest((length(text) - 1) // 64, 0))) AS t(i))
        |SELECT sha256(frame) AS fp,
        |  CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
        |  COUNT(*) AS n_occurrences,
        |  MIN(media_id) AS keeper_media
        |FROM f GROUP BY 1
        |HAVING COUNT(DISTINCT media_id) > 1
        |ORDER BY fp""".stripMargin,
    "m04_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id, i AS frame_idx,
        |    substring(text, CAST(i * 64 + 1 AS INT), 32) AS frame
        |  FROM documents,
        |       unnest(generate_series(0, greatest((length(text) - 1) // 64, 0))) AS t(i))
        |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(length(frame) AS BIGINT) AS frame_bytes,
        |  sha256(substring(frame, 1, 16)) AS frame_head_sha256
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    // the stub decoder's byte fold, restated relationally: f0 sums the
    // payload bytes at positions p with (p-1) % 16 = 0 (1-based), in
    // position order (list_sum is the same sequential fold as the
    // engine's while-loop), /255.0 each, divided by max(1, len/16),
    // then narrowed to float exactly like the engine's .toFloat.
    // Document text is pure ASCII (verified across SFs), so
    // ascii(text[p]) IS the utf-8 payload byte.
    "m03_media_decode" ->
      """SELECT doc_id AS media_id,
        |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |  octet_length(encode(text)) AS n_bytes,
        |  CAST(CAST(
        |    COALESCE(list_sum(list_transform(
        |      list_filter(generate_series(1, length(text)),
        |                  p -> (p - 1) % 16 = 0),
        |      p -> ascii(text[p]) / 255.0)), 0.0)
        |    / greatest(length(text) // 16, 1) AS REAL) AS DOUBLE) AS f0
        |FROM documents ORDER BY media_id""".stripMargin,
  )
}
