package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, sfDir)

  test("syntheticMedia: binary payload + typed metadata schema") {
    val sch = media.schema
    assert(sch("payload").dataType ===
      org.apache.spark.sql.types.BinaryType)
    assert(media.count() === 500)
    assert(media.select("kind").distinct().as[String].collect().toSet ===
      Set("image", "audio", "video"))
  }

  test("stubDecode: fixed feature shape, deterministic, batched path") {
    val feats = Multimodal.stubDecode(media.as[Multimodal.MediaRecord])
    val rows = feats.collect()
    assert(rows.length === 500)
    assert(rows.forall(_.features.length === Multimodal.featureDim))
    val again = Multimodal.stubDecode(media.as[Multimodal.MediaRecord])
      .collect()
    assert(rows.map(r => r.media_id -> r.features.toSeq).toMap ===
      again.map(r => r.media_id -> r.features.toSeq).toMap)
  }

  test("MediaCodec seam: trait path == the inline stub, byte-equal") {
    // the production seam with the shipped stub codec must reproduce
    // the inline path exactly — a real codec swap changes decode
    // arithmetic only, never pipeline semantics (the ExchangeClient
    // discipline applied to decoding)
    val viaSeam = Multimodal.codecDecode(
      media.as[Multimodal.MediaRecord], () => new StubMediaCodec)
      .collect().map(r => r.media_id ->
        (r.kind, r.n_bytes, r.features.toSeq)).toMap
    val inline = Multimodal.stubDecode(media.as[Multimodal.MediaRecord])
      .collect().map(r => r.media_id ->
        (r.kind, r.n_bytes, r.features.toSeq)).toMap
    assert(viaSeam === inline)
  }

  test("MediaCodec lifecycle: one codec per partition, closed even on " +
      "early termination") {
    MultimodalSpec.codecInits.set(0)
    MultimodalSpec.codecCloses.set(0)
    val two = media.as[Multimodal.MediaRecord].repartition(2)
    Multimodal.codecDecode(two, () => new CountingStubCodec).count()
    assert(MultimodalSpec.codecInits.get() === 2)
    assert(MultimodalSpec.codecCloses.get() === 2)
    MultimodalSpec.codecInits.set(0)
    MultimodalSpec.codecCloses.set(0)
    val one = media.as[Multimodal.MediaRecord].coalesce(1)
    Multimodal.codecDecode(one, () => new CountingStubCodec)
      .limit(1).count()
    assert(MultimodalSpec.codecInits.get() ===
      MultimodalSpec.codecCloses.get(),
      "every constructed codec must close when the consumer stops early")
  }

  test("stubDecode feature values bounded by construction (bytes/255)") {
    val feats = Multimodal.stubDecode(media.as[Multimodal.MediaRecord])
    assert(feats.collect().forall(_.features.forall(f => f >= 0f && f <= 2f)))
  }

  test("frameSample chunks the payload at the stride") {
    val df = Seq(("a" * 64)).toDF("text")
      .select(encode($"text", "UTF-8").as("payload"))
    val frames = df.select(Multimodal.frameSample($"payload", 8, 2).as("f"))
      .select(size($"f")).as[Int].head()
    // 64 bytes, frame 8, stride 2 → frames at offsets 0,16,32,48 (+1 pad)
    assert(frames === 4 || frames === 5)
  }

  test("blockMeanHash: perceptual — byte-different frames can share a signature") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two frames differing in ONE byte (block/mean relations keep their
    // margin) collide; a frame with a different profile does not. The
    // alternating heavy/light blocks give each relation a wide margin —
    // a uniform frame would sit exactly ON the mean, where any single
    // byte flips every bit
    val a = "zzzzaaaa" * 4               // heavy/light alternating
    val b = "yzzzaaaa" + "zzzzaaaa" * 3  // one byte lower: margins hold
    val c = "zzzz" + "aaaa" * 7          // heavy first block only
    val df = Seq(a, b, c).toDF("frame")
      .select(col("frame"),
        Multimodal.blockMeanHash(col("frame"), 32, 8).as("sig"))
    val sigs = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sigs(a) === sigs(b))
    assert(sigs(a) !== sigs(c))
    // and on the corpus the m06 clusters really do merge frames sha256
    // considers distinct (that is the operator's reason to exist)
    val out = Multimodal.queries("m06_frame_phash")(spark, sfDir)
    assert(out.filter(col("n_exact_fps") > 1).count() > 0)
  }

  test("m07: pairing gates genuinely select — neither empty nor vacuous") {
    val all = graft.Tables.documents(spark, sfDir).count()
    val kept = Multimodal.pairedSamples(spark, sfDir).count()
    assert(kept > 0 && kept < all, s"kept $kept of $all")
    // every kind survives (the gates are modality-blind)
    assert(Multimodal.pairedSamples(spark, sfDir)
      .select("kind").distinct().count() === 3)
  }

  test("resizeStub truncates to target bytes") {
    val df = Seq(("abcdefgh")).toDF("text")
      .select(encode($"text", "UTF-8").as("payload"))
    val n = df.select(octet_length(Multimodal.resizeStub($"payload", 4)))
      .as[Int].head()
    assert(n === 4)
  }

  test("m08: embedded content found at stride-aligned deltas — and only those") {
    // payload B embeds a 200-byte region of A at delta 16 (≡ 0 mod 8):
    // every aligned window of the region matches → a strong pair.
    // payload C embeds the same region at delta 3: per the documented
    // offset contract the aligned windows never line up — no pair.
    // D is unrelated and must pair with nothing.
    def bytes(s: String) = s.getBytes("UTF-8")
    val region = (0 until 200).map(i => ('a' + (i * 7 % 26)).toChar)
      .mkString
    val junk1 = (0 until 16).map(i => ('0' + (i % 10)).toChar).mkString
    val junk2 = (0 until 3).map(_ => 'z').mkString
    val rows = Seq(
      (1L, bytes(region + "tailtailtail")),
      (2L, bytes(junk1 + region)),          // delta 16: caught
      (3L, bytes(junk2 + region)),          // delta 3: structurally missed
      (4L, bytes("completely unrelated payload body with no overlap at all"))
    ).toDF("media_id", "payload")
    val out = Multimodal.contentOverlap(rows, "media_id", "payload",
      windowBytes = 32, stride = 8, maxDf = 20, minShared = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L)))
    assert(!out.contains((1L, 3L)))
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L))
    // stride 1 = full shift-invariance: now the delta-3 embed is found
    val dense = Multimodal.contentOverlap(rows, "media_id", "payload",
      windowBytes = 32, stride = 1, maxDf = 20, minShared = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dense.contains((1L, 3L)))
  }

  test("m09: content-defined chunks are shift-invariant — delta 3 caught") {
    // the SAME region embedded at deltas 16 AND 3: CDC boundaries move
    // with the content, so both embeds share interior chunk
    // fingerprints with the original — including the delta-3 case the
    // stride-8 window detector (m08 spec above) structurally misses
    def bytes(s: String) = s.getBytes("UTF-8")
    // aperiodic region: a short-period pattern can dodge every
    // boundary condition (hash sequence inherits the period), leaving
    // zero interior chunks to share — seeded Random is deterministic
    // (JDK-specified LCG) and boundary-dense
    val rnd = new scala.util.Random(42)
    val region = (0 until 200).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString
    val rows = Seq(
      (1L, bytes(region + "tailtailtail")),
      (2L, bytes("0123456789012345" + region)), // delta 16
      (3L, bytes("zzz" + region)),              // delta 3
      (4L, bytes("completely unrelated payload body with no overlap"))
    ).toDF("media_id", "payload")
    val chunks = Multimodal.cdcChunks(rows, "media_id", "payload")
    // chunk slicing is exact: per payload, chunks tile [1, len]
    val tiles = chunks.groupBy("id")
      .agg(min($"start").as("mn"), max($"start" + $"len" - 1).as("mx"),
        sum($"len").as("total"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("mn"), r.getAs[Long]("mx"), r.getAs[Long]("total")))
      .toMap
    rows.select($"media_id", octet_length($"payload").cast("long"))
      .as[(Long, Long)].collect().foreach { case (id, len) =>
        assert(tiles(id) === ((1L, len, len)), s"media $id mis-tiled")
      }
    val shared = Multimodal.cdcSharedChunks(rows, "media_id", "payload")
    val byFp = chunks.select($"id", $"fp").as[(Long, String)]
      .collect().groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    def pairShares(a: Long, b: Long) =
      byFp.values.count(s => s.contains(a) && s.contains(b))
    assert(pairShares(1L, 2L) >= 2, "delta-16 embed must share chunks")
    assert(pairShares(1L, 3L) >= 2, "delta-3 embed must share chunks")
    assert(pairShares(1L, 4L) === 0)
    assert(shared.count() > 0)
  }

  test("m09: empty payloads chunk as one zero-length chunk (oracle contract)") {
    // The m09 oracle's `UNION SELECT id, length(text)` emits a boundary
    // even for len=0 — one zero-length chunk fp=sha256(''). The engine
    // must agree, or two empty payloads are invisible to chunk dedup
    // while the oracle reports their shared empty chunk.
    val rows = Seq(
      (1L, Array.empty[Byte]),
      (2L, Array.empty[Byte]),
      (3L, "some actual content here".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val chunks = Multimodal.cdcChunks(rows, "media_id", "payload")
      .filter($"id" <= 2L)
      .select($"id", $"chunk_idx", $"start", $"len", $"fp")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    val shaEmpty =
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    assert(chunks.toSeq === Seq(
      (1L, 0L, 1L, 0L, shaEmpty), (2L, 0L, 1L, 0L, shaEmpty)))
    val shared = Multimodal.cdcSharedChunks(rows, "media_id", "payload")
      .select($"fp", $"n_media", $"keeper_media")
      .as[(String, Long, Long)].collect()
    assert(shared.toSeq === Seq((shaEmpty, 2L, 1L)))
  }

  test("m10 chunkDedupReport: chunks partition every payload exactly; " +
      "keep-first accounting — an identical copy is fully redundant, " +
      "the first copy fully kept") {
    val rows = Seq(
      (1L, ("unique prefix " + "shared tail content " * 8).getBytes("UTF-8")),
      (2L, ("unique prefix " + "shared tail content " * 8).getBytes("UTF-8")),
      (3L, "completely unrelated bytes with no repeats".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val r = Multimodal.chunkDedupReport(rows, "media_id", "payload")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // chunks PARTITION the payload: per-media byte totals are exact
    val lens = rows.collect()
      .map(x => x.getLong(0) -> x.getAs[Array[Byte]](1).length.toLong).toMap
    for ((id, (_, nBytes, _, _)) <- r)
      assert(nBytes === lens(id), s"media $id bytes")
    // media 2 is byte-identical to media 1: every chunk instance is a
    // later copy — fully redundant; media 1 holds every keeper
    assert(r(2L)._3 === r(2L)._1, "all of media 2's chunks redundant")
    assert(r(2L)._4 === r(2L)._2, "all of media 2's bytes redundant")
    assert(r(1L)._3 < r(1L)._1,
      "media 1 keeps at least one keeper chunk")
    // media 3 shares nothing (unless its content self-repeats — it
    // doesn't at this chunk grain)
    assert(r(3L)._3 === 0L && r(3L)._4 === 0L)
    // global identity: kept instances == distinct fingerprints
    val ch = Multimodal.cdcChunks(rows, "media_id", "payload")
    val distinctFps = ch.select("fp").distinct().count()
    val kept = r.values.map(v => v._1 - v._3).sum
    assert(kept === distinctFps)
  }
}

/** JVM-global lifecycle counters — executor threads share this JVM in
  * local mode (the OrderPipelineSpec counting pattern). */
object MultimodalSpec {
  val codecInits = new java.util.concurrent.atomic.AtomicInteger(0)
  val codecCloses = new java.util.concurrent.atomic.AtomicInteger(0)
}

class CountingStubCodec extends StubMediaCodec {
  MultimodalSpec.codecInits.incrementAndGet()
  override def close(): Unit = {
    MultimodalSpec.codecCloses.incrementAndGet()
    super.close()
  }
}
