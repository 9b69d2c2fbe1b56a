package graft.multimodal

/** The production media-decode seam — the multimodal twin of
  * [[graft.orders.ExchangeClient]] (S3's pattern applied to codecs):
  * the decode stage runs ONE codec instance per partition inside a
  * `mapPartitions` ([[Multimodal.codecDecode]]) — amortized library /
  * JNI / py-worker init, closed via the task-completion listener on
  * drain, early termination, and failure alike.
  *
  * The sandbox ships no image/audio libraries, so the only shipped
  * implementation is [[StubMediaCodec]], which reproduces
  * [[Multimodal.stubDecode]]'s deterministic byte-mix contract
  * exactly — the spec pins the two paths equal, so dropping in a real
  * codec (JPEG/PNG via ImageIO, audio via JavaSound/FFI) changes the
  * decode arithmetic only, never the plan shape: schema, batching,
  * partitioning, and the downstream feature consumers (m03's oracle
  * included) are untouched.
  *
  * Scale shape: same as every multimodal stage — the codec runs inside
  * the narrow scan map, payload bytes never shuffle, only the
  * fixed-width feature vectors move downstream. */
trait MediaCodec extends java.io.Closeable {

  /** Decode one media record's payload into the engine's fixed-shape
    * feature vector (length [[Multimodal.featureDim]]). Implementations
    * may hold per-instance scratch (decode buffers, codec contexts) —
    * instances are confined to one partition's task thread. */
  def decode(record: Multimodal.MediaRecord): Multimodal.MediaFeatures

  override def close(): Unit = ()
}

/** Deterministic stub — the codec-seam twin of the inline
  * [[Multimodal.stubDecode]] arithmetic: a rolling byte mix folded into
  * `featureDim` DOUBLE accumulators, narrowed to float once at the end
  * (the double-fold-then-narrow contract m03's DuckDB oracle
  * reproduces bit-for-bit). */
class StubMediaCodec extends MediaCodec {

  override def decode(
      m: Multimodal.MediaRecord): Multimodal.MediaFeatures = {
    val acc = new Array[Double](Multimodal.featureDim)
    var i = 0
    while (i < m.payload.length) {
      acc(i % Multimodal.featureDim) += (m.payload(i) & 0xFF) / 255.0
      i += 1
    }
    val n = math.max(1, m.payload.length / Multimodal.featureDim)
    Multimodal.MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
      acc.map(v => (v / n).toFloat))
  }
}
