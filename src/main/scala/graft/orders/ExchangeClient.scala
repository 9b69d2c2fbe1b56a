package graft.orders

/** The production order-placement seam (S3): the reference calls the
  * exchange REST API per order (`pkg/orders/kraken.go:49-74` via the
  * `Orderer` interface, `pkg/orders/factory.go:21-36`); on this engine
  * that call sits behind this trait inside a `mapPartitions`
  * enrichment — ONE client per partition (amortized connection /
  * auth-session setup, the shape any HTTP or JNI integration needs),
  * closed when the partition drains. The sandbox has no egress, so the
  * only shipped implementation is [[FakeExchangeClient]], which
  * reproduces [[OrderPipeline.fakeFulfill]]'s deterministic contract
  * byte-for-byte — the spec pins the two paths equal, so swapping in a
  * real client changes transport, not pipeline semantics. */
trait ExchangeClient extends java.io.Closeable {

  /** Place (or validate-only) one order; a validate-only call returns
    * no transaction id — the reference passes `DCAOrder.Validate`
    * through to the exchange (`pkg/configuration/dca.go:36`). */
  def placeOrder(pair: String, direction: String, ordertype: String,
      volume: String, validateOnly: Boolean): ExchangeClient.Placed

  override def close(): Unit = ()
}

object ExchangeClient {
  /** One placement response: txid (absent for validate-only),
    * exchange timestamp, raw result payload (JSON). */
  final case class Placed(transactionId: Option[String], timestamp: Long,
      result: String)
}

/** Deterministic fake — the JVM twin of the [[OrderPipeline.fakeFulfill]]
  * expression (same crc32-derived txid, same fixed stamp, same result
  * JSON shape as `pkg/orders/fake.go:11-34`). */
class FakeExchangeClient extends ExchangeClient {

  override def placeOrder(pair: String, direction: String,
      ordertype: String, volume: String,
      validateOnly: Boolean): ExchangeClient.Placed = {
    val txid =
      if (validateOnly) None
      else {
        val crc = new java.util.zip.CRC32
        crc.update(Seq(pair, direction, ordertype, volume)
          .mkString("|").getBytes("UTF-8"))
        Some(s"FAKE-$pair-" +
          java.lang.Long.toHexString(crc.getValue).toUpperCase)
      }
    val result =
      s"""{"asset_pair":"$pair",""" +
        s""""order":"$direction $volume $pair @ $ordertype",""" +
        s""""order_type":"$ordertype","type":"$direction"}"""
    ExchangeClient.Placed(txid, 12345678L, result)
  }
}
