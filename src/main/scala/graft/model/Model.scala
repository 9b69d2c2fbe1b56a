package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical schemas and typed rows of the DCA domain (SURVEY.md §1).
  *
  * Derived from the reference's data model:
  *  - config order: `pkg/configuration/dca.go:25-38` + JSON Schema
  *    `pkg/configuration/schema.json:12-67`
  *  - order fulfillment: `pkg/orders/common.go:15-19`
  *  - queue control record: `pkg/orders/common.go:30-34`
  *  - fact record: `pkg/orders/common.go:39-50`
  *
  * Decimal policy (SURVEY §1.2): the engine core keeps DECIMAL(38,18) for
  * price/fee/volume (the reference's Go model uses shopspring/decimal);
  * the reference lake downgrades to double — we expose that as a view,
  * not as the stored type.
  */
object Model {

  /** One configured DCA order (`DCAConfig.orders[i]`). */
  final case class DcaOrder(
      exchange: String,
      direction: String,
      ordertype: String,
      volume: String,
      pair: String,
      validate: Boolean,
      enabled: Boolean)

  /** Exchange fulfillment: txid + stamp + opaque raw payload JSON
    * (`OrderFufilled.Result` is `interface{}` in the reference). */
  final case class OrderFulfilled(
      transaction_id: String,
      timestamp: Long,
      result: String)

  /** Queue control record (`PendingOrders` + its message attributes). */
  final case class PendingOrder(
      transaction_id: String,
      s3_bucket: String,
      s3_key: String,
      exchange: String,
      real: Boolean)

  /** The fact record (`OrderComplete`), pre-normalization: decimals are
    * strings (shopspring serialization), times are unix seconds. */
  final case class OrderCompleteRaw(
      transaction_id: String,
      exchange_status: String,
      pair: String,
      order_type: String,
      `type`: String,
      price: String,
      fee: String,
      volume: String,
      open_time: Double,
      close_time: Double)

  val dcaOrderSchema: StructType = StructType(Seq(
    StructField("exchange", StringType, nullable = false),
    StructField("direction", StringType, nullable = false),
    StructField("ordertype", StringType, nullable = false),
    StructField("volume", StringType, nullable = false),
    StructField("pair", StringType, nullable = false),
    StructField("validate", BooleanType, nullable = false),
    StructField("enabled", BooleanType, nullable = false)))

  /** `config.json` document: `{"orders": [...]}` (schema.json:3-10). */
  val dcaConfigSchema: StructType =
    StructType(Seq(StructField("orders", ArrayType(dcaOrderSchema))))

  val orderFulfilledSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("timestamp", LongType),
    StructField("result", StringType)))

  val pendingOrderSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("s3_bucket", StringType),
    StructField("s3_key", StringType),
    StructField("exchange", StringType),
    StructField("real", BooleanType)))

  /** Raw completed-transaction JSON as serialized by the reference
    * (FIXTURES.md §4): decimal fields as strings, times as double unix s. */
  val orderCompleteRawSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("exchange_status", StringType),
    StructField("pair", StringType),
    StructField("order_type", StringType),
    StructField("type", StringType),
    StructField("price", StringType),
    StructField("fee", StringType),
    StructField("volume", StringType),
    StructField("open_time", DoubleType),
    StructField("close_time", DoubleType)))

  /** Engine-core money type (SURVEY §1.2). */
  val money: DecimalType = DecimalType(38, 18)

  /** The loaded `transactions` fact-table schema (SURVEY §1.3), decimal
    * core variant; `exchange` arrives via additional-columns injection. */
  val transactionsSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("exchange_status", StringType),
    StructField("pair", StringType),
    StructField("order_type", StringType),
    StructField("type", StringType),
    StructField("price", money),
    StructField("fee", money),
    StructField("volume", money),
    StructField("open_time", TimestampType),
    StructField("close_time", TimestampType),
    StructField("exchange", StringType)))

  // ---- Validation (P6: the JSON-Schema constraint set as predicates) ----

  val knownExchanges: Seq[String] = Seq("kraken")

  /** Row-level validity predicate mirroring
    * `pkg/configuration/schema.json:12-67`: enum membership, volume
    * regex `[0-9]+`, all fields required. */
  def dcaOrderValid: Column =
    col("exchange").isin(knownExchanges: _*) &&
      col("direction").isin("buy", "sell") &&
      col("ordertype").isin("market", "limit") &&
      col("volume").rlike("^[0-9]+$") &&
      col("pair").isNotNull && length(col("pair")) > 0 &&
      col("validate").isNotNull && col("enabled").isNotNull

  /** Split a config dataset into (valid, invalid) side-outputs. */
  def validateConfig(ds: DataFrame): (DataFrame, DataFrame) =
    (ds.filter(dcaOrderValid), ds.filter(!coalesce(dcaOrderValid, lit(false))))
}
