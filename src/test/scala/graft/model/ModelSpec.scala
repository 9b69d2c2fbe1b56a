package graft.model

import graft.SparkSpec
import org.apache.spark.sql.Row

class ModelSpec extends SparkSpec {
  import spark.implicits._

  // Nullable copy: raw external input may carry nulls; validation is what
  // rejects them (the declared schema is the post-validation contract).
  private val rawSchema = org.apache.spark.sql.types.StructType(
    Model.dcaOrderSchema.map(_.copy(nullable = true)))

  private def configDf(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), rawSchema)

  private val good = Row("kraken", "buy", "market", "10", "ADAGBP", true, true)

  test("dcaOrderValid accepts the reference example config row") {
    // mirrors pkg/configuration/example_config.json
    val (valid, invalid) = Model.validateConfig(configDf(Seq(good)))
    assert(valid.count() === 1)
    assert(invalid.count() === 0)
  }

  test("dcaOrderValid rejects each JSON-Schema violation (P6)") {
    val bad = Seq(
      Row("binance", "buy", "market", "10", "ADAGBP", true, true),   // exchange enum
      Row("kraken", "hold", "market", "10", "ADAGBP", true, true),   // direction enum
      Row("kraken", "buy", "stop", "10", "ADAGBP", true, true),      // ordertype enum
      Row("kraken", "buy", "market", "1.5", "ADAGBP", true, true),   // volume regex
      Row("kraken", "buy", "market", "ten", "ADAGBP", true, true),   // volume regex
      Row("kraken", "buy", "market", "10", "", true, true),          // empty pair
      Row("kraken", "buy", "market", "10", null, true, true),        // null pair
    )
    val (valid, invalid) = Model.validateConfig(configDf(bad))
    assert(valid.count() === 0)
    assert(invalid.count() === bad.size.toLong)
  }

  test("validateConfig is a partition: valid + invalid = all") {
    val all = configDf(Seq(
      good,
      Row("kraken", "sell", "limit", "3", "BTCUSD", false, false),
      Row("nope", "buy", "market", "10", "ADAGBP", true, true)))
    val (valid, invalid) = Model.validateConfig(all)
    assert(valid.count() + invalid.count() === all.count())
  }

  test("transactions schema matches SURVEY §1.3 (names, order, types)") {
    val names = Model.transactionsSchema.fields.map(_.name).toSeq
    assert(names === Seq("transaction_id", "exchange_status", "pair",
      "order_type", "type", "price", "fee", "volume",
      "open_time", "close_time", "exchange"))
    assert(Model.transactionsSchema("price").dataType === Model.money)
  }

  test("typed datasets round-trip through their encoders") {
    val orders = Seq(Model.DcaOrder("kraken", "buy", "market", "10",
      "ADAGBP", validate = true, enabled = true)).toDS()
    assert(orders.collect().head.pair === "ADAGBP")
    val pending = Seq(Model.PendingOrder("TX1", "bucket", "key",
      "kraken", real = true)).toDS()
    assert(pending.schema.fieldNames.toSeq ===
      Model.pendingOrderSchema.fieldNames.toSeq)
  }
}
