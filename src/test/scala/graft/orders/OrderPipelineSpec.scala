package graft.orders

import graft.SparkSpec
import graft.model.Model
import graft.load.LoadTransactions
import org.apache.spark.sql.functions._

/** Order-pipeline semantics vs the reference's unit-test surface
  * (`cmd/execute_orders/main_test.go`, `cmd/process_orders/main_test.go`,
  * `pkg/orders/kraken_test.go`). */
class OrderPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def config(rows: (String, String, String, String, String, Boolean, Boolean)*) =
    rows.toDF("exchange", "direction", "ordertype", "volume", "pair",
      "validate", "enabled")

  // validate=false: a placeable order (validate-only orders are checked
  // against the exchange but never placed — kraken.go:49-54)
  private val goodRow = ("kraken", "buy", "market", "10", "ADAGBP", false, true)

  test("readConfig parses the reference example config shape (S1)") {
    val dir = tmpDir("config")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "config.json"),
      """{"orders":[{"exchange":"kraken","direction":"buy","ordertype":"market","volume":"5","pair":"ADAGBP","validate":true,"enabled":true}]}""")
    val cfg = OrderPipeline.readConfig(spark, dir)
    assert(cfg.schema.fieldNames.toSeq === Seq("exchange", "direction",
      "ordertype", "volume", "pair", "validate", "enabled"))
    val (valid, invalid) = Model.validateConfig(cfg)
    assert(valid.count() === 1 && invalid.count() === 0)
  }

  test("executeOrders skips disabled orders (P1) and emits pending keys") {
    val (fulfilled, pending) = OrderPipeline.executeOrders(spark,
      config(goodRow, ("kraken", "sell", "limit", "5", "BTCGBP", true, false)))
    assert(fulfilled.count() === 1)
    val p = pending.collect().head
    // exact reference key layout: prefix/exchange=kraken/<txid>.json
    val key = p.getAs[String]("s3_key")
    assert(key.startsWith("transactions/status=pending/exchange=kraken/"))
    assert(key.endsWith(".json"))
    assert(p.getAs[String]("transaction_id").nonEmpty)
  }

  test("validate-only orders get no txid and skip the pending sink") {
    // mirrors pkg/orders/kraken_test.go:29-68 / kraken.go:49-54: the
    // validate flag reaches the exchange call, and a validate-only
    // order places nothing
    val validateOnly = ("kraken", "buy", "market", "10", "ETHGBP", true, true)
    val (fulfilled, pending) = OrderPipeline.executeOrders(spark,
      config(goodRow, validateOnly))
    assert(fulfilled.count() === 1)
    assert(fulfilled.filter($"pair" === "ETHGBP").count() === 0)
    assert(pending.count() === 1)
    // the raw fulfillment view still shows the validated order, txid-less
    val raw = OrderPipeline.fakeFulfill(config(validateOnly)).collect().head
    assert(raw.isNullAt(raw.fieldIndex("transaction_id")))
  }

  test("S3 seam: mapPartitions client == the fakeFulfill expression") {
    // the production seam with the deterministic fake client must
    // reproduce the expression path byte-for-byte — swapping in a real
    // client changes transport, never pipeline semantics
    val cfg = config(goodRow,
      ("kraken", "sell", "limit", "5", "BTCGBP", false, true),
      ("kraken", "buy", "market", "10", "ETHGBP", true, true),
      ("coinbase", "buy", "market", "2", "SOLUSD", false, true))
    val viaExpr = OrderPipeline.fakeFulfill(cfg).collect().toSet
    val viaClient = OrderPipeline
      .clientFulfill(cfg, () => new FakeExchangeClient).collect().toSet
    assert(viaClient === viaExpr)
  }

  test("S3 seam: one client per partition, closed after the drain") {
    OrderPipelineSpec.inits.set(0)
    OrderPipelineSpec.closes.set(0)
    val cfg = config(goodRow,
      ("kraken", "sell", "limit", "5", "BTCGBP", false, true),
      ("coinbase", "buy", "market", "2", "SOLUSD", false, true))
      .repartition(2)
    val n = OrderPipeline
      .clientFulfill(cfg, () => new CountingFakeClient).count()
    assert(n === 3)
    // lifecycle contract: exactly one init and one close per partition
    // (per-record construction is what kills a real HTTP client)
    assert(OrderPipelineSpec.inits.get() === 2)
    assert(OrderPipelineSpec.closes.get() === 2)
  }

  test("S3 seam: client closes even when the consumer stops early") {
    // limit(1) on a single partition means the iterator never drains;
    // the task-completion listener must still close the client — a
    // lazily-appended `++ {close}` suffix would leak a real HTTP client
    OrderPipelineSpec.inits.set(0)
    OrderPipelineSpec.closes.set(0)
    val cfg = config(goodRow,
      ("kraken", "sell", "limit", "5", "BTCGBP", false, true),
      ("coinbase", "buy", "market", "2", "SOLUSD", false, true))
      .coalesce(1)
    val n = OrderPipeline
      .clientFulfill(cfg, () => new CountingFakeClient).limit(1).count()
    assert(n === 1)
    assert(OrderPipelineSpec.inits.get() === OrderPipelineSpec.closes.get(),
      "every constructed client must be closed on early termination")
  }

  test("executeOrders fails on unregistered exchange (P4)") {
    val e = intercept[IllegalArgumentException] {
      OrderPipeline.executeOrders(spark,
        config(("binance", "buy", "market", "10", "ADAGBP", true, true)))
    }
    assert(e.getMessage.contains("binance"))
  }

  test("fakeFulfill is deterministic across replays (S6)") {
    val a = OrderPipeline.fakeFulfill(config(goodRow)).collect()
    val b = OrderPipeline.fakeFulfill(config(goodRow)).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.head.getAs[Long]("timestamp") === 12345678L)
  }

  test("writePartitionedJson produces exchange= hive layout (S9)") {
    val dir = tmpDir("pending")
    val (fulfilled, _) = OrderPipeline.executeOrders(spark, config(goodRow))
    OrderPipeline.writePartitionedJson(fulfilled, dir)
    assert(new java.io.File(s"$dir/exchange=kraken").exists())
    val back = spark.read.schema(Model.orderFulfilledSchema)
      .json(s"$dir/exchange=kraken")
    assert(back.count() === 1)
  }

  private def details(txid: String) = Seq(
    (txid, "closed", "ADAGBP", "market", "buy", 0.5, 0.01, 10.0,
      1.7e9, 1.7e9 + 1)
  ).toDF("transaction_id", "status", "descr_pair", "descr_ordertype",
    "descr_type", "price", "fee", "vol_exec", "opentm", "closetm")

  private def pendingRows(rows: (String, String, String, String, Boolean)*) =
    rows.toDF("transaction_id", "s3_bucket", "s3_key", "exchange", "real")

  test("processOrders drops fakes (P2) and empty txids (P3)") {
    val pending = pendingRows(
      ("TX1", "b", "k1", "kraken", true),
      ("TX-FAKE", "b", "k2", "kraken", false),
      ("", "b", "k3", "kraken", true))
    val out = OrderPipeline.processOrders(spark, pending, details("TX1"))
    assert(out.select("transaction_id").as[String].collect().toSeq === Seq("TX1"))
    assert(OrderPipeline.discardedFakes(pending).count() === 1)
  }

  test("processOrders standardizes to the OrderComplete shape (P5/J2)") {
    val out = OrderPipeline.processOrders(spark,
      pendingRows(("TX1", "b", "k1", "kraken", true)), details("TX1"))
    assert(out.schema.fieldNames.toSeq === Seq("transaction_id",
      "exchange_status", "pair", "order_type", "type", "price", "fee",
      "volume", "open_time", "close_time", "exchange"))
    val r = out.collect().head
    assert(r.getAs[String]("exchange_status") === "closed")
    assert(r.getAs[String]("price") === "0.5")
    assert(r.getAs[Double]("close_time") === 1.7e9 + 1)
  }

  test("end-to-end: execute → process → load → transactions table") {
    val completeDir = tmpDir("complete")
    val table = tmpDir("ordertable") + "/transactions"
    val (fulfilled, pendingCtl) = OrderPipeline.executeOrders(spark, config(goodRow))
    val txid = fulfilled.select("transaction_id").as[String].head()
    // flip the control record to real (the fake path never loads)
    val pending = pendingCtl.withColumn("real", lit(true))
    val complete = OrderPipeline.processOrders(spark, pending, details(txid))
    complete.drop("exchange").write.mode("overwrite").json(completeDir)
    LoadTransactions.run(spark, LoadTransactions.Args(
      completeDir, table, "upsert", Map("exchange" -> "kraken")))
    val loaded = spark.read.parquet(table)
    assert(loaded.count() === 1)
    assert(loaded.select("transaction_id").as[String].head() === txid)
    assert(loaded.schema("close_time").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }
}

/** JVM-static lifecycle counters for the seam spec (local[*] executors
  * share the JVM, so statics observe executor-side events). */
object OrderPipelineSpec {
  val inits = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** [[FakeExchangeClient]] instrumented with lifecycle counters. */
class CountingFakeClient extends FakeExchangeClient {
  OrderPipelineSpec.inits.incrementAndGet()
  override def close(): Unit = {
    OrderPipelineSpec.closes.incrementAndGet()
    ()
  }
}
