package graft.orders

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Model

/** The order-pipeline semantics of the reference's two Lambdas,
  * re-expressed as declarative Spark pipelines (SURVEY §3.1–3.2, §7
  * phase 4).
  *
  * Execute stage (`cmd/execute_orders/main.go:120-214`):
  * config scan → enabled filter (P1) → exchange-registry validation
  * (P4, anti-join) → order placement (S3/S6 — deterministic fake
  * generator here; a real exchange client would be a `mapPartitions`
  * enrichment at the same spot) → partitioned pending JSON sink (S9)
  * → pending control records for the queue (S11).
  *
  * Process stage (`cmd/process_orders/main.go:117-282`):
  * control records → real/fake routing (P2) → empty-txid filter (P3)
  * → txid→detail enrichment join (J2, `pkg/orders/kraken.go:75-112`)
  * → typed standardization to `OrderComplete` (P5) → partitioned
  * complete JSON sink (S10).
  *
  * Scale notes: the registry join is a broadcast (the dimension is a
  * handful of exchanges); the detail enrichment is an equi-join that
  * AQE will broadcast when the detail side is small, and shuffles on
  * `transaction_id` otherwise — both shapes hold at any order volume.
  * Sinks are hive-partitioned by `exchange` so downstream reads prune.
  */
object OrderPipeline {

  /** S1: config-document scan — `config.json` `{"orders": [...]}` with
    * the declared schema (`pkg/configuration/dca.go:49-73`,
    * `schema.json:3-10`), exploded to one row per configured order.
    * Validation (P6) is the caller's next step via
    * [[graft.model.Model.validateConfig]]. */
  def readConfig(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Model.dcaConfigSchema).json(path)
      .select(explode(col("orders")).as("o"))
      .select(col("o.*"))

  /** The exchange registry (J1's `map[string]Orderer`,
    * `pkg/orders/factory.go:21-36`) as a broadcastable dimension. */
  def exchangeRegistry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Model.knownExchanges.toDF("exchange")
  }

  /** P4: rows whose exchange has no registered orderer. The caller
    * raises if non-empty — same contract as the reference's
    * "no orderer configured" error (`cmd/execute_orders/main.go:157-160`),
    * but as a side-output instead of a per-record panic. */
  def unknownExchanges(orders: DataFrame, registry: DataFrame): DataFrame =
    orders.join(broadcast(registry), Seq("exchange"), "left_anti")

  /** S6: deterministic fake fulfillment, one per configured order —
    * the engine analogue of `GetFakeOrderFufilled`
    * (`pkg/orders/fake.go:11-34`). Txids are derived (not random) so
    * replays are bit-identical; the result payload carries the same
    * description shape as the reference fixture.
    *
    * `validate`-only orders (the reference passes `DCAOrder.Validate`
    * through to the exchange API, `pkg/configuration/dca.go:36`,
    * `pkg/orders/kraken.go:49-54`) are checked but NOT placed — the
    * exchange returns no transaction id for them, so their
    * `transaction_id` is null and [[executeOrders]] keeps them out of
    * the pending sink and queue. */
  def fakeFulfill(orders: DataFrame): DataFrame =
    orders.select(
      when(col("validate"), lit(null).cast("string"))
        .otherwise(concat(lit("FAKE-"), col("pair"), lit("-"),
          upper(hex(crc32(concat_ws("|", col("pair"), col("direction"),
            col("ordertype"), col("volume")))))))
        .as("transaction_id"),
      lit(12345678L).as("timestamp"), // fake.go:29 fixed stamp
      to_json(struct(
        col("pair").as("asset_pair"),
        concat_ws(" ", col("direction"), col("volume"), col("pair"),
          lit("@"), col("ordertype")).as("order"),
        col("ordertype").as("order_type"),
        col("direction").as("type"))).as("result"),
      col("exchange"), col("pair"), col("validate"))

  /** S3 production seam: order placement through an [[ExchangeClient]]
    * inside `mapPartitions` — one client per partition (amortized
    * connection setup), closed after the partition drains, each order
    * one `placeOrder` call. Column contract identical to
    * [[fakeFulfill]]; with [[FakeExchangeClient]] the OUTPUT is
    * identical too (spec-pinned), so a real client swap changes
    * transport only. `mkClient` must be serializable (it ships to
    * executors); the returned client must not. */
  def clientFulfill(orders: DataFrame,
      mkClient: () => ExchangeClient): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders
      .select(col("pair"), col("direction"), col("ordertype"),
        col("volume"), col("validate"), col("exchange"))
      .as[(String, String, String, String, Boolean, String)]
      .mapPartitions { it =>
        val client = mkClient() // per-partition init, not per-record
        // Close via the task-completion listener: it fires on normal
        // drain, on early termination (limit/take stops pulling the
        // iterator), AND on task failure — a lazy `++ {close}` suffix
        // only covers the first, leaking a real HTTP client otherwise.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => client.close()))
        it.map { case (pair, dir, otype, vol, validate, exch) =>
          val p = client.placeOrder(pair, dir, otype, vol, validate)
          (p.transactionId.orNull, p.timestamp, p.result, exch, pair,
            validate)
        }
      }
      .toDF("transaction_id", "timestamp", "result", "exchange", "pair",
        "validate")
  }

  /** Execute stage: returns (fulfilled orders ready for the pending
    * sink, pending control records for the queue). Fails fast on
    * unregistered exchanges, mirroring the reference's error path. */
  def executeOrders(
      spark: SparkSession,
      config: DataFrame,
      bucket: String = "dca-bucket",
      pendingPrefix: String = "transactions/status=pending")
      : (DataFrame, DataFrame) = {
    val registry = exchangeRegistry(spark)
    val bad = unknownExchanges(config, registry)
    val badRows = bad.limit(1).collect()
    require(badRows.isEmpty,
      s"no orderer configured for exchange ${badRows.head.getAs[String]("exchange")}")
    val enabled = config.filter(col("enabled")) // P1, kraken.go:42-45
    // validate-only orders are exercised against the exchange but never
    // placed: no txid, no pending JSON, no queue message
    val fulfilled = fakeFulfill(enabled)
      .filter(col("transaction_id").isNotNull)
      .drop("validate")
    // S11: PendingOrders control record + message attributes
    // (pkg/orders/submit_pending.go:34-47); the s3_key mirrors the
    // reference's `prefix/exchange=<x>/<txid>.json` layout (P7/P8).
    val pending = fulfilled.select(
      col("transaction_id"),
      lit(bucket).as("s3_bucket"),
      concat(lit(pendingPrefix + "/exchange="), lower(col("exchange")),
        lit("/"), col("transaction_id"), lit(".json")).as("s3_key"),
      lower(col("exchange")).as("exchange"),
      lit(false).as("real"))
    (fulfilled, pending)
  }

  /** S9/S10: hive-partitioned JSON sink (`exchange=<x>/` layout). */
  def writePartitionedJson(df: DataFrame, dir: String): Unit =
    df.withColumn("exchange", lower(col("exchange")))
      .write.partitionBy("exchange").mode("append").json(dir)

  /** Process stage: control records + a txid-keyed detail source →
    * standardized `OrderComplete` rows (decimals as strings, unix-second
    * doubles — the raw shape the load stage consumes).
    *
    * `details` carries the exchange response fields
    * (`kraken.go:88-112`): status, descr_pair, descr_ordertype,
    * descr_type, price, fee, vol_exec, opentm, closetm — all keyed by
    * transaction_id.
    */
  def processOrders(
      spark: SparkSession,
      pending: DataFrame,
      details: DataFrame): DataFrame = {
    val registry = exchangeRegistry(spark)
    val bad = unknownExchanges(pending, registry)
    val badRows = bad.limit(1).collect()
    require(badRows.isEmpty,
      s"no orderer configured for exchange ${badRows.head.getAs[String]("exchange")}")
    val real = pending
      .filter(col("real")) // P2: fake records are dropped (side-output)
      .filter(col("transaction_id").isNotNull &&
        length(col("transaction_id")) > 0) // P3, main.go:196-199
    // J2: point-lookup enrichment as an equi-join on the txid.
    real.join(details, Seq("transaction_id"))
      .select( // P5: the 10-column standardization, kraken.go:93-106
        col("transaction_id"),
        col("status").as("exchange_status"),
        col("descr_pair").as("pair"),
        col("descr_ordertype").as("order_type"),
        col("descr_type").as("type"),
        col("price").cast("string").as("price"),
        col("fee").cast("string").as("fee"),
        col("vol_exec").cast("string").as("volume"),
        col("opentm").cast("double").as("open_time"),
        col("closetm").cast("double").as("close_time"),
        col("exchange"))
  }

  /** P2 side-output: the discarded fake branch (delete-only path,
    * `cmd/process_orders/main.go:143-158`). */
  def discardedFakes(pending: DataFrame): DataFrame =
    pending.filter(!coalesce(col("real"), lit(false)))
}
