package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions.input_file_name

/** Incremental-mode semantics: drain-and-stop runs, checkpointed
  * exactly-once file consumption (T2/T3), upsert across micro-batch
  * boundaries, dead-letter continuity (T5). */
class StreamLoaderSpec extends SparkSpec {
  import spark.implicits._

  private def writeTx(dir: String, name: String, txid: String,
      price: String, closeTime: Double = 1.7e9): Unit =
    Files.writeString(Paths.get(dir, name),
      s"""{"transaction_id":"$txid","exchange_status":"closed","pair":"ADAGBP","order_type":"market","type":"buy","price":"$price","fee":"0.01","volume":"10","open_time":1.69e9,"close_time":$closeTime}""")

  private def mkArgs(tag: String, withSuccess: Boolean = false)
      : StreamLoader.Args = {
    val base = tmpDir(tag)
    StreamLoader.Args(
      inputDir = s"$base/in", tablePath = s"$base/table",
      checkpointDir = s"$base/ckpt", deadLetterDir = s"$base/dlq",
      additionalColumns = Map("exchange" -> "kraken"),
      successDir = if (withSuccess) Some(s"$base/ok") else None)
  }

  test("drains available files then stops; loads the table (T2)") {
    val args = mkArgs("stream1")
    Files.createDirectories(Paths.get(args.inputDir))
    writeTx(args.inputDir, "a.json", "TX1", "0.5")
    writeTx(args.inputDir, "b.json", "TX2", "0.6")
    StreamLoader.runAvailableNow(spark, args)
    val t = spark.read.parquet(args.tablePath)
    assert(t.count() === 2)
    assert(t.select("exchange").as[String].collect().toSet === Set("kraken"))
  }

  test("successful batches emit one success notification record (T5)") {
    val args = mkArgs("streamok", withSuccess = true)
    Files.createDirectories(Paths.get(args.inputDir))
    writeTx(args.inputDir, "a.json", "TX1", "0.5")
    writeTx(args.inputDir, "b.json", "TX2", "0.6")
    StreamLoader.runAvailableNow(spark, args)
    val ok = spark.read.parquet(args.successDir.get)
    assert(ok.count() === 1) // one drain = one micro-batch = one record
    val r = ok.collect().head
    assert(r.getAs[Long]("n_rows") === 2L)
    assert(r.getAs[String]("pairs") === "ADAGBP")
    // and nothing dead-lettered
    assert(!new java.io.File(args.deadLetterDir).exists())
  }

  test("checkpoint means files are processed once; new files upsert (T3)") {
    val args = mkArgs("stream2")
    Files.createDirectories(Paths.get(args.inputDir))
    writeTx(args.inputDir, "a.json", "TX1", "0.5")
    StreamLoader.runAvailableNow(spark, args)
    // same key again with a new price: second drain must upsert, not dup
    writeTx(args.inputDir, "b.json", "TX1", "0.9")
    StreamLoader.runAvailableNow(spark, args)
    val rows = spark.read.parquet(args.tablePath)
    assert(rows.count() === 1)
    assert(rows.select($"price".cast("double")).as[Double].head() === 0.9)
  }

  test("failing batch routes rows to the dead-letter dir, stream survives (T5)") {
    val args = mkArgs("streamdlq")
    Files.createDirectories(Paths.get(args.inputDir))
    // make the table path an unwritable location: a regular FILE, so the
    // upsert's parquet write throws inside foreachBatch
    Files.writeString(Paths.get(args.tablePath), "not a directory")
    writeTx(args.inputDir, "a.json", "TX1", "0.5")
    StreamLoader.runAvailableNow(spark, args) // must not throw
    val dlq = spark.read.parquet(args.deadLetterDir)
    assert(dlq.count() === 1)
    assert(dlq.columns.contains("_error") && dlq.columns.contains("_batch_id"))
    assert(dlq.select("transaction_id").as[String].head() === "TX1")
  }

  test("replayDeadLetters re-applies the DLQ through the merge and clears it") {
    val args = mkArgs("streamreplay")
    Files.createDirectories(Paths.get(args.inputDir))
    // force the first drain to dead-letter: table path is a plain file
    Files.writeString(Paths.get(args.tablePath), "not a directory")
    writeTx(args.inputDir, "a.json", "TX1", "0.5")
    StreamLoader.runAvailableNow(spark, args)
    assert(spark.read.parquet(args.deadLetterDir).count() === 1)
    // fix the cause, replay, verify load + cleared DLQ
    Files.delete(Paths.get(args.tablePath))
    assert(StreamLoader.replayDeadLetters(spark, args) === 1L)
    val t = spark.read.parquet(args.tablePath)
    assert(t.count() === 1)
    assert(t.select("transaction_id").as[String].head() === "TX1")
    assert(StreamLoader.replayDeadLetters(spark, args) === 0L)
  }

  test("transform runs once per micro-batch: merge + notify read the cache") {
    // Guard against re-running the per-batch transform per consumer: the
    // merge (several actions), and the success notification must all go
    // through the persisted batch. Detector: during the drain, NO query
    // execution may scan the JSON source directly — every plan that
    // touches it must do so through InMemoryTableScan (the cache).
    val args = mkArgs("streamonce", withSuccess = true)
    Files.createDirectories(Paths.get(args.inputDir))
    writeTx(args.inputDir, "a.json", "TX1", "0.5")
    writeTx(args.inputDir, "b.json", "TX2", "0.6")
    val bare = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ns: Long): Unit = {
        val p = qe.executedPlan.toString
        if (p.contains("FileScan json") && p.contains("streamonce") &&
          !p.contains("InMemoryTableScan")) bare.incrementAndGet()
      }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      StreamLoader.runAvailableNow(spark, args)
      Thread.sleep(2000) // listener events are delivered asynchronously
    } finally spark.listenerManager.unregister(listener)
    assert(bare.get() === 0,
      s"${bare.get()} executions re-scanned the JSON source outside the cache")
    assert(spark.read.parquet(args.tablePath).count() === 2)
    assert(spark.read.parquet(args.successDir.get).count() === 1)
  }

  test("compactEvery keeps the streaming table defragmented") {
    val args = mkArgs("streamcompact").copy(
      compactEvery = Some(1), maxFilesPerTrigger = Some(1))
    Files.createDirectories(Paths.get(args.inputDir))
    // three files → three micro-batches → three appended files without
    // maintenance; per-batch compaction must leave ONE file behind
    writeTx(args.inputDir, "a.json", "TX1", "0.5")
    writeTx(args.inputDir, "b.json", "TX2", "0.6")
    writeTx(args.inputDir, "c.json", "TX3", "0.7")
    StreamLoader.runAvailableNow(spark, args)
    val files = new java.io.File(s"${args.tablePath}/pair=ADAGBP")
      .listFiles().map(_.getName).filter(_.endsWith(".parquet"))
    assert(files.length === 1, files.mkString(","))
    assert(spark.read.parquet(args.tablePath).count() === 3)
  }

  test("mergeOnRead ingestion: delta-append micro-batches, same end " +
      "state as COW, compaction folds on cadence") {
    import graft.merge.MorTable
    // same three-file input drained twice: once COW, once MOR
    def drain(tag: String, mor: Boolean, compactEvery: Option[Int])
        : StreamLoader.Args = {
      val args = mkArgs(tag).copy(mergeOnRead = mor,
        compactEvery = compactEvery, maxFilesPerTrigger = Some(1))
      Files.createDirectories(Paths.get(args.inputDir))
      writeTx(args.inputDir, "a.json", "TX1", "0.5")
      writeTx(args.inputDir, "b.json", "TX2", "0.6")
      writeTx(args.inputDir, "c.json", "TX1", "0.9") // upserts TX1
      StreamLoader.runAvailableNow(spark, args)
      args
    }
    val cow = drain("slmor_cow", mor = false, None)
    val morLazy = drain("slmor_lazy", mor = true, None)
    // no compaction: batches 2 and 3 appended deltas, base is batch 1
    val deltas = new java.io.File(
      s"${morLazy.tablePath}/_graft_deltas/pair=ADAGBP")
    assert(deltas.exists() && deltas.listFiles()
      .exists(_.getName.endsWith(".parquet")),
      "MOR micro-batches must land as deltas, not base rewrites")
    def state(df: org.apache.spark.sql.DataFrame) =
      df.select($"transaction_id", $"price".cast("double"))
        .as[(String, Double)].collect().toSeq.sorted
    val expected = state(spark.read.parquet(cow.tablePath))
    assert(state(MorTable.read(spark, morLazy.tablePath)) === expected)
    // per-batch compaction: deltas folded, read-optimized is current
    val morCompact = drain("slmor_compact", mor = true, Some(1))
    val dDir = new java.io.File(
      s"${morCompact.tablePath}/_graft_deltas/pair=ADAGBP")
    assert(!dDir.exists() || dDir.listFiles()
      .forall(!_.getName.endsWith(".parquet")),
      "per-batch compaction must consume every delta")
    assert(state(MorTable.readOptimized(spark, morCompact.tablePath))
      === expected)
  }

  test("micro-batches serialize: one ordered notification per batch (T6)") {
    // max_concurrent_runs = 1 is native to Structured Streaming: batches
    // run strictly one at a time — observable as exactly one success
    // record per input file (maxFilesPerTrigger=1) with contiguous ids
    val args = mkArgs("streamserial", withSuccess = true)
      .copy(maxFilesPerTrigger = Some(1))
    Files.createDirectories(Paths.get(args.inputDir))
    writeTx(args.inputDir, "a.json", "TX1", "0.5")
    writeTx(args.inputDir, "b.json", "TX2", "0.6")
    writeTx(args.inputDir, "c.json", "TX3", "0.7")
    StreamLoader.runAvailableNow(spark, args)
    val rows = spark.read.parquet(args.successDir.get)
      .select(input_file_name().as("f"), $"_batch_id")
      .as[(String, Long)].collect().toSeq
    assert(rows.map(_._2).sorted === Seq(0L, 1L, 2L))
    // ordering, not just membership: each batch's notification files
    // must have been WRITTEN after the previous batch's (serial
    // micro-batches leave monotonic mtimes per batch id)
    val mtimes = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, fs) =>
      fs.map(t => new java.io.File(new java.net.URI(t._1).getPath)
        .lastModified()).min
    }
    assert(mtimes === mtimes.sorted, mtimes.mkString(","))
  }

  test("compactEvery = 0 is rejected before the stream starts") {
    val args = mkArgs("streambadn").copy(compactEvery = Some(0))
    val e = intercept[IllegalArgumentException] {
      StreamLoader.query(spark, args)
    }
    assert(e.getMessage.contains("compactEvery"))
  }

  test("no dead letters on the happy path (T5)") {
    val args = mkArgs("stream3")
    Files.createDirectories(Paths.get(args.inputDir))
    writeTx(args.inputDir, "a.json", "TX1", "0.5")
    StreamLoader.runAvailableNow(spark, args)
    assert(!new java.io.File(args.deadLetterDir).exists())
  }
}
