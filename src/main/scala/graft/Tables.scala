package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the driver-provided synthetic tables
  * (`/root/testdata/sf*`, see TESTDATA.md) plus shared numeric-policy
  * helpers.
  *
  * Numeric policy (oracle parity): the DuckDB oracle hash-compares
  * values, so every aggregate must be bit-identical regardless of
  * partitioning / summation order. All source measures are 2-decimal
  * doubles; we cast them to exact DECIMAL before any arithmetic that
  * reorders (sum/avg), and cast the final result back to DOUBLE. Decimal
  * arithmetic is exact and associative, so the result is independent of
  * Spark's partial-aggregation order AND identical to DuckDB's, while
  * the output schema stays DOUBLE on both sides.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.parquet's `ts` annotation has varied across testdata
    * generations — TIMESTAMP(NANOS) (which Spark surfaces as BIGINT only
    * under `spark.sql.legacy.parquet.nanosAsLong=true`) and, currently,
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark 4 reads
    * natively as TIMESTAMP_NTZ). Branch on the dataType the reader
    * actually produced and normalize to a session-TZ TIMESTAMP either
    * way; the session TZ is pinned to UTC by Verify/Bench/SparkSpec, so
    * the NTZ→TZ cast is a pure re-tag (identical micros) and both paths
    * yield the exact microsecond values DuckDB's oracle reads from the
    * same footer. Raw `ts` itself is never emitted by a query, keeping
    * physical-annotation drift out of the hash comparison.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case LongType         => expr("timestamp_micros(ts div 1000)") // ns→µs floor
      case TimestampNTZType =>
        // the NTZ→TZ cast is a pure re-tag ONLY under a UTC session TZ;
        // any other TZ would silently shift every event timestamp
        require(s.conf.get("spark.sql.session.timeZone") == "UTC",
          "events.ts is TIMESTAMP_NTZ: the cast to TIMESTAMP requires " +
            "spark.sql.session.timeZone=UTC (got '" +
            s.conf.get("spark.sql.session.timeZone") + "')")
        col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts: unexpected parquet-resolved type $other")
    }
    raw.withColumn("ts", ts)
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Exact decimal view of a 2-decimal double measure (price, qty, ...). */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Small exact decimal for ratio-like columns (discount, tax). */
  def dec4(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Final cast of an exact decimal aggregate back to double. */
  def d(c: Column): Column = c.cast(DoubleType)
}
