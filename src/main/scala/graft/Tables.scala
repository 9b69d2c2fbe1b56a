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
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects. Read nanos as long and floor-convert to a microsecond
    * timestamp (exactly DuckDB's ns→us truncation, so oracle values agree
    * for every derived column; raw `ts` itself is never emitted by a
    * query, to keep ns-vs-us precision out of the comparison).
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    * (set once at construction by Verify/Bench/SparkSpec — NOT mutated
    * here: a hidden conf flip inside a read helper would change the
    * behavior of every later parquet read in the session).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .contains("true"),
      "session must set spark.sql.legacy.parquet.nanosAsLong=true to read events")
    table(s, d, "events").withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
