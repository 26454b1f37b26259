package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access over the driver-provided parquet layout (`TESTDATA.md`):
  * one parquet file per table under a scale-factor directory.
  *
  * Design note (100 TB): all readers return lazy DataFrames; nothing is
  * collected. At cluster scale the same API reads a partitioned directory
  * tree (`dir/name/` with partition columns) instead of a single file —
  * Spark's parquet source handles both transparently.
  */
object Tables {

  /** Read one table. Filters/projections applied downstream are pushed into
    * the parquet scan by Catalyst (verify via `.explain`: PushedFilters).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The `events` table is written with nanosecond-precision timestamps,
    * which Spark's TimestampType (microseconds) cannot represent. We read
    * the raw INT64 nanos (`spark.sql.legacy.parquet.nanosAsLong`) and expose:
    *   - `ts_ns`  : raw epoch-nanos (long) — total ordering key
    *   - `ts_ms`  : epoch-millis (long) — matches DuckDB `epoch_ms(ts)`
    *   - `ts_utc` : microsecond TimestampType for windowing/date_trunc
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // requires spark.sql.legacy.parquet.nanosAsLong=true, set at session
    // construction (GraftSession) — never mutated mid-query here.
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet carries TIMESTAMP(NANOS): build the session with " +
        "GraftSession (sets spark.sql.legacy.parquet.nanosAsLong=true)")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      // `div` = exact integer division: ts_ns ~1.7e18 exceeds double's 2^53
      // exact range, so float division would corrupt low-order digits.
      .withColumn("ts_ms", expr("ts_ns div 1000000"))
      .withColumn("ts_utc", timestamp_micros(expr("ts_ns div 1000")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
