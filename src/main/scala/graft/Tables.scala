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

  /** The `events` table's `ts` column has shipped in two physical
    * layouts across testdata generations: TIMESTAMP(NANOS) — which
    * Spark's TimestampType (micros) cannot represent, so the session
    * reads the raw INT64 nanos via `spark.sql.legacy.parquet.nanosAsLong`
    * — and plain microsecond timestamp (adjusted-to-UTC false, so Spark
    * surfaces TIMESTAMP_NTZ). Branch on the arriving dtype and expose the
    * SAME engine-facing schema either way:
    *   - `ts_ns`  : epoch-nanos (long) — total ordering key; equals
    *                DuckDB `epoch_ns(ts)` in both layouts
    *   - `ts_ms`  : epoch-millis (long) — matches DuckDB `epoch_ms(ts)`
    *   - `ts_utc` : microsecond TimestampType for windowing/date_trunc
    *                (session tz is pinned UTC, so the NTZ cast and the
    *                oracle's naive-as-UTC reading agree)
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          // `div` = exact integer division: ts_ns ~1.7e18 exceeds double's
          // 2^53 exact range, so float division would corrupt low digits.
          .withColumn("ts_ms", expr("ts_ns div 1000000"))
          .withColumn("ts_utc", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        // TimestampNTZType or TimestampType: normalize to TimestampType
        // (UTC session), then derive the long keys from exact micros.
        raw.withColumn("ts_utc",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts_utc")) * lit(1000L))
          .withColumn("ts_ms", expr("unix_micros(ts_utc) div 1000"))
          .drop("ts")
    }
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
