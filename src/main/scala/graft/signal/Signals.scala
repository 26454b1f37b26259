package graft.signal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.AsOfJoin

/** External signal series (e.g. LLM sentiment): JSONL ingest, envelope
  * explode, point-in-time trimming, last-wins dedup, and as-of attachment
  * to ticks with staleness flags (SURVEY S6/S7, J1/J2/J6, ST7;
  * `/root/reference/python/framework/signal_data/`,
  * `/root/reference/python/data_management/importers/signal_importer.py`).
  */
object Signals {

  /** Per-envelope sentinel symbol row emitted at import
    * (`signal_data_types.py:130-182`). */
  val EnvelopeSymbol = "__envelope__"

  /** JSONL envelope: one line per collection, results keyed by symbol. */
  val EnvelopeSchema: StructType = StructType(Seq(
    StructField("collected_msc", LongType),
    StructField("schema_version", StringType),
    StructField("basis", StringType),
    StructField("status", StringType),
    StructField("results", ArrayType(StructType(Seq(
      StructField("symbol", StringType),
      StructField("signal", StringType),
      StructField("sentiment_score", DoubleType),
      StructField("confidence", DoubleType),
      StructField("reasoning", StringType),
      StructField("urgency", DoubleType),
      StructField("is_breaking", BooleanType)))))))

  /** Load envelopes from JSONL; enforce the schema major-version gate
    * (`signal_jsonl_loader.py:14-17,57-61`). */
  def loadJsonl(spark: SparkSession, path: String, majorVersion: Int = 1): DataFrame =
    spark.read.schema(EnvelopeSchema).json(path)
      .filter(split(col("schema_version"), "\\.").getItem(0) === majorVersion.toString)

  /** Envelope → one row per (collected_msc, symbol) plus one sentinel row
    * per envelope (S7, `signal_importer.py:28-120`). */
  def explodeEnvelopes(envelopes: DataFrame): DataFrame = {
    val perSymbol = envelopes.select(
      col("collected_msc"), col("schema_version"), col("basis"), col("status"),
      explode(col("results")).as("r"))
      .select(col("collected_msc"), col("r.symbol").as("symbol"),
        col("r.signal").as("signal"),
        col("r.sentiment_score").as("sentiment_score"),
        col("r.confidence").as("confidence"), col("r.reasoning").as("reasoning"),
        col("r.urgency").as("urgency"), col("r.is_breaking").as("is_breaking"),
        col("basis"), col("status"), col("schema_version"))
    val sentinels = envelopes.select(
      col("collected_msc"), lit(EnvelopeSymbol).as("symbol"),
      lit(null).cast("string").as("signal"),
      lit(null).cast("double").as("sentiment_score"),
      lit(null).cast("double").as("confidence"),
      lit(null).cast("string").as("reasoning"),
      lit(null).cast("double").as("urgency"),
      lit(null).cast("boolean").as("is_breaking"),
      col("basis"), col("status"), col("schema_version"))
    perSymbol.unionByName(sentinels)
  }

  /** Point-in-time trim (J2, `signal_jsonl_loader.py:64-78`): keep
    * snapshots in [start, end] PLUS the latest snapshot at/before start so
    * the first tick resolves. Per symbol. */
  def pointInTimeTrim(signals: DataFrame, startMsc: Long, endMsc: Long): DataFrame = {
    val w = Window.partitionBy(col("symbol"))
    val inRange = signals.filter(
      col("collected_msc") >= startMsc && col("collected_msc") <= endMsc)
    val preStart = signals.filter(col("collected_msc") < startMsc)
      .withColumn("__rn", row_number().over(
        w.orderBy(col("collected_msc").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    inRange.unionByName(preStart)
  }

  /** Last-wins dedup (J6, `signal_parquet_reader.py:56-68`): for one
    * requested symbol, a symbol-specific row beats the envelope sentinel
    * at the same collected_msc. */
  def resolveForSymbol(signals: DataFrame, symbol: String): DataFrame = {
    val w = Window.partitionBy(col("collected_msc"))
      .orderBy(when(col("symbol") === symbol, 0).otherwise(1))
    signals.filter(col("symbol") === symbol || col("symbol") === EnvelopeSymbol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Attach the most recent signal at/before each tick (J1) and flag
    * staleness (ST7): stale when the snapshot is older than
    * maxStalenessMs; missing snapshot → stale. */
  def attachToTicks(ticks: DataFrame, signals: DataFrame, keys: Seq[String],
                    tickMsc: String, maxStalenessMs: Long): DataFrame = {
    val payload = Seq("sig_msc", "signal", "sentiment_score", "confidence")
    val sig = signals.select(
      (keys.map(col) :+ col("collected_msc").as("sig_msc") :+ col("signal") :+
        col("sentiment_score") :+ col("confidence")): _*)
    AsOfJoin.backward(ticks, sig, keys, tickMsc, "sig_msc", payload)
      .withColumn("is_stale",
        col("sig_msc").isNull ||
          (col(tickMsc) - col("sig_msc")) > maxStalenessMs)
  }
}
