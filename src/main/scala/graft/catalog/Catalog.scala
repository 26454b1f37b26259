package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog / coverage utilities (SURVEY §2.1 S8–S10, §2.8 F17).
  *
  * The reference maintains hand-built parquet file indexes with min/max
  * times and sampled stats (`tick_index_manager.py:62-226`). Under Spark
  * most of that job is native — partition pruning + parquet footer
  * min/max skipping — so what remains useful is a small DERIVED coverage
  * table for discovery UIs and availability checks (SURVEY §3.1 phases
  * 1–2), built as one distributed aggregation, and content-addressed
  * cache keys for derived tables (`discovery_cache.py:43-81`,
  * `config_fingerprint_utils.py`).
  */
object Catalog {

  /** Per-(keys…, file) coverage row: time bounds, row count, and sampled
    * quality stats — the Spark form of the tick index
    * (`tick_index_manager.py:285-331`, nested stats as real columns
    * instead of JSON strings). */
  def coverage(df: DataFrame, keys: Seq[String], tsMs: String,
               statCols: Seq[String] = Nil): DataFrame = {
    val statAggs = statCols.flatMap { c =>
      Seq(round(avg(col(c)), 6).as(s"avg_$c"),
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    val aggs = Seq(
      min(col(tsMs)).as("start_ms"),
      max(col(tsMs)).as("end_ms"),
      count(lit(1)).as("n_rows")) ++ statAggs
    df.withColumn("__file", input_file_name())
      .groupBy((keys.map(col) :+ col("__file").as("file")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Scenario-availability check (§3.1 phase 2): does [startMs, endMs]
    * fall inside the key's covered range? Returns per-key verdicts. */
  def availability(coverage: DataFrame, keys: Seq[String],
                   startMs: Long, endMs: Long): DataFrame =
    coverage.groupBy(keys.map(col): _*)
      .agg(min(col("start_ms")).as("data_start_ms"),
        max(col("end_ms")).as("data_end_ms"),
        sum(col("n_rows")).as("n_rows"))
      .withColumn("available",
        col("data_start_ms") <= startMs && col("data_end_ms") >= endMs)

  /** Config fingerprint for derived-table cache identity (F17):
    * sha2(to_json(struct)) over sorted keys — stable across runs, so a
    * cache hit means "same config produced this table"
    * (`config_fingerprint_utils.py`; cache `discovery_cache.py:43-110`). */
  def configFingerprint(config: Map[String, String]): String = {
    val json = config.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(json.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Refresh-if-stale materialized derived table: recompute and rewrite
    * when the fingerprint file is missing or differs (mtime-free variant
    * of the reference's discovery cache — content identity only). */
  def cachedDerived(spark: SparkSession, path: String,
                    config: Map[String, String])(compute: => DataFrame): DataFrame = {
    val fp = configFingerprint(config)
    val fpFile = new java.io.File(s"$path/_fingerprint")
    val hit = fpFile.exists() &&
      new String(java.nio.file.Files.readAllBytes(fpFile.toPath), "UTF-8") == fp
    if (!hit) {
      compute.write.mode("overwrite").parquet(path)
      java.nio.file.Files.write(fpFile.toPath, fp.getBytes("UTF-8"))
    }
    spark.read.parquet(path)
  }
}
