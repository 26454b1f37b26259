package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.GlobalRank

/** Deterministic training-shard assignment — the last mile of a
  * training-data pipeline: packed sequences (or docs) are dealt into
  * `nShards` output shards in a pseudorandom but fully reproducible
  * ORDER, so a 1000-file export reads back as a well-shuffled training
  * stream without any stateful shuffle service. Reference behavior: the
  * shuffled-shard export every large-scale LM data pipeline performs
  * after packing (e.g. the shard-writer stage of C4/Pile-style dumps).
  *
  * Shard = md5-fold(key) mod nShards (the family's 60-bit md5 fold —
  * engine-portable, so the DuckDB oracle replays it exactly); order
  * within a shard = ascending fold value (key as tie-break), i.e. a
  * deterministic permutation that decorrelates neighboring input keys.
  *
  * Scale shape: a naive `row_number() OVER (PARTITION BY shard ORDER BY
  * h)` makes each shard ONE window task — a 100 TB corpus dealt into
  * 1024 shards would sort ~100 GB per task. Instead the position is a
  * GLOBAL range-partitioned sort on (shard, h, key)
  * ([[GlobalRank.withRowNumber]] — zipWithIndex shape, driver state
  * O(partitions)) minus each shard's start offset, computed by a tiny
  * S-row aggregate broadcast back. Partition count — not shard count —
  * bounds per-task state, so shards can be few and large (the export
  *-friendly shape) without any task inheriting a shard-sized sort.
  *
  * Output: one row per input row — `(key, shard: int, pos: long)` with
  * `pos` 0-based within the shard. */
object Shards {

  /** The family 60-bit md5 fold: first 15 hex chars as a non-negative
    * long — identical in Spark and the DuckDB oracle. */
  private def fold(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  def assign(df: DataFrame, key: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val keyed = df.select(col(key),
      (fold(col(key)) % nShards).cast("int").as("shard"),
      fold(col(key)).as("__h"))
    val ranked = GlobalRank.withRowNumber(keyed,
      Seq(col("shard"), col("__h"), col(key)), "__grank")
    // Shard start offsets: S rows — broadcast back onto the ranked
    // stream (reuses the sort's shuffle files for the agg's map stage).
    val starts = ranked.groupBy(col("shard"))
      .agg(min(col("__grank")).as("__start"))
    ranked.join(broadcast(starts), Seq("shard"))
      .select(col(key), col("shard"), (col("__grank") - col("__start")).as("pos"))
  }
}
