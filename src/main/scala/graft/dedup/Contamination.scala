package graft.dedup

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Train/eval n-gram contamination detection — the pretraining
  * decontamination check: find every training document that contains any
  * word n-gram of a held-out benchmark (the GPT-3-appendix-C / Llama
  * style overlap test; canonical n = 13).
  *
  * SIZE-ROUTED on the eval side's distinct n-gram hash count, like every
  * routed operator in the family:
  *
  *   - Eval hash set ≤ [[Contamination.MaxBroadcastHashes]] (the common
  *     case — the eval side is a benchmark, 10³–10⁶ docs): the 60-bit
  *     hash set is collected, sorted, and BROADCAST, and the train side
  *     is scanned in ONE `mapPartitions` pass with ZERO shuffles: per
  *     train doc, the dedup family's sorted-distinct md5 n-gram hash
  *     kernel ([[Dedup.shingleHashesOf]]) probed against the eval array
  *     by binary search. At 100 TB the train side is pure map work.
  *   - Above the threshold (decontaminating against a large held-out
  *     CORPUS rather than a benchmark): inverted-index equi-join — the
  *     train side explodes its per-doc sorted-distinct hashes (already
  *     distinct per doc, so the join hits count IS the overlap count)
  *     and equi-joins the eval hash set on the hash, partitioned by
  *     hash like the rest of the family's index joins. One train-side
  *     shuffle, never driver state proportional to eval.
  *
  * The route probe follows the [[Clusters]] pattern: the distinct eval
  * hash stream is checkpointed once and probed with a bounded
  * `limit(threshold+1).collect()` — when the probe fits, it IS the full
  * set (no second materialization of the eval pipeline); when it
  * doesn't, the checkpointed blocks feed the join without recomputing.
  *
  * Hash collisions (2⁻⁶⁰ per gram pair) can mark a clean gram
  * contaminated — same odds and direction as the family's other 60-bit
  * kernels, and reproduced exactly by the oracle (which hashes the same
  * way), so results stay hash-exact. Both routes share the hash kernel,
  * so they agree exactly (spec'd).
  */
object Contamination {

  /** Route boundary: eval hash sets at or under this size broadcast
    * (64 MB of longs — well inside executor broadcast comfort); larger
    * sets take the equi-join. */
  val MaxBroadcastHashes: Int = 8000000

  /** Per contaminated train doc: its distinct n-gram count, how many of
    * those n-grams appear anywhere in `eval`, and the contaminated
    * fraction. Docs with zero overlap (or fewer than n tokens) are
    * omitted — the output IS the contamination report. */
  def ngramOverlap(train: DataFrame, eval: DataFrame, id: String,
      text: String, n: Int = 13,
      maxBroadcastHashes: Int = MaxBroadcastHashes): DataFrame = {
    val spark = train.sparkSession
    val evalHashDf = Dedup.docShingleArrays(eval, id, text, n)
      .select(explode(col("arr")).as("h")).distinct()
      .localCheckpoint(true)
    val probe = evalHashDf.limit(maxBroadcastHashes + 1).collect()

    if (probe.length <= maxBroadcastHashes) {
      val evalHashes: Array[Long] = probe.map(_.getLong(0))
      java.util.Arrays.sort(evalHashes)
      val bc = spark.sparkContext.broadcast(evalHashes)

      val idType = train.schema(id).dataType
      val outSchema = StructType(Seq(
        StructField(id, idType),
        StructField("n_grams", LongType, nullable = false),
        StructField("hit_grams", LongType, nullable = false)))
      val counted = Dedup.docShingleArrays(train, id, text, n)
        .mapPartitions { rows =>
          val ev = bc.value
          rows.flatMap { r =>
            val arr = Dedup.longArray(r.get(1))
            var hits = 0L
            var i = 0
            while (i < arr.length) {
              if (java.util.Arrays.binarySearch(ev, arr(i)) >= 0) hits += 1
              i += 1
            }
            if (hits == 0L) Iterator.empty
            else Iterator.single(Row(r.get(0), arr.length.toLong, hits))
          }
        }(Encoders.row(outSchema))
      withFraction(counted)
    } else {
      // Inverted-index route: per-doc arrays are sorted-DISTINCT, so the
      // exploded (id, hash) stream has no within-doc duplicates and the
      // post-join row count per id is exactly the overlap count.
      val exploded = Dedup.docShingleArrays(train, id, text, n)
        .select(col(id), size(col("arr")).cast("long").as("n_grams"),
          explode(col("arr")).as("h"))
      val counted = exploded
        .join(evalHashDf, "h")
        .groupBy(col(id), col("n_grams"))
        .agg(count(lit(1)).as("hit_grams"))
      withFraction(counted)
    }
  }

  private def withFraction(counted: DataFrame): DataFrame =
    counted.withColumn("contamination",
      round(col("hit_grams").cast("double") / col("n_grams"), 6))
}
