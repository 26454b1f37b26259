package graft.dedup

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Train/eval n-gram contamination detection — the pretraining
  * decontamination check: find every training document that contains any
  * word n-gram of a held-out benchmark (the GPT-3-appendix-C / Llama
  * style overlap test; canonical n = 13).
  *
  * Shape contract: the EVAL side is a benchmark (10³–10⁶ docs) while the
  * TRAIN side is the full corpus — so the eval n-gram 60-bit hash set is
  * collected, sorted, and BROADCAST, and the train side is scanned in ONE
  * `mapPartitions` pass with ZERO shuffles: per train doc, the dedup
  * family's sorted-distinct md5 n-gram hash kernel
  * ([[Dedup.shingleHashesOf]]) probed against the eval array by binary
  * search. At 100 TB the train side is pure map work; only the (small)
  * eval side pays a distinct. If the eval side ever outgrows broadcast
  * range, fall back to `cappedShingles` + equi-join — the inverted-index
  * path the rest of the family uses.
  *
  * Hash collisions (2⁻⁶⁰ per gram pair) can mark a clean gram
  * contaminated — same odds and direction as the family's other 60-bit
  * kernels, and reproduced exactly by the oracle (which hashes the same
  * way), so results stay hash-exact.
  */
object Contamination {

  /** Per contaminated train doc: its distinct n-gram count, how many of
    * those n-grams appear anywhere in `eval`, and the contaminated
    * fraction. Docs with zero overlap (or fewer than n tokens) are
    * omitted — the output IS the contamination report. */
  def ngramOverlap(train: DataFrame, eval: DataFrame, id: String,
      text: String, n: Int = 13): DataFrame = {
    val spark = train.sparkSession
    val evalHashes: Array[Long] = Dedup.docShingleArrays(eval, id, text, n)
      .select(explode(col("arr")).as("h")).distinct()
      .collect().map(_.getLong(0))
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
    counted.withColumn("contamination",
      round(col("hit_grams").cast("double") / col("n_grams"), 6))
  }
}
