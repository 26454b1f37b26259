package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and mixing for training-data pipelines.
  *
  * Training corpora are sampled by per-stratum rates (downweight a
  * dominant language/source, upweight a scarce one) and then read in a
  * fixed pseudo-random order. Spark's `sample()`/`sampleBy()` are
  * seed-AND-partitioning dependent — two readers of the same data can
  * disagree. Everything here is a pure function of the ROW instead:
  * a row is kept iff the first 32 bits of `md5(seed || ':' || id)`
  * fall under `rate · 2³²`, so membership is reproducible across runs,
  * engines, partitionings, and cluster sizes, trivially pushdown- and
  * codegen-friendly (built-ins only), and exactly expressible in SQL
  * for the oracle. The same digest drives the global shuffle order.
  *
  * Scale: the gate is a per-row filter (no shuffle, no state); the mix
  * order is one range-partitioned sort on the digest — the minimum any
  * global order costs.
  */
object Sampling {

  /** The 32-bit md5 gate value in [0, 2³²) for (seed, id). */
  private def gate(id: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 8),
      16, 10).cast("long")

  private def threshold(rate: Double): Long =
    math.floor(rate * 4294967296.0).toLong

  /** Keep a deterministic `rate` fraction of rows, keyed by `id`. */
  def hashSample(df: DataFrame, id: String, rate: Double,
                 seed: String = "smp"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(gate(col(id), seed) < threshold(rate))
  }

  /** Per-stratum deterministic sampling: rows keep by their stratum's
    * rate (`rates`), anything unlisted by `defaultRate`. One codegen'd
    * filter — no shuffle, no per-stratum pass. */
  def stratifiedHashSample(df: DataFrame, id: String, stratum: String,
                           rates: Map[String, Double],
                           defaultRate: Double = 0.0,
                           seed: String = "smp"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate must be in [0,1], got $r"))
    val thr = rates.foldLeft(lit(threshold(defaultRate))) {
      case (rest, (s, r)) => when(col(stratum) === s, lit(threshold(r))).otherwise(rest)
    }
    df.filter(gate(col(id), seed) < thr)
  }

  /** Append a deterministic global training order: `mix_order` is the
    * rank of `md5(seed || ':' || id)` — a reproducible shuffle any
    * engine can replay. Sorting is the caller's choice (`orderBy
    * ("mix_order")`); the column alone supports range-partitioned
    * writes without a second sort. */
  def withMixOrder(df: DataFrame, id: String,
                   seed: String = "mix"): DataFrame =
    df.withColumn("mix_order", gate(col(id), seed))

  /** Weighted corpus mix: per-source deterministic sampling at each
    * source's rate, tagged with the source name, in one deterministic
    * interleaved order. The standard "mix N corpora at given
    * proportions" step before training. */
  def mixCorpora(sources: Seq[(String, DataFrame, Double)], id: String,
                 seed: String = "mix"): DataFrame = {
    require(sources.nonEmpty, "mixCorpora needs at least one source")
    sources.map { case (name, df, rate) =>
      withMixOrder(hashSample(df, id, rate, seed + ":" + name), id, seed)
        .withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)
  }
}
