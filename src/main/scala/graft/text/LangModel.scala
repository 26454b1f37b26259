package graft.text

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N-gram language-model perplexity scoring — the CCNet / LLaMA-style
  * quality filter: train a small LM on a trusted reference corpus
  * (CCNet uses Wikipedia; here the held-out `src0` slice, mirroring the
  * contamination check's framing), then score every corpus document by
  * its perplexity under that model. Low perplexity ≈ reference-like
  * prose; high perplexity ≈ boilerplate, gibberish, or wrong-language
  * text. Reference behavior: the quality-gate stage of
  * FiniexTestingIDE-style curation pipelines; model form per
  * Wenzek et al. 2020 (CCNet), reduced from KenLM 5-gram to a bigram
  * model with add-one (Laplace) smoothing so the DuckDB oracle can
  * replay every term exactly.
  *
  * Model: P(w|u) = (c(u,w) + 1) / (c(u) + V) with c(u,w) the reference
  * bigram count, c(u) the reference unigram count, V the reference
  * vocabulary size. Per doc: nll = −mean(ln P) over its bigrams,
  * ppl = exp(nll). Tokens unseen in the reference get c = 0 (smoothing
  * absorbs them); `oov_frac` reports the unseen-bigram fraction.
  *
  * SIZE-ROUTED on the trained model's entry count, like every routed
  * operator in the family ([[graft.dedup.Contamination]] pattern):
  *
  *   - Model ≤ [[LangModel.MaxBroadcastEntries]] (the common case — the
  *     reference is a curated corpus orders of magnitude smaller than
  *     the data being scored): bigram and unigram count maps are
  *     collected and BROADCAST, and the corpus is scored in ONE
  *     `mapPartitions` pass with ZERO shuffles over the big side. At
  *     100 TB the corpus side is pure map work; only the bounded
  *     reference pays aggregation shuffles.
  *   - Above the threshold: the corpus bigram stream is exploded and
  *     LEFT-joined against the bigram and unigram count tables on their
  *     natural keys, then re-aggregated per doc. Two corpus-side
  *     shuffles, never driver state proportional to the model.
  *
  * Both routes compute the identical per-bigram double term
  * (−ln((c_uw+1)/(c_u+V)) over exactly-representable integer counts),
  * so they agree to summation order; outputs are rounded per the
  * QueryDef convention (nll to 6, ppl = exp of the ROUNDED nll to 4)
  * which absorbs ULP-order differences — spec'd route-parity.
  *
  * Tokenization is the family's space-split (`string_split` parity with
  * the oracle); docs with fewer than two tokens have no bigrams and are
  * omitted — the output is a score table, not a corpus copy.
  */
object LangModel {

  /** Route boundary: models at or under this many count entries
    * (bigrams + unigrams) broadcast; larger models take the join route.
    * String-keyed entries are heavier than the dedup family's packed
    * longs, so the cap sits below [[graft.dedup.Contamination.MaxBroadcastHashes]]. */
  val MaxBroadcastEntries: Int = 4000000

  /** Per corpus doc with ≥ 2 tokens: bigram count, unseen-bigram
    * fraction, mean negative log-likelihood, perplexity. */
  def perplexity(corpus: DataFrame, reference: DataFrame, id: String,
      text: String,
      maxBroadcastEntries: Int = MaxBroadcastEntries): DataFrame = {
    val spark = corpus.sparkSession
    val refToks = reference.select(split(col(text), " ").as("__toks"))

    // Reference unigram counts (all token positions) and vocabulary.
    val uniCounts = refToks
      .select(explode(col("__toks")).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("c_u"))
      .localCheckpoint(true)
    // Reference bigram counts, keyed by the space-joined bigram string
    // (tokens cannot contain the split character, so the key is
    // injective in (u, w)).
    val biCounts = refToks
      .filter(size(col("__toks")) >= 2)
      .select(explode(bigramsOf(col("__toks"))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c_uw"))
      .localCheckpoint(true)

    val uniProbe = uniCounts.limit(maxBroadcastEntries + 1).collect()
    val scored =
      if (uniProbe.length <= maxBroadcastEntries) {
        val biProbe = biCounts.limit(maxBroadcastEntries + 1).collect()
        if (biProbe.length + uniProbe.length <= maxBroadcastEntries)
          scoreBroadcast(corpus, id, text, uniProbe, biProbe)
        else scoreJoined(corpus, id, text, uniCounts, biCounts,
          uniCounts.count())
      } else scoreJoined(corpus, id, text, uniCounts, biCounts,
        uniCounts.count())

    scored.select(col(id), col("n_bigrams"),
      round(col("__oov").cast("double") / col("n_bigrams"), 6).as("oov_frac"),
      round(col("__s") / col("n_bigrams"), 6).as("nll"),
      round(exp(round(col("__s") / col("n_bigrams"), 6)), 4).as("ppl"))
  }

  /** Adjacent-pair bigram strings of a token array column (size ≥ 2). */
  private def bigramsOf(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 1),
      i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1)))

  private def scoreBroadcast(corpus: DataFrame, id: String, text: String,
      uniProbe: Array[Row], biProbe: Array[Row]): DataFrame = {
    val spark = corpus.sparkSession
    val uni = new java.util.HashMap[String, Long](uniProbe.length * 2)
    uniProbe.foreach(r => uni.put(r.getString(0), r.getLong(1)))
    val bi = new java.util.HashMap[String, Long](biProbe.length * 2)
    biProbe.foreach(r => bi.put(r.getString(0), r.getLong(1)))
    val v = uni.size.toLong
    val uniBc = spark.sparkContext.broadcast(uni)
    val biBc = spark.sparkContext.broadcast(bi)

    val idType = corpus.schema(id).dataType
    val outSchema = StructType(Seq(
      StructField(id, idType),
      StructField("n_bigrams", LongType, nullable = false),
      StructField("__oov", LongType, nullable = false),
      StructField("__s", DoubleType, nullable = false)))
    corpus.select(col(id), split(col(text), " ").as("__toks"))
      .mapPartitions { rows =>
        val uniM = uniBc.value; val biM = biBc.value
        rows.flatMap { r =>
          // Family null convention (Curation/Dsir/TextMetrics kernels):
          // null id or null text drops the row. Without the guard, a
          // null split result NPEs the broadcast route while the join
          // route silently drops the same row — route-divergent.
          if (r.isNullAt(0) || r.isNullAt(1)) Iterator.empty
          else {
          val toks = r.getSeq[String](1)
          val n = toks.length
          if (n < 2) Iterator.empty
          else {
            var s = 0.0; var oov = 0L; var i = 0
            while (i < n - 1) {
              val u = toks(i)
              // Identical term to the join route / oracle: counts are
              // exactly-representable longs, one double division, one ln.
              val cuw = biM.getOrDefault(u + " " + toks(i + 1), 0L)
              val cu = uniM.getOrDefault(u, 0L)
              if (cuw == 0L) oov += 1
              s += -math.log((cuw + 1).toDouble / (cu + v))
              i += 1
            }
            Iterator.single(Row(r.get(0), (n - 1).toLong, oov, s))
          }
          }
        }
      }(Encoders.row(outSchema))
  }

  private def scoreJoined(corpus: DataFrame, id: String, text: String,
      uniCounts: DataFrame, biCounts: DataFrame, v: Long): DataFrame = {
    val exploded = corpus
      // Null id drops the row (family convention, matching the
      // broadcast kernel's isNullAt guard); null text already drops via
      // the size filter (size(null) is null).
      .filter(col(id).isNotNull)
      .select(col(id), split(col(text), " ").as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(id), explode(bigramsOf(col("__toks"))).as("g"))
      .withColumn("u", element_at(split(col("g"), " "), 1))
    exploded
      .join(biCounts, Seq("g"), "left")
      .join(uniCounts, Seq("u"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c_uw").isNull, 1L).otherwise(0L)).as("__oov"),
        sum(-log((coalesce(col("c_uw"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c_u"), lit(0L)) + lit(v)))).as("__s"))
  }
}
