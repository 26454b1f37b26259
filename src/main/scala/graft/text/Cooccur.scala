package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-level co-occurrence / PMI association mining: for every
  * unordered term pair that co-occurs in at least `minPairDf` documents,
  * pmi = ln(P(a,b) / (P(a)·P(b))) over document frequencies — the
  * classic word-association signal (collocation discovery, topic drift
  * monitoring, tokenizer-merge candidates in a training-data pipeline).
  *
  * Scale shape: per-document DISTINCT terms explode once (map-side), term
  * document-frequencies are a word-count aggregate, and the pair stream is
  * a per-document self-join keyed on the doc id — quadratic in one
  * document's distinct vocabulary (inherent to co-occurrence counting;
  * docs are length-bounded upstream by curation, so per-task work is
  * bounded by the longest doc, not the corpus). The pair aggregate is
  * map-side combined; nothing corpus-quadratic exists anywhere.
  *
  * Determinism: all counts are exact longs; the PMI double is the
  * identical operation tree on both engines, rounded to 6 dp.
  */
object Cooccur {

  /** @return (term_a, term_b, pair_df, df_a, df_b, pmi) with
    *         term_a < term_b, pair_df >= minPairDf, ordered by pair */
  def pmiPairs(docs: DataFrame, id: String, text: String,
      minPairDf: Long = 2L): DataFrame = {
    val toks = docs
      .select(col(id).as("__doc"),
        explode(array_distinct(split(col(text), " "))).as("term"))

    val n = docs.select(col(id)).agg(count(lit(1)).cast("long").as("__n"))

    val dfT = toks.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))

    val a = toks.select(col("__doc"), col("term").as("term_a"))
    val b = toks.select(col("__doc"), col("term").as("term_b"))
    val pairDf = a.join(b, "__doc")
      .filter(col("term_a") < col("term_b"))
      .groupBy(col("term_a"), col("term_b"))
      .agg(count(lit(1)).cast("long").as("pair_df"))
      .filter(col("pair_df") >= minPairDf)

    val pmi = log(
      (col("pair_df").cast("double") * col("__n").cast("double")) /
        (col("df_a").cast("double") * col("df_b").cast("double")))

    pairDf
      .join(dfT.select(col("term").as("term_a"), col("df").as("df_a")), "term_a")
      .join(dfT.select(col("term").as("term_b"), col("df").as("df_b")), "term_b")
      .crossJoin(broadcast(n))
      .select(col("term_a"), col("term_b"), col("pair_df"),
        col("df_a"), col("df_b"), round(pmi, 6).as("pmi"))
  }
}
