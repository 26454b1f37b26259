package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language ID (stopword heuristic), and document fingerprinting.
  * Everything is built from codegen'd built-ins (split/length/md5/…);
  * no UDFs, so plans stay inside whole-stage codegen at any scale.
  */
object TextMetrics {

  /** Small language-marker stopword lists for the n-gram/stopword
    * language-ID heuristic. Deterministic and self-contained. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  private def tokenArr(text: Column): Column = split(text, " ")

  /** Count occurrences of `word` as a whole token: filter the token array.
    * Exact (handles consecutive repeats) and expressible identically in
    * DuckDB (`len(list_filter(string_split(...), ...))`). */
  def wordCount(text: Column, word: String): Column =
    size(filter(tokenArr(text), t => t === lit(word))).cast("long")

  /** Per-document quality metrics: token/char counts, average token length,
    * unique-token (type/token) ratio, stopword ratio — the reference-style
    * length/stopword quality gates for corpus filtering. */
  def metrics(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = tokenArr(col(text))
    val nTok = size(toks)
    val stopHits = LangMarkers.toMap.apply("en")
      .map(wordCount(col(text), _)).reduce(_ + _)
    df.select(
      col(id),
      length(col(text)).cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_unique_tokens"),
      round((length(col(text)) - nTok + 1).cast("double") / nTok, 4).as("avg_token_len"),
      round(size(array_distinct(toks)).cast("double") / nTok, 4).as("type_token_ratio"),
      stopHits.as("stopword_hits"),
      round(stopHits.cast("double") / nTok, 4).as("stopword_ratio"))
  }

  /** Language ID: score each candidate language by marker-stopword hits,
    * pick the max (ties → lexicographically first language; all-zero →
    * "und" undetermined). */
  def languageId(df: DataFrame, id: String, text: String): DataFrame = {
    val scored = LangMarkers.map { case (lang, words) =>
      val score = words.map(wordCount(col(text), _)).reduce(_ + _)
      struct(score.as("score"), lit(lang).as("lang"))
    }
    // greatest(...) on struct orders by score then lang; we want ties to take
    // the FIRST lang alphabetically, so invert: order by (score, reverse-lang)
    // via array_max over structs with negated tiebreak is awkward — instead
    // sort structs (score desc, lang asc) via array_sort comparator.
    val arr = array(scored: _*)
    val best = element_at(array_sort(arr,
      (l, r) => when(l.getField("score") > r.getField("score"), -1)
        .when(l.getField("score") < r.getField("score"), 1)
        .when(l.getField("lang") < r.getField("lang"), -1)
        .when(l.getField("lang") > r.getField("lang"), 1)
        .otherwise(0)), 1)
    df.select(
      col(id),
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
        .as("predicted_lang"),
      best.getField("score").as("marker_hits"))
  }

  /** Order-insensitive content fingerprint: md5 over the sorted distinct
    * token set (bag-of-words identity), plus the raw-text md5. */
  def fingerprint(df: DataFrame, id: String, text: String): DataFrame =
    df.select(
      col(id),
      md5(col(text)).as("text_md5"),
      md5(array_join(array_sort(array_distinct(tokenArr(col(text)))), " "))
        .as("bow_md5"))
}
