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

  /** BPE-ish subword-token regex: one match per letter run, digit run, or
    * punctuation run, each optionally absorbing one leading space — the
    * shape of GPT-2-family pre-tokenizers, reduced to character classes
    * that mean the same thing in Java regex and RE2 (so the DuckDB oracle
    * can run the identical pattern). A whitespace token count under-counts
    * LLM tokens badly on punctuation-heavy text; this is the standard
    * cheap estimator. */
  val BpeishPattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** Estimated LLM token count: number of [[BpeishPattern]] matches. */
  def tokenCountBpeish(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** Count occurrences of `word` as a whole token: filter the token array.
    * Exact (handles consecutive repeats) and expressible identically in
    * DuckDB (`len(list_filter(string_split(...), ...))`). */
  def wordCount(text: Column, word: String): Column =
    size(filter(tokenArr(text), t => t === lit(word))).cast("long")

  /** Per-document quality metrics: token/char counts, average token length,
    * unique-token (type/token) ratio, stopword ratio — the reference-style
    * length/stopword quality gates for corpus filtering.
    *
    * Stopword hits count via explode + broadcast stopword dim +
    * conditional aggregation (the [[languageId]] pattern): the previous
    * per-word `filter(tokens, …)` higher-order functions evaluated
    * interpreted, re-split the text once per reference, and pushed the
    * whole projection out of whole-stage codegen. */
  def metrics(df: DataFrame, id: String, text: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val stopDim = broadcast(
      LangMarkers.toMap.apply("en").toDF("__stop"))
    val hits = df.select(col(id), explode(tokenArr(col(text))).as("__tok"))
      .join(stopDim, col("__tok") === col("__stop"))
      .groupBy(col(id)).agg(count(lit(1)).as("__hits"))
    val toks = tokenArr(col(text))
    val nTok = size(toks)
    df.select(
        col(id),
        length(col(text)).cast("long").as("n_chars"),
        nTok.cast("long").as("n_tokens"),
        tokenCountBpeish(col(text)).as("n_tokens_bpeish"),
        size(array_distinct(toks)).cast("long").as("n_unique_tokens"),
        round((length(col(text)) - nTok + 1).cast("double") / nTok, 4).as("avg_token_len"),
        round(size(array_distinct(toks)).cast("double") / nTok, 4).as("type_token_ratio"))
      .join(hits, Seq(id), "left")
      .na.fill(0L, Seq("__hits"))
      .select(col(id), col("n_chars"), col("n_tokens"), col("n_tokens_bpeish"),
        col("n_unique_tokens"), col("avg_token_len"), col("type_token_ratio"),
        col("__hits").as("stopword_hits"),
        round(col("__hits").cast("double") / col("n_tokens"), 4).as("stopword_ratio"))
  }

  /** Language ID: score each candidate language by marker-stopword hits,
    * pick the max (ties → lexicographically first language; all-zero →
    * "und" undetermined).
    *
    * Scored as ONE pass: explode tokens, equi-join the broadcast marker
    * dimension, conditional-sum per language. The per-marker
    * `filter(tokens, …)` form this replaces ran 25 higher-order-function
    * scans per row — HOFs evaluate interpreted and push the whole
    * projection out of whole-stage codegen. The join form is all
    * codegen'd operators, does map-side partial aggregation, and at scale
    * is the classic broadcast-dim pattern. Zero-hit docs re-enter via a
    * left join and classify as "und". */
  def languageId(df: DataFrame, id: String, text: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val markers = broadcast(
      LangMarkers.flatMap { case (l, ws) => ws.map(w => (l, w)) }
        .toDF("__lang", "__tok"))
    val hits = df.select(col(id), explode(tokenArr(col(text))).as("__tok"))
      .join(markers, "__tok")
    val scoreAggs = LangMarkers.map { case (lang, _) =>
      sum(when(col("__lang") === lang, 1L).otherwise(0L)).as(s"__s_$lang")
    }
    val counts = hits.groupBy(col(id)).agg(scoreAggs.head, scoreAggs.tail: _*)
    val scored = df.select(col(id)).join(counts, Seq(id), "left")
      .na.fill(0L, LangMarkers.map { case (lang, _) => s"__s_$lang" })
    val m = greatest(LangMarkers.map { case (lang, _) => col(s"__s_$lang") }: _*)
    val pick = LangMarkers.foldLeft(when(m === 0L, "und")) {
      case (acc, (lang, _)) => acc.when(col(s"__s_$lang") === m, lang)
    }
    scored.select(col(id), pick.as("predicted_lang"), m.as("marker_hits"))
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
