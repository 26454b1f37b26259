package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus curation: the end-of-pipeline keep/drop decision table a
  * training-data pipeline gates on (the C4 / Gopher / RefinedWeb rule
  * family — length, mean word length, stopword density, in-document
  * repetition, exact duplication), composed from this repo's text
  * signals into ONE decision row per document.
  *
  * Reference behavior: FiniexTestingIDE gates ingest on per-batch
  * quality/error classification before any analytics run
  * (`python/framework/importer/` quality gates); this operator is the
  * corpus-scale analogue for LLM training data.
  *
  * Plan shape (the part that matters at 100 TB):
  *   - ONE scan: every per-doc signal (token/char counts, stopword hits,
  *     top-2-gram count, content digest) comes out of a single
  *     `mapPartitions` kernel — per-doc work is embarrassingly parallel,
  *     so an operator-composition form (metrics ⋈ repetition ⋈ dedup)
  *     would re-read the corpus three times for nothing (the q85
  *     plan-audit lesson: consumers of separate scans don't reuse
  *     exchanges).
  *   - ONE exchange: exact-dup detection is `min(id) OVER (PARTITION BY
  *     digest)` over the kernel's 32-byte digest — the only shuffle, and
  *     it moves fixed-width signal rows, never the text.
  *   - The decision itself is pure Catalyst CASE work on rounded signals
  *     (round(…) on BOTH engines absorbs summation-order ULP, the
  *     registry convention).
  *
  * Signal semantics match the siblings exactly: `n_tokens`/`avg_token_len`
  * /`stopword_ratio` as in [[TextMetrics.metrics]] (q25),
  * `top2gram_frac` as in [[TextMetrics.repetition]] (q82), `digest` as in
  * `Dedup.exact` (q26, byte-level md5 parity).
  */
object Curation {

  /** Drop thresholds. Defaults are the Gopher-flavored bounds phrased
    * against this corpus family: docs shorter than `minTokens` or longer
    * than `maxTokens`, mean word length outside
    * [`minAvgTokenLen`, `maxAvgTokenLen`], stopword ratio under
    * `minStopwordRatio`, or a top-2-gram coverage over `maxTop2gramFrac`
    * are dropped; non-canonical exact duplicates always drop first. */
  final case class Rules(
      minTokens: Long = 20L,
      maxTokens: Long = 100000L,
      minAvgTokenLen: Double = 3.0,
      maxAvgTokenLen: Double = 10.0,
      minStopwordRatio: Double = 0.01,
      maxTop2gramFrac: Double = 0.2)

  /** Rule precedence (first failing rule names the drop): exact_dup,
    * too_short, too_long, bad_token_len, low_stopword, repetitive. */
  val ReasonKeep = "keep"

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Count of the most frequent word 2-gram (0 for 1-token docs) — the
    * same hashmap walk as `TextMetrics.topNgramCount`, inlined here so
    * the curation kernel stays one pass. */
  private def top2Count(toks: Array[String]): Long = {
    val m = toks.length - 1
    if (m <= 0) 0L
    else {
      val hm = new java.util.HashMap[String, Integer](m * 2)
      val sb = new java.lang.StringBuilder
      var best = 0
      var i = 0
      while (i < m) {
        sb.setLength(0)
        sb.append(toks(i)).append(' ').append(toks(i + 1))
        val c = hm.merge(sb.toString, 1, (a: Integer, b: Integer) => a + b)
        if (c > best) best = c
        i += 1
      }
      best.toLong
    }
  }

  /** Per-document curation decision table: signals + `is_dup` + `keep` +
    * `verdict` (the first failing rule, or "keep"). One scan, one
    * digest-partitioned exchange; null id/text rows are dropped like the
    * dedup kernels. */
  def decide(df: DataFrame, id: String, text: String,
             rules: Rules = Rules(),
             stopwords: Seq[String] = TextMetrics.LangMarkers.toMap.apply("en"))
      : DataFrame = {
    val idType = df.schema(id).dataType
    val kernelSchema = StructType(Seq(
      StructField(id, idType),
      StructField("__digest", StringType, nullable = false),
      StructField("__n_chars", LongType, nullable = false),
      StructField("__n_tokens", LongType, nullable = false),
      StructField("__stop_hits", LongType, nullable = false),
      StructField("__top2", LongType, nullable = false)))
    val stopSet = stopwords.toSet
    val signals = df.select(col(id), col(text)).mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) Iterator.empty
        else {
          val t = r.getString(1)
          val toks = t.split(" ", -1)
          var stops = 0L
          var i = 0
          while (i < toks.length) {
            if (stopSet.contains(toks(i))) stops += 1
            i += 1
          }
          Iterator.single(Row(r.get(0), md5Hex(md, t), t.length.toLong,
            toks.length.toLong, stops, top2Count(toks)))
        }
      }
    }(org.apache.spark.sql.Encoders.row(kernelSchema))

    import org.apache.spark.sql.expressions.Window
    val canonical = min(col(id)).over(Window.partitionBy(col("__digest")))
    val nTok = col("__n_tokens")
    val scored = signals.select(
      col(id),
      nTok.as("n_tokens"),
      round((col("__n_chars") - nTok + 1).cast("double") / nTok, 4)
        .as("avg_token_len"),
      round(col("__stop_hits").cast("double") / nTok, 4).as("stopword_ratio"),
      round((col("__top2") * 2).cast("double") / nTok, 6).as("top2gram_frac"),
      (canonical =!= col(id)).as("is_dup"))

    val verdict = when(col("is_dup"), "exact_dup")
      .when(col("n_tokens") < rules.minTokens, "too_short")
      .when(col("n_tokens") > rules.maxTokens, "too_long")
      .when(col("avg_token_len") < rules.minAvgTokenLen ||
        col("avg_token_len") > rules.maxAvgTokenLen, "bad_token_len")
      .when(col("stopword_ratio") < rules.minStopwordRatio, "low_stopword")
      .when(col("top2gram_frac") > rules.maxTop2gramFrac, "repetitive")
      .otherwise(ReasonKeep)
    scored
      .withColumn("verdict", verdict)
      .withColumn("keep", col("verdict") === ReasonKeep)
  }
}
