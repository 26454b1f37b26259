package graft.dedup

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact-substring deduplication — the span-level member of the dedup
  * family (Lee et al. 2021, "Deduplicating Training Data Makes Language
  * Models Better": any token span occurring more than once in the corpus
  * is a dedup candidate). The paper builds a corpus-wide suffix array; a
  * suffix array is a sequential, memory-resident structure that does not
  * shard, so the Spark-native form is the k-token ROLLING-WINDOW HASH
  * join: a span of ≥ k tokens is repeated iff every k-window inside it is
  * repeated, so duplicated k-windows, merged while they overlap, are
  * exactly the maximal repeated spans at k-token resolution.
  *
  * Plan shape (the part that must survive 100 TB):
  *   - the positional window-hash stream (id, pos, h) is built per-doc in
  *     ONE `mapPartitions` pass (no token explode, no string shuffle —
  *     the [[Dedup.docShingleArrays]] discipline; hashes are the family's
  *     60-bit md5 prefix, so the DuckDB oracle reproduces them exactly,
  *     collisions included);
  *   - repeated hashes come from `count(*) OVER (PARTITION BY h)`: ONE
  *     hash exchange + within-partition sort of the long stream, the
  *     SAME shape the oracle runs. The tempting `groupBy(h).count` +
  *     join-back form is WRONG at scale — the two consumers of the
  *     stream canonicalize to different exchanges, so Catalyst re-runs
  *     the scan and the md5 kernel twice (measured in the plan audit:
  *     two `Scan parquet` nodes); the window form reads the corpus
  *     once and pays a spill-safe within-partition sort instead, with
  *     zero storage (the family's "reuse the sort's shuffle, don't
  *     persist" discipline);
  *   - island-merging runs on the DUPLICATED subset only: window
  *     `lag(pos)` per doc marks span breaks (gap > k), a running sum
  *     numbers the spans, and the final groupBy reuses the window's
  *     hash-partitioning on `id` (ClusteredDistribution(id, span) is
  *     satisfied by HashPartitioning(id) — no third exchange).
  *
  * A pathological corpus ("the the the …" × 10⁹) concentrates one hash
  * into one window group; `WindowExec` buffers groups in a spillable
  * array, and the group's output is one row per occurrence, never per
  * occurrence² — count skew, not a pair explosion.
  */
object ExactSubstrings {

  /** Per-position 60-bit window hashes of one text: element `i` hashes
    * tokens `[i, i+k)`. Empty for docs shorter than k tokens. Same
    * tokenizer (`split(" ", -1)`) and md5→60-bit fold as
    * [[Dedup.shingleHashesOf]], but POSITIONAL — no sort, no dedup. */
  private[graft] def windowHashesOf(text: String, k: Int,
      md: java.security.MessageDigest): Array[Long] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val toks = text.split(" ", -1)
    val m = toks.length - k + 1
    if (m <= 0) Array.emptyLongArray
    else {
      val hs = new Array[Long](m)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        val d = md.digest(sb.toString.getBytes(utf8))
        var v = 0L; var b = 0
        while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        hs(i) = (v << 4) | ((d(7) >> 4) & 0xfL)
        i += 1
      }
      hs
    }
  }

  /** (id, pos, h): one row per k-token window, 0-based token position.
    * `withLen` appends the doc's token count `n_tokens` to every row —
    * it is a byproduct of the tokenization this pass already does, so
    * [[duplicatedSummary]] never pays a second scan (or a second run of
    * the md5 kernel) just to re-count tokens. [[duplicatedWindows]]
    * leaves it off: the extra long column would widen the h-exchange
    * for a value the span pipeline never reads. */
  private[graft] def windowHashes(df: DataFrame, id: String, text: String,
      k: Int, withLen: Boolean = false): DataFrame = {
    val idType = df.schema(id).dataType
    val base = Seq(StructField(id, idType),
      StructField("pos", LongType, nullable = false),
      StructField("h", LongType, nullable = false))
    val outSchema = StructType(
      if (withLen) base :+ StructField("n_tokens", LongType, nullable = false)
      else base)
    df.select(col(id), col(text)).mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) Iterator.empty
        else {
          val hs = windowHashesOf(r.getString(1), k, md)
          val idv = r.get(0)
          // tokens = windows + k - 1, recovered for free from the hash
          // array (docs with < k tokens emit no windows and no rows)
          val nTok = (hs.length + k - 1).toLong
          hs.iterator.zipWithIndex.map { case (h, pos) =>
            if (withLen) Row(idv, pos.toLong, h, nTok)
            else Row(idv, pos.toLong, h)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** The duplicated k-window sites: every (id, pos) whose window hash
    * occurs at ≥ 2 sites corpus-wide (other docs or elsewhere in the
    * same doc). The streaming form
    * ([[graft.streaming.StreamingSubstrings]]) emits exactly this set,
    * incrementally. */
  def duplicatedWindows(df: DataFrame, id: String, text: String,
      k: Int): DataFrame = {
    require(k >= 1, s"window size must be >= 1, got $k")
    windowHashes(df, id, text, k)
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("c") >= 2)
      .select(col(id), col("pos"))
  }

  /** Gaps-and-islands merge of duplicated window sites into maximal
    * spans: windows whose starts are ≤ k apart overlap or touch, so
    * they merge; `span_end` is exclusive. Input is any (id, pos)
    * relation of duplicated k-window sites ([[duplicatedWindows]] or
    * the streaming operator's accumulated output). `carry` names extra
    * per-document-constant input columns to keep on the output (via
    * `max`, which is the identity on a constant) — [[duplicatedSummary]]
    * threads `n_tokens` through this way instead of re-deriving it with
    * a second scan. */
  def mergeSpans(dup: DataFrame, id: String, k: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val byDoc = Window.partitionBy(col(id)).orderBy(col("pos"))
    dup
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= k, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("span", sum(col("brk")).over(byDoc))
      .groupBy(col(id), col("span"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + k).as("span_end")
          +: count(lit(1)).as("n_windows")
          +: carry.map(c => max(col(c)).as(c)): _*)
      .select(col(id) +: col("span_start") +: col("span_end")
          +: col("n_windows") +: carry.map(col): _*)
  }

  /** Maximal repeated spans at k-token resolution: for every document,
    * the token ranges `[span_start, span_end)` covered by k-windows that
    * occur at ≥ 2 sites corpus-wide, with overlapping/adjacent
    * duplicated windows merged. `n_windows` counts the duplicated
    * k-windows inside the span. */
  def duplicatedSpans(df: DataFrame, id: String, text: String,
      k: Int = 8): DataFrame =
    mergeSpans(duplicatedWindows(df, id, text, k), id, k)

  /** Per-document rollup of [[duplicatedSpans]]: total tokens inside
    * repeated spans and the repeated-token fraction — the scalar the
    * paper's ExactSubstr filter thresholds on. Docs with no repeated
    * span are omitted (the output is the dedup-candidate report).
    *
    * Single-scan: `n_tokens` rides along from the window-hash pass
    * (where it falls out of tokenization for free) through the h-count
    * filter and the span merge, so the whole summary is one corpus read —
    * the file's plan discipline. The previous form re-tokenized every
    * document in a second scan and shuffled it into a join; both
    * rollup groupBys here reuse the span window's
    * `HashPartitioning(id)`, so past the h-exchange there are no
    * further exchanges. */
  def duplicatedSummary(df: DataFrame, id: String, text: String,
      k: Int = 8): DataFrame = {
    require(k >= 1, s"window size must be >= 1, got $k")
    val dup = windowHashes(df, id, text, k, withLen = true)
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("c") >= 2)
      .select(col(id), col("pos"), col("n_tokens"))
    mergeSpans(dup, id, k, carry = Seq("n_tokens"))
      .groupBy(col(id))
      .agg(sum(col("span_end") - col("span_start")).as("dup_tokens"),
        count(lit(1)).as("n_spans"), max(col("n_tokens")).as("n_tokens"))
      .withColumn("dup_frac",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6))
      .select(col(id), col("n_tokens"), col("n_spans"), col("dup_tokens"),
        col("dup_frac"))
  }
}
