package graft.dedup

import graft.SparkSpecBase
import org.apache.spark.sql.Row

/** Exact-substring dedup: span semantics against hand-computed cases and
  * a brute-force mirror model. */
class ExactSubstringsSpec extends SparkSpecBase {

  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long, Long)] =
    ExactSubstrings.duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  /** Brute-force mirror: duplicated k-windows by literal string equality,
    * merged while gap <= k. */
  private def model(docs: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long, Long)] = {
    val wins = docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      (0 to toks.length - k).map(i => (id, i.toLong, toks.slice(i, i + k).mkString(" ")))
    }
    val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val dup = wins.filter(w => counts(w._3) >= 2)
    dup.groupBy(_._1).toSeq.flatMap { case (id, ws) =>
      val ps = ws.map(_._2).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var start = ps.head; var last = ps.head; var n = 1L
      ps.tail.foreach { p =>
        if (p - last <= k) { last = p; n += 1 }
        else { out += ((id, start, last + k, n)); start = p; last = p; n = 1L }
      }
      out += ((id, start, last + k, n))
      out.toSeq
    }.sortBy(t => (t._1, t._2))
  }

  test("cross-doc repeated span is found and maximal") {
    // docs 1 and 2 share tokens a..j (10 tokens) => with k=3, windows
    // 0..7 duplicated in both, one span [0, 10) in doc 1, [2, 12) in doc 2
    val shared = ('a' to 'j').map(_.toString).mkString(" ")
    val docs = Seq(
      1L -> (shared + " x y z"),
      2L -> ("p q " + shared + " w"))
    val got = spans(docs, k = 3)
    assert(got === Seq((1L, 0L, 10L, 8L), (2L, 2L, 12L, 8L)))
  }

  test("within-doc repetition counts as duplication") {
    // "m n o" appears twice inside one doc; no other doc involved
    val docs = Seq(3L -> "m n o u v w m n o")
    val got = spans(docs, k = 3)
    // windows at pos 0 and 6 duplicated; gap 6 > k=3 => two spans
    assert(got === Seq((3L, 0L, 3L, 1L), (3L, 6L, 9L, 1L)))
  }

  test("duplicated windows with gap > k stay separate spans") {
    val docs = Seq(
      10L -> "a b c GAP1 d e f",
      11L -> "a b c GAP2 d e f")
    val got = spans(docs, k = 3)
    // pos 0 (a b c) and pos 4 (d e f) duplicated; gap 4 - 0 = 4 > k=3
    // => NOT merged: two spans each
    assert(got === Seq(
      (10L, 0L, 3L, 1L), (10L, 4L, 7L, 1L),
      (11L, 0L, 3L, 1L), (11L, 4L, 7L, 1L)))
  }

  test("duplicated windows exactly k apart touch and merge into one span") {
    // doc 10: "a b c" duplicated at pos 0 (vs doc 11) and "d e f" at
    // pos 3 (vs doc 12); gap 3 - 0 = 3 == k => the windows touch
    // ([0,3) + [3,6)) and merge into one span [0,6) of 2 windows
    val docs = Seq(
      10L -> "a b c d e f",
      11L -> "a b c x y z",
      12L -> "q r d e f s")
    val got = spans(docs, k = 3)
    assert(got === Seq(
      (10L, 0L, 6L, 2L), (11L, 0L, 3L, 1L), (12L, 2L, 5L, 1L)))
  }

  test("docs shorter than k emit nothing; null text tolerated") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(20L, "a b"), Row(21L, null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    assert(ExactSubstrings.duplicatedSpans(df, "doc_id", "text", 3).count() === 0L)
  }

  test("matches the brute-force model on a randomized near-dup corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val base = Vector.fill(40)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val docs = (0L until 30L).map { i =>
      if (i % 3 == 0) i -> base // exact copies
      else if (i % 3 == 1) { // perturbed copy
        val toks = base.split(" ").toVector
        val j = rnd.nextInt(toks.length)
        i -> toks.updated(j, "zz" + i).mkString(" ")
      } else i -> Vector.fill(40)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    assert(spans(docs, k = 5) === model(docs, k = 5))
  }

  test("duplicatedSummary rolls spans up per doc") {
    val shared = ('a' to 'j').map(_.toString).mkString(" ")
    val docs = Seq(1L -> (shared + " x y z"), 2L -> ("p q " + shared + " w"))
    val got = ExactSubstrings.duplicatedSummary(
        docs.toDF("doc_id", "text"), "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    // doc 1: 13 tokens, one span of 10 dup tokens; doc 2: 13 tokens, same
    assert(got === Seq(
      (1L, 13L, 1L, 10L, 0.769231),
      (2L, 13L, 1L, 10L, 0.769231)))
  }
}
