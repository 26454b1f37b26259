package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Curation decision table: every rule fires on a doc built to trip it,
  * precedence resolves multi-fault docs, and the signal columns match the
  * standalone q25/q82 operators bit-for-bit (same rounding). */
class CurationSpec extends SparkSpecBase {

  import spark.implicits._

  // Rules tightened so every branch is reachable with short test docs.
  private val rules = Curation.Rules(
    minTokens = 3L, maxTokens = 10L,
    minAvgTokenLen = 2.0, maxAvgTokenLen = 8.0,
    minStopwordRatio = 0.05, maxTop2gramFrac = 0.9)

  private def decide(docs: Seq[(Long, String)]): Map[Long, (String, Boolean)] =
    Curation.decide(docs.toDF("doc_id", "text"), "doc_id", "text", rules)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("verdict"), r.getAs[Boolean]("keep")))).toMap

  test("each rule fires on its trigger document; clean docs keep") {
    val got = decide(Seq(
      (1L, "the quick brown fox is here"),          // clean → keep
      (2L, "xs ys"),                                 // 2 tokens → too_short
      (3L, "a b c d e f g h i j k"),                 // 11 tokens → too_long
      (4L, "x y z"),                                 // avg len 1 → bad_token_len
      (5L, "apple banana cherry damson"),            // 0 stopwords → low_stopword
      (6L, "the cat the cat the cat"),               // top2 'the cat' ×3 → 6/6 = 1.0
      (7L, "the quick brown fox is here")))          // dup of 1 → exact_dup
    assert(got(1L) === (("keep", true)))
    assert(got(2L) === (("too_short", false)))
    assert(got(3L) === (("too_long", false)))
    assert(got(4L) === (("bad_token_len", false)))
    assert(got(5L) === (("low_stopword", false)))
    assert(got(6L) === (("repetitive", false)))
    assert(got(7L) === (("exact_dup", false)))
  }

  test("repetitive rule fires when repetition is the only fault") {
    // isnt×4: top2 "isnt isnt" ×3 → 6/8 = 0.75 < 0.9, stopword 'the' ok → keep
    val got = decide(Seq((1L, "isnt isnt isnt isnt the fox ran jumped")))
    // isnt×6: top2 ×5 → 10/8 = 1.25 > 0.9, every earlier rule passes → repetitive
    val got2 = decide(Seq((2L, "isnt isnt isnt isnt isnt isnt the fox")))
    assert(got(1L) === (("keep", true)))
    assert(got2(2L) === (("repetitive", false)))
  }

  test("precedence: a short duplicate reports exact_dup, not too_short") {
    val got = decide(Seq((1L, "xs"), (2L, "xs")))
    assert(got(1L) === (("too_short", false))) // canonical: min id keeps its own faults
    assert(got(2L) === (("exact_dup", false)))
  }

  test("signals match the standalone metrics/repetition operators") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a a b b a a b b a a"),
      (3L, ""),
      (4L, "unique words only here today friend"))
      .toDF("doc_id", "text")
    val cur = Curation.decide(docs, "doc_id", "text", rules)
      .select("doc_id", "n_tokens", "avg_token_len", "stopword_ratio", "top2gram_frac")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val met = TextMetrics.metrics(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "avg_token_len", "stopword_ratio")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val rep = TextMetrics.repetition(docs, "doc_id", "text")
      .select("doc_id", "top2gram_frac")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cur.foreach { case (id, s) =>
      assert(s.take(3) === met(id), s"metrics mismatch for doc $id")
      assert(s(3) === rep(id), s"top2gram mismatch for doc $id")
    }
  }

  test("dup groups: only the min id is canonical; others drop as exact_dup") {
    val got = decide(Seq(
      (5L, "the fine shared body text here"),
      (3L, "the fine shared body text here"),
      (9L, "the fine shared body text here"),
      (1L, "the some other body text here")))
    assert(got(3L) === (("keep", true)))
    assert(got(5L) === (("exact_dup", false)))
    assert(got(9L) === (("exact_dup", false)))
    assert(got(1L) === (("keep", true)))
  }

  test("null id/text rows drop like the dedup kernels") {
    val docs = Seq(
      (Option(1L), Option("the good body text here")),
      (Option.empty[Long], Option("orphan")),
      (Option(2L), Option.empty[String]))
      .toDF("doc_id", "text")
    val out = Curation.decide(docs, "doc_id", "text", rules).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(1L))
  }
}
