package graft.text

import graft.SparkSpecBase

class RepetitionSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(texts: (Long, String)*) =
    TextMetrics.repetition(texts.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))

  test("repetition fractions match hand-computed values") {
    val out = run(
      1L -> "a b a b a",       // top 2-gram "a b"x2 -> 0.8; top 3-gram x2 -> 1.2
      2L -> "x",               // too short for any n-gram
      3L -> "p q r s t u v w", // all n-grams unique
      4L -> "a a a a a a")     // max repetition; 5-grams: 2 occ, 1 distinct
    assert(out === Array(
      (1L, 5L, 0.8, 1.2, 0.0),
      (2L, 1L, 0.0, 0.0, 0.0),
      (3L, 8L, 0.25, 0.375, 0.0),
      (4L, 6L, 1.666667, 2.0, 0.5)))
  }

  test("trailing space keeps the empty token (string_split parity)") {
    // "a b " splits to [a, b, ""] under limit -1 — 3 tokens, no repeats.
    val out = run(1L -> "a b ")
    assert(out === Array((1L, 3L, 0.666667, 1.0, 0.0)))
  }

  test("empty text is one empty token") {
    val out = run(1L -> "")
    assert(out === Array((1L, 1L, 0.0, 0.0, 0.0)))
  }
}
