package graft.dedup

import graft.SparkSpecBase

class ContaminationSpec extends SparkSpecBase {
  import spark.implicits._

  test("flags train docs sharing an n-gram with eval, with exact counts") {
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("doc_id", "text")
    val train = Seq(
      // contains eval 5-grams "the quick brown fox jumps" etc.
      (1L, "today the quick brown fox jumps over a fence"),
      (2L, "completely unrelated words that never overlap anything at all"),
      // exact copy: every one of its 6 distinct 5-grams is contaminated
      (3L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("doc_id", "text")

    val out = Contamination.ngramOverlap(train, eval, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    // doc 1: 5 distinct 5-grams, 2 hits ("the quick brown fox jumps",
    //        "quick brown fox jumps over")
    // doc 2: absent (zero hits)
    // doc 3: 6 of 6 hit
    assert(out === Array(
      (1L, 5L, 2L, 0.4),
      (3L, 6L, 6L, 1.0)))
  }

  test("train docs shorter than n tokens are never flagged") {
    val eval = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val train = Seq((2L, "a b c")).toDF("doc_id", "text")
    assert(Contamination.ngramOverlap(train, eval, "doc_id", "text", n = 5)
      .isEmpty)
  }

  test("broadcast route and inverted-index equi-join route agree") {
    // maxBroadcastHashes = 0 forces the join route on the same inputs;
    // both routes share the md5 shingle kernel so they must agree exactly.
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "pack my box with five dozen liquor jugs right now")
    ).toDF("doc_id", "text")
    val train = Seq(
      (1L, "today the quick brown fox jumps over a fence"),
      (2L, "completely unrelated words that never overlap anything at all"),
      (3L, "the quick brown fox jumps over the lazy dog tonight"),
      (4L, "she said pack my box with five dozen liquor jugs right now please")
    ).toDF("doc_id", "text")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    val broadcastRoute =
      rows(Contamination.ngramOverlap(train, eval, "doc_id", "text", n = 5))
    val joinRoute = rows(Contamination.ngramOverlap(train, eval, "doc_id",
      "text", n = 5, maxBroadcastHashes = 0))
    assert(broadcastRoute.nonEmpty)
    assert(broadcastRoute === joinRoute)
  }

  test("empty eval side flags nothing") {
    val eval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val train = Seq((1L, "a b c d e f g h i j k l m n")).toDF("doc_id", "text")
    assert(Contamination.ngramOverlap(train, eval, "doc_id", "text", n = 13)
      .isEmpty)
  }
}
