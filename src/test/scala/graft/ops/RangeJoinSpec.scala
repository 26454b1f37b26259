package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** J3/U3: bucketed interval joins vs a naive nested-loop reference on
  * random data — every pair exactly once, no bucket-boundary dupes. */
class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private def intervals(n: Int, tag: String) = (0 until n).map { i =>
    val s = rnd.nextInt(10000).toLong
    (s"$tag$i", s, s + 1 + rnd.nextInt(800).toLong)
  }

  test("intervalOverlap matches the naive quadratic join exactly") {
    val ls = intervals(120, "L")
    val rs = intervals(90, "R")
    val left = ls.toDF("lid", "ls", "le")
    val right = rs.toDF("rid", "rs", "re")
    val expected = (for {
      (lid, s1, e1) <- ls; (rid, s2, e2) <- rs
      if s1 <= e2 && s2 <= e1
    } yield (lid, rid)).toSet
    // width much smaller than interval length → heavy multi-bucket explode
    for (width <- Seq(64L, 500L, 5000L)) {
      val got = RangeJoin.intervalOverlap(left, right, Seq.empty,
        "ls", "le", "rs", "re", width)
        .select("lid", "rid").as[(String, String)].collect().toSeq
      assert(got.size === got.toSet.size, s"dupes at width $width")
      assert(got.toSet === expected, s"mismatch at width $width")
    }
  }

  test("intervalOverlap respects equi-keys") {
    val left = Seq(("k1", 0L, 10L), ("k2", 0L, 10L)).toDF("key", "ls", "le")
    val right = Seq(("k1", 5L, 15L)).toDF("key", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, right, Seq("key"),
      "ls", "le", "rs", "re", 8L).select("key").as[String].collect()
    assert(got.toSeq === Seq("k1"))
  }

  test("pointInInterval matches the naive containment join") {
    val pts = (0 until 300).map(i => (i, rnd.nextInt(10000).toLong))
    val ivs = intervals(50, "I")
    val points = pts.toDF("pid", "t")
    val ranges = ivs.toDF("iid", "is", "ie")
    val expected = (for {
      (pid, t) <- pts; (iid, s, e) <- ivs if t >= s && t <= e
    } yield (pid, iid)).toSet
    val got = RangeJoin.pointInInterval(points, ranges, Seq.empty,
      "t", "is", "ie", 128L)
      .select("pid", "iid").as[(Int, String)].collect()
    assert(got.toSet === expected)
    assert(got.length === expected.size)
  }

  test("mergeIntervals merges overlapping and slack-adjacent runs") {
    val df = Seq(
      ("u", 0L, 10L), ("u", 5L, 20L),   // overlap -> one island
      ("u", 25L, 30L),                   // 5 beyond 20: merges only with slack>=5
      ("u", 100L, 110L),                 // always separate
      ("v", 0L, 1L))
      .toDF("key", "s", "e")
    val strict = RangeJoin.mergeIntervals(df, Seq("key"), "s", "e")
      .orderBy("key", "s").select("key", "s", "e", "n_merged")
      .as[(String, Long, Long, Long)].collect()
    assert(strict.toSeq === Seq(("u", 0L, 20L, 2L), ("u", 25L, 30L, 1L),
      ("u", 100L, 110L, 1L), ("v", 0L, 1L, 1L)))
    val slack = RangeJoin.mergeIntervals(df, Seq("key"), "s", "e", slackMs = 5L)
      .orderBy("key", "s").select("key", "s", "e", "n_merged")
      .as[(String, Long, Long, Long)].collect()
    assert(slack.toSeq === Seq(("u", 0L, 30L, 3L),
      ("u", 100L, 110L, 1L), ("v", 0L, 1L, 1L)))
  }

  test("mergeIntervals handles an interval contained in a prior one") {
    // [0,100] then [10,20]: cumulative-max end keeps the island open
    val df = Seq(("u", 0L, 100L), ("u", 10L, 20L), ("u", 90L, 120L))
      .toDF("key", "s", "e")
    val got = RangeJoin.mergeIntervals(df, Seq("key"), "s", "e")
      .select("key", "s", "e", "n_merged")
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("u", 0L, 120L, 3L)))
  }
}
