package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Sequence packing: parity with the single-partition window-cumsum
  * definition, the packing invariants (full windows, exact per-doc
  * coverage), and partitioning-independence of the distributed prefix
  * sum. */
class PackingSpec extends SparkSpecBase {

  import spark.implicits._

  private def corpus(n: Int, seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      val toks = 1 + rnd.nextInt(40)
      (i, Seq.fill(toks)(s"w${rnd.nextInt(50)}").mkString(" "))
    }
  }

  /** The semantic spec: window cumsum + per-window slicing, computed on
    * the driver from the same token counts. */
  private def model(docs: Seq[(Long, String)], L: Long): Seq[(Long, Long, Long, Long, Long)] = {
    var start = 0L
    docs.sortBy(_._1).flatMap { case (id, text) =>
      val n = text.split(" ", -1).length.toLong
      val s = start
      start += n
      (s / L to (s + n - 1) / L).map { seq =>
        val fs = math.max(s, seq * L)
        val fe = math.min(s + n, (seq + 1) * L)
        (id, seq, fs - s, fs - seq * L, fe - fs)
      }
    }
  }

  private def run(docs: Seq[(Long, String)], L: Long, parts: Int) =
    Packing.fragments(docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", L)
      .orderBy(col("doc_id"), col("seq_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  test("matches the window-cumsum model exactly (multi-partition input)") {
    val docs = corpus(200, seed = 11)
    assert(run(docs, L = 64, parts = 7) === model(docs, 64))
  }

  test("every sequence except the last is exactly full") {
    val docs = corpus(150, seed = 3)
    val L = 32L
    val bySeq = run(docs, L, parts = 5).groupBy(_._2).view
      .mapValues(_.map(_._5).sum).toMap
    val last = bySeq.keys.max
    bySeq.foreach { case (seq, tot) =>
      if (seq < last) assert(tot === L, s"seq $seq not full")
      else assert(tot >= 1 && tot <= L)
    }
  }

  test("fragments of a doc partition its tokens in order") {
    val docs = corpus(120, seed = 9)
    run(docs, L = 48, parts = 4).groupBy(_._1).foreach { case (id, frags) =>
      val n = docs.find(_._1 == id).get._2.split(" ", -1).length.toLong
      val sorted = frags.sortBy(_._2)
      assert(sorted.map(_._5).sum === n, s"doc $id coverage")
      // doc offsets chain: each fragment starts where the previous ended
      sorted.foldLeft(0L) { case (expect, (_, _, docOff, _, nToks)) =>
        assert(docOff === expect, s"doc $id fragment gap")
        docOff + nToks
      }
    }
  }

  test("result is independent of input partitioning") {
    val docs = corpus(100, seed = 21)
    assert(run(docs, L = 64, parts = 1) === run(docs, L = 64, parts = 13))
  }

  test("boundary-crossing doc splits with correct in-sequence offsets") {
    // L=4: doc 1 occupies [0,3), doc 2 [3,9) -> fragments (3,1),(4,2)
    val docs = Seq((1L, "a b c"), (2L, "d e f g h i"))
    val got = run(docs, L = 4, parts = 2)
    assert(got === Seq(
      (1L, 0L, 0L, 0L, 3L),
      (2L, 0L, 0L, 3L, 1L),
      (2L, 1L, 1L, 0L, 4L),
      (2L, 2L, 5L, 0L, 1L)))
  }

  test("empty text occupies one slot (one empty token)") {
    val got = run(Seq((1L, ""), (2L, "a b")), L = 8, parts = 1)
    assert(got === Seq((1L, 0L, 0L, 0L, 1L), (2L, 0L, 0L, 1L, 2L)))
  }
}
