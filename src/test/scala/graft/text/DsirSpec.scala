package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** DSIR importance weights: hand-checked feature counts, parity with an
  * independent brute-force model, and the score-direction property the
  * operator exists for (target-like docs outrank dissimilar ones). */
class DsirSpec extends SparkSpecBase {

  import spark.implicits._

  /** Brute-force mirror: same hashing via the public kernel, but
    * probabilities and the dot product derived independently with plain
    * collections (no run-length, no sorted-array walk). */
  private def model(docs: Seq[(Long, String, Boolean)]): Map[Long, (Long, Double)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def feats(text: String): Seq[Int] = Dsir.bucketsOf(text, md).toSeq
    val B = Dsir.NumBuckets
    val ct = new Array[Long](B); val cr = new Array[Long](B)
    docs.foreach { case (_, t, tgt) =>
      feats(t).foreach(b => if (tgt) ct(b) += 1 else cr(b) += 1)
    }
    val st = ct.sum.toDouble + B
    val sr = cr.sum.toDouble + B
    def lr(b: Int): Double =
      math.log((ct(b) + 1.0) / st) - math.log((cr(b) + 1.0) / sr)
    docs.filterNot(_._3).map { case (id, t, _) =>
      val fs = feats(t)
      val w = fs.map(lr).sum
      id -> (fs.size.toLong,
        BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
  }

  private def weights(docs: Seq[(Long, String, Boolean)]): Map[Long, (Long, Double)] =
    Dsir.importanceWeights(
        docs.toDF("doc_id", "text", "tgt"), "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("n_features counts unigrams + bigrams (2n - 1)") {
    val got = weights(Seq(
      (1L, "a b c d", false),    // 4 + 3 = 7
      (2L, "solo", false),       // 1 + 0 = 1
      (3L, "t t t", true)))
    assert(got(1L)._1 === 7L)
    assert(got(2L)._1 === 1L)
    assert(!got.contains(3L))    // target docs fit the model, never score
  }

  test("target-like documents outrank dissimilar ones") {
    val target = (10L until 20L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog", true))
    val docs = target ++ Seq(
      (1L, "the quick brown fox jumps high", false),
      (2L, "completely unrelated statistical mechanics lecture notes", false))
    val got = weights(docs)
    assert(got(1L)._2 > got(2L)._2)
  }

  test("matches the brute-force model on a randomized corpus") {
    val rnd = new scala.util.Random(7)
    val vocabT = Vector("alpha", "beta", "gamma", "delta")
    val vocabR = Vector("epsilon", "zeta", "eta", "theta", "alpha")
    def doc(v: Vector[String], n: Int) =
      Vector.fill(n)(v(rnd.nextInt(v.length))).mkString(" ")
    val docs = (0L until 40L).map { i =>
      if (i % 4 == 0) (i, doc(vocabT, 8 + rnd.nextInt(8)), true)
      else (i, doc(vocabR, 8 + rnd.nextInt(8)), false)
    }
    val got = weights(docs)
    val want = model(docs)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, (n, w)) =>
      assert(n === want(id)._1, s"n_features mismatch for doc $id")
      assert(math.abs(w - want(id)._2) < 2e-6, s"logw mismatch for doc $id")
    }
  }

  test("empty text scores: one empty-string unigram, no bigrams") {
    val got = weights(Seq((1L, "", false), (2L, "x y", true)))
    assert(got(1L)._1 === 1L)
  }
}
