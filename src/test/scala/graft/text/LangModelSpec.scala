package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram-LM perplexity: hand-computed Laplace model on a tiny corpus,
  * OOV accounting, sub-bigram exclusion, broadcast/join route parity,
  * and partitioning independence. */
class LangModelSpec extends SparkSpecBase {

  import spark.implicits._

  private val reference = Seq(
    (101L, "the cat sat"),
    (102L, "the cat ran"),
    (103L, "a dog ran")).toDF("doc_id", "text")

  // Reference model: vocabulary {the, cat, sat, ran, a, dog} → V = 6.
  // Unigrams: c(the)=2, c(cat)=2, c(sat)=1, c(ran)=2, c(a)=1, c(dog)=1.
  // Bigrams: "the cat"×2, "cat sat", "cat ran", "a dog", "dog ran".
  private val V = 6L

  private def term(cuw: Long, cu: Long): Double =
    -math.log((cuw + 1).toDouble / (cu + V))

  private def score(corpus: DataFrame,
      maxEntries: Int = LangModel.MaxBroadcastEntries): Map[Long, (Long, Double, Double, Double)] =
    LangModel.perplexity(corpus, reference, "doc_id", "text", maxEntries)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("oov_frac"), r.getAs[Double]("nll"),
        r.getAs[Double]("ppl")))).toMap

  private def expected(terms: Seq[Double], oov: Long): (Long, Double, Double, Double) = {
    val n = terms.length.toLong
    val nll = BigDecimal(terms.sum / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ppl = BigDecimal(math.exp(nll))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val oovFrac = BigDecimal(oov.toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (n, oovFrac, nll, ppl)
  }

  test("hand-computed Laplace terms: in-vocabulary and OOV bigrams") {
    val corpus = Seq(
      (1L, "the cat sat"),   // both bigrams seen
      (2L, "the dog sat"),   // "the dog" unseen (known words), "dog sat" unseen
      (3L, "zz qq")          // fully OOV: c_uw = 0, c_u = 0
    ).toDF("doc_id", "text")
    val got = score(corpus)
    assert(got(1L) === expected(Seq(term(2, 2), term(1, 2)), 0))
    assert(got(2L) === expected(Seq(term(0, 2), term(0, 1)), 2))
    assert(got(3L) === expected(Seq(term(0, 0)), 1))
  }

  test("reference-like docs score lower perplexity than gibberish") {
    val corpus = Seq(
      (1L, "the cat sat"),
      (2L, "qq zz pp ww")).toDF("doc_id", "text")
    val got = score(corpus)
    assert(got(1L)._4 < got(2L)._4)
    assert(got(2L)._2 === 1.0) // all bigrams unseen
  }

  test("docs with fewer than two tokens are omitted") {
    val corpus = Seq(
      (1L, "single"), (2L, ""), (3L, "the cat")).toDF("doc_id", "text")
    val got = score(corpus)
    assert(got.keySet === Set(3L))
  }

  test("broadcast and join routes agree exactly after rounding") {
    val corpus = Seq(
      (1L, "the cat sat on a dog"),
      (2L, "a dog ran past the cat quickly"),
      (3L, "zz the the the zz"),
      (4L, "cat cat cat")).toDF("doc_id", "text")
    val broadcastRoute = score(corpus)
    val joinRoute = score(corpus, maxEntries = 0)
    assert(broadcastRoute === joinRoute)
    assert(broadcastRoute.keySet === Set(1L, 2L, 3L, 4L))
  }

  test("null id or null text drops the row on BOTH routes (family convention)") {
    val corpus = Seq(
      (java.lang.Long.valueOf(1L), "the cat sat"),
      (java.lang.Long.valueOf(2L), null: String),        // null text
      (null.asInstanceOf[java.lang.Long], "a dog ran"),  // null id
      (java.lang.Long.valueOf(4L), "the cat ran")
    ).toDF("doc_id", "text")
    val broadcastRoute = score(corpus)
    val joinRoute = score(corpus, maxEntries = 0)
    assert(broadcastRoute === joinRoute)
    assert(broadcastRoute.keySet === Set(1L, 4L))
  }

  test("scores are independent of corpus partitioning") {
    val corpus = (1L to 40L)
      .map(i => (i, s"the cat sat ${i % 5} times and ran"))
      .toDF("doc_id", "text")
    val one = score(corpus.repartition(1))
    val many = score(corpus.repartition(13))
    assert(one === many)
  }
}
