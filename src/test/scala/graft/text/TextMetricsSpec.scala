package graft.text

import graft.SparkSpecBase

class TextMetricsSpec extends SparkSpecBase {
  import spark.implicits._

  test("metrics: counts, ratios, consecutive stopwords counted exactly") {
    val df = Seq((1L, "the the cat is a cat")).toDF("doc_id", "text")
    val m = TextMetrics.metrics(df, "doc_id", "text").collect().head
    assert(m.getAs[Long]("n_tokens") === 6L)
    assert(m.getAs[Long]("n_unique_tokens") === 4L)
    // stopwords: the, the, is, a -> 4 (consecutive 'the the' both counted)
    assert(m.getAs[Long]("stopword_hits") === 4L)
    assert(m.getAs[Long]("n_chars") === 20L)
    assert(m.getAs[Long]("n_tokens_bpeish") === 6L) // pure words: = whitespace count
  }

  test("BPE-ish token count splits punctuation and digit runs like a pre-tokenizer") {
    val df = Seq(
      (1L, "don't stop!!"),     // don | ' | t | _stop | !! -> 5
      (2L, "v1.2.3 (beta)"),    // v | 1 | . | 2 | . | 3 | _( | beta | ) -> 9
      (3L, "plain words only")  // 3 -> whitespace count agrees on clean text
    ).toDF("doc_id", "text")
    val out = TextMetrics.metrics(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_tokens_bpeish") === 5L)
    assert(out(1).getAs[Long]("n_tokens_bpeish") === 9L)
    assert(out(2).getAs[Long]("n_tokens_bpeish") === 3L)
    assert(out(0).getAs[Long]("n_tokens") === 2L) // whitespace count under-counts
  }

  test("languageId: picks max-scoring language, tie -> lexicographically first") {
    val df = Seq(
      (1L, "the cat and the dog"),   // en markers: the,and,the -> 3
      (2L, "el la le xyz"),          // es: el,la=2; fr: le,la=2 -> tie -> es? (es before fr, both 2... de=0)
      (3L, "zzz yyy xxx")            // no markers -> und
    ).toDF("doc_id", "text")
    val out = TextMetrics.languageId(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("predicted_lang") === "en")
    // 'la' is in both es and fr lists; es and fr both score 2 -> 'es' wins tie
    assert(out(1).getAs[String]("predicted_lang") === "es")
    assert(out(1).getAs[Long]("marker_hits") === 2L)
    assert(out(2).getAs[String]("predicted_lang") === "und")
  }

  test("fingerprint: bow_md5 is word-order insensitive, text_md5 is not") {
    val df = Seq((1L, "b a c"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextMetrics.fingerprint(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("bow_md5") === out(1).getAs[String]("bow_md5"))
    assert(out(0).getAs[String]("text_md5") !== out(1).getAs[String]("text_md5"))
  }
}
