package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** URL normalization, registrable-domain extraction, and the
  * most-tokens-wins canonical keep. */
class UrlDedupSpec extends SparkSpecBase {

  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toSeq.toDF("u")
      .select(UrlDedup.normalizeUrl(col("u")))
      .collect().map(_.getString(0)).toSeq

  test("normalizeUrl collapses scheme/case/www/query/fragment/trailing-slash") {
    assert(norm(
      "https://www.Example.COM/a/B",
      "HTTP://example.com/a/B/",
      "example.com/a/B?utm_source=x&y=1",
      "https://EXAMPLE.com/a/B#frag",
      "https://example.com/a/B/?q=1#f") ===
      Seq.fill(5)("example.com/a/B"))
    // path case is PRESERVED (hosts are case-insensitive, paths are not)
    assert(norm("https://example.com/A") !== norm("https://example.com/a"))
    // host-only URLs normalize to the bare host
    assert(norm("https://www.Example.com/", "example.com") ===
      Seq("example.com", "example.com"))
  }

  test("registrableDomain takes eTLD+1 with multi-part suffixes") {
    def dom(hosts: String*): Seq[String] =
      hosts.toSeq.toDF("h")
        .select(UrlDedup.registrableDomain(col("h")))
        .collect().map(_.getString(0)).toSeq
    assert(dom("a.b.example.com") === Seq("example.com"))
    assert(dom("news.example.co.uk") === Seq("example.co.uk"))
    assert(dom("example.co.uk") === Seq("example.co.uk"))
    assert(dom("example.com") === Seq("example.com"))
    // a bare two-label host whose SLD is a suffix member still yields
    // both labels (there is no third label to take)
    assert(dom("co.uk") === Seq("co.uk"))
    assert(dom("localhost") === Seq("localhost"))
  }

  test("canonicalKeep keeps most tokens per key, doc-id tie-break, exact n_dups") {
    val df = Seq(
      (1L, "https://www.site.com/p", "one two three"),
      (2L, "HTTP://site.com/p/", "one two three four"), // wins: 4 tokens
      (3L, "site.com/p?utm=x", "one two"),
      (4L, "https://site.com/q", "a b"), // tie on tokens with doc 5...
      (5L, "https://site.com/q#f", "c d"), // ...doc 4 wins by id
      (6L, "https://other.co.uk/x", "solo"))
      .toDF("doc_id", "url", "text")
    val got = UrlDedup.canonicalKeep(df, "doc_id", "url", "text")
      .orderBy(col("url_key")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === Seq(
      ("other.co.uk/x", "other.co.uk", 6L, 1L, 1L),
      ("site.com/p", "site.com", 2L, 4L, 3L),
      ("site.com/q", "site.com", 4L, 2L, 2L)))
  }

  test("independent of input partitioning") {
    val df = (1L to 40L).map(i =>
        (i, s"https://www.s${i % 5}.example.com/p${i % 3}", s"t" * (i % 7).toInt))
      .toDF("doc_id", "url", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      UrlDedup.canonicalKeep(d, "doc_id", "url", "text")
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4))).toSet
    assert(rows(df.repartition(1)) === rows(df.repartition(7)))
  }
}
