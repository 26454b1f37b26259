package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL-keyed canonical-keep — the web-corpus dedup stage that runs BEFORE
  * any content hashing (RefinedWeb, Penedo et al. 2023 §3.1 "URL
  * deduplication"; the same normalize-then-keep-one contract as CC crawl
  * curation): many crawls of one page differ only in scheme, case, a
  * `www.` prefix, tracking query params, fragments, or a trailing slash,
  * so documents are grouped by a NORMALIZED url key and one canonical
  * document is kept per key (most tokens wins — the fullest crawl — with
  * doc-id as the deterministic tie-break, the q26 canonical convention).
  *
  * Scale shape (100 TB): normalization is pure per-row expression work
  * (regexp on the url column, fully codegen'd); the keep is one window
  * over url_key — state bounded by one key's crawl count — and the only
  * exchange is the url_key hash partition, the canonical web-dedup
  * shuffle. No collect, no UDFs.
  *
  * Ref: the reference has no web-crawl stage; north-star text-pipeline
  * extension (SURVEY §2 extension, the q85–q93 family).
  */
object UrlDedup {

  /** Second-level labels treated as part of the public suffix by the
    * registrable-domain heuristic (a tiny explicit subset of the Public
    * Suffix List: example.co.uk → example.co.uk, not co.uk). */
  val MultiPartSlds: Seq[String] =
    Seq("co", "com", "org", "net", "ac", "gov", "edu")

  /** Normalize a URL for identity: drop the scheme, lowercase the host,
    * drop a leading `www.`, drop query (`?...`) and fragment (`#...`),
    * drop one trailing `/`. Path CASE is preserved (paths are
    * case-sensitive; hosts are not). */
  def normalizeUrl(url: Column): Column = {
    val noScheme = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noFrag = regexp_replace(noScheme, "#.*", "")
    val noQuery = regexp_replace(noFrag, "\\?.*", "")
    val host = lower(regexp_extract(noQuery, "^[^/]*", 0))
    val path = regexp_replace(noQuery, "^[^/]*", "")
    concat(regexp_replace(host, "^www\\.", ""),
      regexp_replace(path, "/$", ""))
  }

  /** Host part of a normalized url key (everything before the first
    * '/'). */
  def hostOf(normUrl: Column): Column =
    regexp_extract(normUrl, "^[^/]*", 0)

  /** Registrable domain (eTLD+1) of a host under the [[MultiPartSlds]]
    * heuristic: last two labels, or last three when the second-to-last
    * label is a multi-part public-suffix member (site.example.co.uk →
    * example.co.uk). Single-label hosts pass through unchanged. */
  def registrableDomain(host: Column): Column = {
    val ls = split(host, "\\.")
    val n = size(ls)
    when(n >= 3 && element_at(ls, -2).isin(MultiPartSlds: _*),
      concat_ws(".", element_at(ls, -3), element_at(ls, -2),
        element_at(ls, -1)))
      .when(n >= 2, concat_ws(".", element_at(ls, -2), element_at(ls, -1)))
      .otherwise(host)
  }

  /** One row per normalized url key: the canonical document (most
    * tokens, doc-id tie-break), its token count, the key's crawl count,
    * and the key's registrable domain. */
  def canonicalKeep(docs: DataFrame, id: String, url: String,
      text: String): DataFrame = {
    val keyed = docs.select(
      col(id),
      normalizeUrl(col(url)).as("url_key"),
      size(split(col(text), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("url_key"))
      .orderBy(col("n_tokens").desc, col(id).asc)
    keyed
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_dups",
        count(lit(1)).over(Window.partitionBy(col("url_key"))).cast("long"))
      .filter(col("__rn") === 1)
      .select(col("url_key"),
        registrableDomain(hostOf(col("url_key"))).as("domain"),
        col(id).as("canonical_id"),
        col("n_tokens").as("canonical_tokens"),
        col("n_dups"))
  }
}
