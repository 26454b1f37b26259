package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and redact email
  * addresses, IPv4 addresses, and phone-like digit groups, reporting
  * per-document counts — the standard pre-training scrub stage (the
  * C4/RefinedWeb-style rule set, reduced to patterns that mean the same
  * thing in Java regex and RE2 so the DuckDB oracle runs the identical
  * expressions).
  *
  * Everything is codegen'd `regexp_extract_all`/`regexp_replace` over
  * the row's own text — embarrassingly parallel, zero shuffles, no UDFs;
  * at 100 TB this is pure map work fused into whatever scan precedes it.
  *
  * The three patterns apply IN SEQUENCE (email → IPv4 → phone), each
  * counted on the text as the previous stage left it, so a digit run
  * inside an email never double-counts as a phone number and the counts
  * always equal the number of tags inserted.
  */
object Redact {

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"

  /** Local-part @ domain.tld — character classes only, identical
    * semantics in Java regex and RE2. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Four dot-separated 1-3 digit groups (no range check — scrubbing
    * favors recall; 999.0.0.1 redacts too). */
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Exchange-dash-subscriber digit groups (555-0123), anchored on both
    * sides by `\b` so the shape never fires INSIDE a longer digit run:
    * the year range "2023-2024" has no word boundary before the "023",
    * so nothing matches (unanchored, it would redact "023-2024").
    * `\b` is the ASCII word boundary in both Java regex and RE2, and is
    * zero-width, so adjacent phones separated by one space both match
    * (a consuming boundary group like `(^|[^0-9-])` would eat the
    * separator and miss the second). Residual by design: a boundary
    * next to a dash is still a boundary, so "555-0123-4567" redacts its
    * first 3-4 shape to "<PHONE>-4567" — excluding that needs negative
    * lookaround, which RE2 (the oracle's engine) does not support. */
  val PhonePattern = "\\b[0-9]{3}-[0-9]{4}\\b"

  private def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Per-document scrub report: match counts per PII class plus the
    * fully redacted text in `redacted`. Columns: id, n_emails, n_ips,
    * n_phones, redacted. */
  def redactPii(df: DataFrame, id: String, text: String): DataFrame = {
    val t0 = col(text)
    val t1 = regexp_replace(t0, EmailPattern, EmailTag)
    val t2 = regexp_replace(t1, Ipv4Pattern, IpTag)
    val t3 = regexp_replace(t2, PhonePattern, PhoneTag)
    df.select(col(id),
      countMatches(t0, EmailPattern).as("n_emails"),
      countMatches(t1, Ipv4Pattern).as("n_ips"),
      countMatches(t2, PhonePattern).as("n_phones"),
      t3.as("redacted"))
  }
}
