package graft.tools

/** Benchmark certificate (SURVEY A21 parity): the reference certifies a
  * benchmark run and validates later runs against it inside a tolerance
  * band and a validity window
  * (`/root/reference/tests/simulation/benchmark/test_benchmark_certificate.py`) —
  * a regression gate on measured throughput, not a one-off number.
  *
  * Engine-side this is pure bookkeeping over `Bench`'s per-query medians:
  * a certificate pins (created-at, validity days, tolerance %, per-query
  * seconds); validation flags expiry, missing queries, and per-query
  * violations (current > baseline · (1 + tolerance)). Serialization uses
  * the same minimal sorted-flat-JSON convention as the catalog manifest,
  * so certificates are diffable text artifacts.
  */
object BenchCertificate {

  /** `sf` = basename of the SF directory the certified medians were
    * measured at (e.g. "sf0.1"): a certificate's numbers only mean
    * anything at their own data scale, and `Bench`'s witness adjudication
    * must not fire on a scale-ladder run whose times legitimately dwarf
    * the sf0.1 medians. Old certificates (pre-round-12) lack the field
    * and parse as "sf0.1" — what every minted certificate measured.
    *
    * `floorSec` = absolute per-query slack added to the relative band:
    * a violation requires current > max(base·(1+tol%), base+floorSec).
    * Rationale: the reference's ±20% band
    * (tests/simulation/benchmark/config/benchmark_config.json) certifies
    * ONE multi-second workload; this certificate covers ~100 queries,
    * most of which run in 0.2–1 s on a co-tenant host, where JIT / page
    * cache / scheduler jitter routinely exceeds 20% of a sub-second
    * median without any code change. A pure relative band therefore had
    * to be 50% wide (rounds 6–12) — too loose for the big queries where
    * regressions actually matter. The absolute floor absorbs micro-query
    * jitter, letting the relative band tighten toward the reference's
    * discipline for everything above ~2 s. Old certificates parse with
    * floor 0 (pure relative band — their minted semantics). */
  case class Certificate(createdMs: Long, validDays: Int, tolerancePct: Double,
                         queries: Map[String, Double], sf: String = "sf0.1",
                         floorSec: Double = 0.0)

  case class Violation(query: String, baselineSec: Double, currentSec: Double) {
    def ratio: Double = currentSec / baselineSec
  }

  case class Validation(expired: Boolean, missing: Seq[String],
                        violations: Seq[Violation]) {
    def ok: Boolean = !expired && missing.isEmpty && violations.isEmpty
  }

  def create(nowMs: Long, perQuerySec: Map[String, Double],
             validDays: Int = 90, tolerancePct: Double = 20.0,
             sf: String = "sf0.1", floorSec: Double = 0.0): Certificate =
    Certificate(nowMs, validDays, tolerancePct, perQuerySec, sf, floorSec)

  /** Validate a later run. A query missing from the RUN is a failure (the
    * certified workload must still be runnable); a query missing from the
    * CERTIFICATE is ignored (new queries aren't regressions). */
  def validate(cert: Certificate, nowMs: Long,
               current: Map[String, Double]): Validation = {
    val expired = nowMs > cert.createdMs + cert.validDays * 86400000L
    val missing = cert.queries.keys.filterNot(current.contains).toSeq.sorted
    val band = 1.0 + cert.tolerancePct / 100.0
    val violations = cert.queries.toSeq.sorted.flatMap { case (q, base) =>
      val limit = math.max(base * band, base + cert.floorSec)
      current.get(q).filter(_ > limit).map(Violation(q, base, _))
    }
    Validation(expired, missing, violations)
  }

  // ---- flat JSON persistence (sorted keys; diffable) ----

  def toJson(c: Certificate): String = {
    // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
    // comma-decimal locale would emit "1,234" — invalid JSON that the
    // comma-splitting parser below would then shred. Persisted artifacts
    // must not depend on host locale.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = c.queries.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${num(v)}""" }.mkString("{", ",", "}")
    s"""{"created_ms":${c.createdMs},"valid_days":${c.validDays},""" +
      s""""tolerance_pct":${c.tolerancePct},"floor_sec":${num(c.floorSec)},""" +
      s""""sf":"${c.sf}","queries":$qs}"""
  }

  def fromJson(json: String): Certificate = {
    def field(name: String): String = {
      val i = json.indexOf(s""""$name":""")
      require(i >= 0, s"certificate missing field $name")
      val start = i + name.length + 3
      val end = json.indexWhere(ch => ch == ',' || ch == '}', start)
      json.substring(start, end)
    }
    val qStart = json.indexOf(""""queries":{""") + 11
    val qEnd = json.indexOf('}', qStart)
    val queries = json.substring(qStart, qEnd).split(',').filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(':')
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.toDouble
      }.toMap
    // `sf` is a quoted string field; absent in pre-round-12 certificates
    // (all minted at sf0.1).
    val sf = {
      val i = json.indexOf(""""sf":"""")
      if (i < 0) "sf0.1"
      else json.substring(i + 6, json.indexOf('"', i + 6))
    }
    // `floor_sec` absent in pre-round-13 certificates → 0 (pure relative
    // band, their minted semantics).
    val floor =
      if (json.contains(""""floor_sec":""")) field("floor_sec").toDouble
      else 0.0
    Certificate(field("created_ms").toLong, field("valid_days").toInt,
      field("tolerance_pct").toDouble, queries, sf, floor)
  }

  def write(path: java.nio.file.Path, c: Certificate): Unit =
    java.nio.file.Files.write(path, toJson(c).getBytes("UTF-8"))

  def read(path: java.nio.file.Path): Certificate =
    fromJson(new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
}
