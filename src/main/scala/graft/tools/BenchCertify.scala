package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: mint `bench_certificate.json` from a `graft.Bench` output
  * file (A21 — the reference's benchmark-certificate workflow: certify a
  * measured run, then validate later runs against it inside a tolerance
  * band and a validity window).
  *
  * Usage: `sbt "runMain graft.tools.BenchCertify bench_local_r6.json
  * bench_certificate.json [tolerancePct]"`.
  *
  * The committed certificate is the perf-regression gate's baseline:
  * `BenchCertificateGateSpec` validates each round's committed local
  * medians against it, so a silent slowdown fails `sbt test` even when
  * the driver bench's numbers drown in host contention. Tolerance
  * defaults to 50% — wide enough to absorb the measured run-to-run noise
  * on the shared host (see PLAN.md), tight enough to catch the 2×+
  * regressions that matter. */
object BenchCertify {
  /** Parse a Bench JSON line's "queries" object: query name → seconds. */
  def parseBenchQueries(json: String): Map[String, Double] = {
    val qStart = json.indexOf("\"queries\":{")
    require(qStart >= 0, "not a graft.Bench output: no queries object")
    val qEnd = json.indexOf('}', qStart)
    json.substring(qStart + 11, qEnd).split(',').filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split(':')
      k.trim.stripPrefix("\"").stripSuffix("\"") -> v.toDouble
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val benchPath = args.headOption.getOrElse("bench_local_r6.json")
    val outPath = args.lift(1).getOrElse("bench_certificate.json")
    val tolerance = args.lift(2).map(_.toDouble).getOrElse(50.0)
    val json = new String(Files.readAllBytes(Paths.get(benchPath)), "UTF-8")
    // The bench output's sf path, reduced to its basename: the
    // certificate's medians only adjudicate runs at the same data scale.
    val sf = {
      val i = json.indexOf(""""sf":"""")
      require(i >= 0, "not a graft.Bench output: no sf field")
      val raw = json.substring(i + 6, json.indexOf('"', i + 6))
      Paths.get(raw).getFileName.toString
    }
    val cert = BenchCertificate.create(System.currentTimeMillis(),
      parseBenchQueries(json), validDays = 90, tolerancePct = tolerance,
      sf = sf)
    BenchCertificate.write(Paths.get(outPath), cert)
    println(s"[certify] ${cert.queries.size} queries from $benchPath -> " +
      s"$outPath (sf $sf, tolerance ${tolerance}%, valid ${cert.validDays} days)")
  }
}
