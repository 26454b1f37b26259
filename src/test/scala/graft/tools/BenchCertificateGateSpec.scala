package graft.tools

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The A21 regression GATE: validates the committed round's local bench
  * medians against the committed certificate, so a silent perf
  * regression fails `sbt test` — independent of the driver bench, whose
  * totals drown in host contention (PLAN.md).
  *
  * Round workflow: after a clean local 3-run bench lands as
  * `bench_local_r{N}.json`, re-mint the certificate with
  * `runMain graft.tools.BenchCertify bench_local_r{N}.json
  * bench_certificate.json` when the round's numbers become the new
  * baseline. EVERY registered query must appear in the certificate and
  * in the committed medians — round 6 proved that "new queries aren't
  * regressions" leaves the gate structurally blind to exactly the
  * queries most likely to regress (the newest code): the 8 queries added
  * after the r6 mint carried a real elevation the gate never saw. The
  * cost of the stricter contract is one re-mint per round that adds
  * queries, which is the round workflow anyway. */
class BenchCertificateGateSpec extends AnyFunSuite {

  private val certPath = Paths.get("bench_certificate.json")
  private val latestBench = {
    // newest committed bench_local_r*.json by round number
    val dir = Paths.get(".")
    val re = raw"bench_local_r(\d+)\.json".r
    val files = Files.list(dir).iterator()
    var best: Option[(Int, java.nio.file.Path)] = None
    while (files.hasNext) {
      val p = files.next()
      p.getFileName.toString match {
        case re(n) if best.forall(_._1 < n.toInt) => best = Some((n.toInt, p))
        case _ => ()
      }
    }
    best
  }

  test("committed local bench medians validate against the certificate") {
    assert(Files.exists(certPath), "bench_certificate.json missing — mint " +
      "it with: sbt \"runMain graft.tools.BenchCertify bench_local_r<N>.json " +
      "bench_certificate.json\"")
    val cert = BenchCertificate.read(certPath)
    val (round, benchPath) = latestBench.getOrElse(
      fail("no committed bench_local_r*.json found"))
    val current = BenchCertify.parseBenchQueries(
      new String(Files.readAllBytes(benchPath), "UTF-8"))
    val v = BenchCertificate.validate(cert, System.currentTimeMillis(), current)
    assert(!v.expired, s"certificate expired — re-mint from round $round")
    assert(v.missing.isEmpty,
      s"certified queries missing from bench_local_r$round.json: ${v.missing.mkString(", ")}")
    assert(v.violations.isEmpty,
      "perf regressions vs certificate (current > baseline × " +
        s"${1 + cert.tolerancePct / 100}):\n" + v.violations.map(x =>
        f"  ${x.query}: ${x.baselineSec}%.3f -> ${x.currentSec}%.3f (${x.ratio}%.2fx)")
        .mkString("\n"))
  }

  test("every registered query is certified and measured (no blind spot)") {
    assume(Files.exists(certPath) && latestBench.isDefined)
    val cert = BenchCertificate.read(certPath)
    val (round, benchPath) = latestBench.get
    val current = BenchCertify.parseBenchQueries(
      new String(Files.readAllBytes(benchPath), "UTF-8"))
    val registered = graft.SparkEntry.queries.keySet
    val uncertified = registered.diff(cert.queries.keySet).toSeq.sorted
    val unmeasured = registered.diff(current.keySet).toSeq.sorted
    assert(uncertified.isEmpty,
      "registered queries missing from bench_certificate.json (the gate " +
        "is blind to them until re-minted — run the 3-run local bench and " +
        s"BenchCertify): ${uncertified.mkString(", ")}")
    assert(unmeasured.isEmpty,
      s"registered queries missing from bench_local_r$round.json (re-run " +
        s"the 3-run local bench): ${unmeasured.mkString(", ")}")
  }
}
