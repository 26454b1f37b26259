package graft.tools

import org.scalatest.funsuite.AnyFunSuite

class BenchCertificateSpec extends AnyFunSuite {
  private val t0 = 1700000000000L
  private val day = 86400000L
  private val base = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 0.5)

  test("a run inside the tolerance band validates") {
    val cert = BenchCertificate.create(t0, base, validDays = 90, tolerancePct = 20)
    val v = BenchCertificate.validate(cert, t0 + 10 * day,
      Map("q1" -> 1.19, "q2" -> 2.39, "q3" -> 0.1, "q_new" -> 9.9))
    assert(v.ok) // q_new is not a regression; faster is always fine
  }

  test("a query over the band is a violation with its ratio") {
    val cert = BenchCertificate.create(t0, base, tolerancePct = 20)
    val v = BenchCertificate.validate(cert, t0 + day,
      Map("q1" -> 1.0, "q2" -> 3.0, "q3" -> 0.5))
    assert(!v.ok)
    assert(v.violations.map(_.query) === Seq("q2"))
    assert(math.abs(v.violations.head.ratio - 1.5) < 1e-9)
  }

  test("floorSec absorbs micro-query jitter; big queries keep the % band") {
    val cert = BenchCertificate.create(t0, Map("micro" -> 0.3, "big" -> 4.0),
      tolerancePct = 25, floorSec = 0.5)
    // micro: 0.3*1.25 = 0.375 but floor allows up to 0.8
    val okMicro = BenchCertificate.validate(cert, t0 + day,
      Map("micro" -> 0.79, "big" -> 4.0))
    assert(okMicro.ok)
    val badMicro = BenchCertificate.validate(cert, t0 + day,
      Map("micro" -> 0.81, "big" -> 4.0))
    assert(badMicro.violations.map(_.query) === Seq("micro"))
    // big: floor is below 25% there — 4.0*1.25 = 5.0 governs
    val badBig = BenchCertificate.validate(cert, t0 + day,
      Map("micro" -> 0.3, "big" -> 5.01))
    assert(badBig.violations.map(_.query) === Seq("big"))
    assert(BenchCertificate.validate(cert, t0 + day,
      Map("micro" -> 0.3, "big" -> 4.99)).ok)
  }

  test("floorSec round-trips through JSON; pre-round-13 certs parse as 0") {
    val cert = BenchCertificate.create(t0, base, 90, 25.0, floorSec = 0.5)
    val back = BenchCertificate.fromJson(BenchCertificate.toJson(cert))
    assert(back.floorSec === 0.5)
    val old = """{"created_ms":1786765797298,"valid_days":90,""" +
      """"tolerance_pct":50.0,"queries":{"q1":1.011}}"""
    assert(BenchCertificate.fromJson(old).floorSec === 0.0)
  }

  test("missing certified queries and expiry both fail validation") {
    val cert = BenchCertificate.create(t0, base, validDays = 90)
    val missing = BenchCertificate.validate(cert, t0 + day, base - "q3")
    assert(!missing.ok && missing.missing === Seq("q3"))
    val expired = BenchCertificate.validate(cert, t0 + 91 * day, base)
    assert(!expired.ok && expired.expired)
    // boundary: the last valid instant still validates
    assert(BenchCertificate.validate(cert, t0 + 90 * day, base).ok)
  }

  test("certificate JSON is locale-independent (comma-decimal default locale)") {
    // under a comma-decimal default locale the f-interpolator would emit
    // "1,234" — invalid JSON that the comma-splitting parser then shreds
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val cert = BenchCertificate.create(t0, Map("q1" -> 1.234, "q2" -> 0.5), 90, 20.0)
      val json = BenchCertificate.toJson(cert)
      assert(json.contains("\"q1\":1.234"), json)
      val back = BenchCertificate.fromJson(json)
      assert(back.queries === Map("q1" -> 1.234, "q2" -> 0.5))
    } finally java.util.Locale.setDefault(prev)
  }

  test("certificate round-trips through its flat JSON file form") {
    val cert = BenchCertificate.create(t0, base, 90, 15.0, sf = "sf10full")
    val f = java.nio.file.Files.createTempFile("graft_cert", ".json")
    BenchCertificate.write(f, cert)
    val back = BenchCertificate.read(f)
    assert(back.createdMs === cert.createdMs)
    assert(back.validDays === cert.validDays)
    assert(back.tolerancePct === cert.tolerancePct)
    assert(back.queries === cert.queries)
    assert(back.sf === "sf10full")
  }

  test("pre-round-12 certificates without an sf field parse as sf0.1") {
    // Every certificate minted before the field existed measured sf0.1;
    // the witness gate must keep working against a committed old file.
    val old = """{"created_ms":1786765797298,"valid_days":90,""" +
      """"tolerance_pct":50.0,"queries":{"q1":1.011,"q2":0.699}}"""
    val cert = BenchCertificate.fromJson(old)
    assert(cert.sf === "sf0.1")
    assert(cert.queries === Map("q1" -> 1.011, "q2" -> 0.699))
  }
}
