package graft

import org.scalatest.funsuite.AnyFunSuite

/** The witness admission gate (Bench.awaitQuiet): pure-function contract
  * with a fake clock — quiet hosts admit immediately, loud hosts defer
  * until quiet or until the SHARED deferral budget is spent, and the
  * returned admission load lets the caller mark still-contended
  * witnesses. The round-14 driver bench witnessed q87/q91 at loadavg
  * 8–12 against sub-2 s certs; those runs adjudicated nothing, which is
  * exactly what this gate now makes structurally visible. */
class BenchWitnessGateSpec extends AnyFunSuite {

  test("quiet host admits immediately: zero deferrals, budget untouched") {
    var slept = 0L
    val (load, deferred, remaining) = Bench.awaitQuiet(
      () => 1.5, ms => slept += ms, gate = 4.0, sleepMs = 30000L,
      budgetMs = 600000L)
    assert(load === 1.5)
    assert(deferred === 0)
    assert(remaining === 600000L)
    assert(slept === 0L)
  }

  test("loud host defers until the load falls under the gate") {
    val loads = Iterator(9.0, 7.2, 3.9)
    var slept = 0L
    val (load, deferred, remaining) = Bench.awaitQuiet(
      () => loads.next(), ms => slept += ms, gate = 4.0, sleepMs = 30000L,
      budgetMs = 600000L)
    assert(load === 3.9) // admitted at the first quiet sample
    assert(deferred === 2)
    assert(remaining === 600000L - 60000L)
    assert(slept === 60000L)
  }

  test("permanently loud host exhausts the budget and admits contended") {
    var slept = 0L
    val (load, deferred, remaining) = Bench.awaitQuiet(
      () => 12.0, ms => slept += ms, gate = 4.0, sleepMs = 30000L,
      budgetMs = 100000L)
    assert(load === 12.0)        // caller marks contended: load > gate
    assert(deferred === 3)       // 100000 / 30000 full sleeps fit
    assert(remaining === 10000L) // too small for another sleep
    assert(slept === 90000L)
  }

  test("budget is shared: a second witness sees what the first left") {
    // first witness burns most of the budget
    val (_, _, rem1) = Bench.awaitQuiet(
      () => 9.9, _ => (), gate = 4.0, sleepMs = 30000L, budgetMs = 70000L)
    assert(rem1 === 10000L)
    // second witness on the same loud host cannot sleep at all
    var slept = 0L
    val (load2, deferred2, rem2) = Bench.awaitQuiet(
      () => 9.9, ms => slept += ms, gate = 4.0, sleepMs = 30000L,
      budgetMs = rem1)
    assert(load2 === 9.9)
    assert(deferred2 === 0)
    assert(rem2 === rem1)
    assert(slept === 0L)
  }

  test("unreadable loadavg (-1 sentinel) admits immediately, not contended") {
    val (load, deferred, _) = Bench.awaitQuiet(
      () => -1.0, _ => (), gate = 4.0, sleepMs = 30000L, budgetMs = 600000L)
    assert(load === -1.0)
    assert(deferred === 0)
    assert(!(load > 4.0))
  }
}
