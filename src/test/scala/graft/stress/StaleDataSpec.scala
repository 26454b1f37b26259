package graft.stress

import graft.SparkSpecBase

/** ST8: stale-data slicer — [start, end) carve semantics mirroring
  * `stale_data_slicer.py` (`tests/stress_test/` in the reference). */
class StaleDataSpec extends SparkSpecBase {
  import spark.implicits._

  private def signals = (0 until 100).map { i =>
    (i * 1000L, "s1", i.toDouble)
  }.toDF("collected_msc", "symbol", "value")

  test("carve removes snapshots in [start, end) — end exclusive") {
    val kept = StaleData.carveSignalSeries(signals,
      Seq((10000L, 20000L)))
      .select("collected_msc").as[Long].collect().sorted
    assert(!kept.contains(10000L)) // start inclusive: carved
    assert(!kept.contains(19000L))
    assert(kept.contains(20000L))  // end exclusive: survives
    assert(kept.length === 90)
  }

  test("multiple windows carve their union; empty list is a no-op") {
    val kept = StaleData.carveSignalSeries(signals,
      Seq((0L, 5000L), (50000L, 52000L)))
      .count()
    assert(kept === 100 - 5 - 2)
    assert(StaleData.carveSignalSeries(signals, Seq.empty).count() === 100)
  }

  test("inverted window fails fast") {
    intercept[IllegalArgumentException](
      StaleData.carveSignalSeries(signals, Seq((5L, 1L))))
  }
}
