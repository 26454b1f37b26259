package graft.workers

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** X2: the SIGNAL worker type — as-of lookup of pre-collected external
  * data, staleness-flagged (`abstract_signal_worker.py`, #434 chain). */
class SignalWorkerSpec extends SparkSpecBase {
  import spark.implicits._

  private def signals = Seq(
    (1000L, "EURUSD", 0.8),
    (5000L, "EURUSD", -0.2),
    (2000L, "USDJPY", 0.1))
    .toDF("collected_msc", "symbol", "sentiment_score")

  private def ticks = Seq(
    ("EURUSD", 999L),   // before any snapshot -> null payload, stale
    ("EURUSD", 1000L),  // exactly at snapshot -> visible (<= semantics)
    ("EURUSD", 4999L),  // still the first snapshot
    ("EURUSD", 5000L + 3600000L), // second snapshot, 1h later -> fresh
    ("EURUSD", 5000L + 7200001L), // 2h+ later -> stale at 2h threshold
    ("USDJPY", 2500L))
    .toDF("symbol", "ts_ms")

  test("signal worker attaches as-of payload with staleness flag") {
    val w = new Workers.SignalLookupWorker(signals)
    assert(w.kind === Workers.SignalKind)
    assert(w.warmupBars(Map.empty) === 0) // no warmup, per reference
    val cfg = w.validate(Map("staleness_ms" -> "7200000"))
    val got = w.transform(ticks, Seq("symbol"), Seq("ts_ms"), "", "", cfg)
      .orderBy("symbol", "ts_ms")
      .select("symbol", "ts_ms", "sentiment_score", "signal_is_stale")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))
    assert(got.toSeq === Seq(
      ("EURUSD", 999L, None, true),
      ("EURUSD", 1000L, Some(0.8), false),
      ("EURUSD", 4999L, Some(0.8), false),
      ("EURUSD", 5000L + 3600000L, Some(-0.2), false),
      ("EURUSD", 5000L + 7200001L, Some(-0.2), true),
      ("USDJPY", 2500L, Some(0.1), false)))
  }

  test("signal worker validates params fail-fast like any worker") {
    val w = new Workers.SignalLookupWorker(signals)
    intercept[IllegalArgumentException](w.validate(Map("staleness_ms" -> "-5")))
    intercept[IllegalArgumentException](w.validate(Map("bogus" -> "1")))
  }
}
