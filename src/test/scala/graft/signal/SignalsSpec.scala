package graft.signal

import java.nio.file.Files
import graft.SparkSpecBase

class SignalsSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeJsonl(): String = {
    val f = Files.createTempFile("signals", ".jsonl").toFile
    val lines = Seq(
      """{"collected_msc": 1000, "schema_version": "1.2", "basis": "news", "status": "ok", "results": [{"symbol": "BTCUSD", "signal": "BUY", "sentiment_score": 0.8, "confidence": 0.9, "reasoning": "r", "urgency": 0.1, "is_breaking": false}]}""",
      """{"collected_msc": 2000, "schema_version": "1.2", "basis": "news", "status": "ok", "results": [{"symbol": "ETHUSD", "signal": "SELL", "sentiment_score": -0.5, "confidence": 0.7, "reasoning": "r", "urgency": 0.2, "is_breaking": true}]}""",
      """{"collected_msc": 3000, "schema_version": "2.0", "basis": "news", "status": "ok", "results": []}""")
    Files.writeString(f.toPath, lines.mkString("\n"))
    f.getAbsolutePath
  }

  test("jsonl load gates on schema major version; explode adds sentinel rows") {
    val env = Signals.loadJsonl(spark, writeJsonl(), majorVersion = 1)
    assert(env.count() === 2) // v2.0 envelope rejected
    val rows = Signals.explodeEnvelopes(env)
    assert(rows.count() === 4) // 2 symbol rows + 2 sentinels
    assert(rows.filter($"symbol" === Signals.EnvelopeSymbol).count() === 2)
  }

  test("point-in-time trim keeps in-range plus latest pre-start snapshot per symbol") {
    val sig = Seq(
      ("BTCUSD", 100L), ("BTCUSD", 200L), ("BTCUSD", 500L), ("BTCUSD", 900L),
      ("ETHUSD", 50L)).toDF("symbol", "collected_msc")
    val out = Signals.pointInTimeTrim(sig, startMsc = 400, endMsc = 800)
      .select("symbol", "collected_msc").as[(String, Long)].collect().toSet
    // in-range: BTC 500; pre-start latest: BTC 200, ETH 50; dropped: 100, 900
    assert(out === Set(("BTCUSD", 500L), ("BTCUSD", 200L), ("ETHUSD", 50L)))
  }

  test("last-wins dedup: symbol row beats sentinel at same collected_msc") {
    val sig = Seq(
      (1000L, "BTCUSD", "BUY"), (1000L, Signals.EnvelopeSymbol, null),
      (2000L, Signals.EnvelopeSymbol, "HOLD"))
      .toDF("collected_msc", "symbol", "signal")
    val out = Signals.resolveForSymbol(sig, "BTCUSD")
      .orderBy("collected_msc").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("signal") === "BUY")     // symbol row won
    assert(out(1).getAs[String]("signal") === "HOLD")    // sentinel only
  }

  test("attachToTicks: as-of value plus staleness flag") {
    val ticks = Seq(("BTCUSD", 1L, 1000L), ("BTCUSD", 2L, 5000L), ("BTCUSD", 3L, 500L))
      .toDF("symbol", "tick_id", "msc")
    val sigs = Seq(("BTCUSD", 900L, "BUY", 0.8, 0.9))
      .toDF("symbol", "collected_msc", "signal", "sentiment_score", "confidence")
    val out = Signals.attachToTicks(ticks, sigs, Seq("symbol"), "msc",
        maxStalenessMs = 1000L)
      .orderBy("tick_id").collect()
    assert(out(0).getAs[String]("signal") === "BUY")
    assert(!out(0).getAs[Boolean]("is_stale"))          // 100ms old
    assert(out(1).getAs[String]("signal") === "BUY")
    assert(out(1).getAs[Boolean]("is_stale"))           // 4100ms old
    assert(out(2).getAs[String]("signal") === null)     // before first signal
    assert(out(2).getAs[Boolean]("is_stale"))
  }
}
