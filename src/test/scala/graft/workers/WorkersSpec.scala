package graft.workers

import graft.SparkSpecBase

class WorkersSpec extends SparkSpecBase {
  import spark.implicits._

  test("validate: defaults applied, bounds and types enforced, strict unknowns fail") {
    assert(Workers.RsiWorker.validate(Map.empty) === Map("period" -> "14"))
    assert(Workers.RsiWorker.validate(Map("period" -> "7"))("period") === "7")
    intercept[IllegalArgumentException](Workers.RsiWorker.validate(Map("period" -> "1")))
    intercept[IllegalArgumentException](Workers.RsiWorker.validate(Map("period" -> "x")))
    intercept[IllegalArgumentException](Workers.RsiWorker.validate(Map("perid" -> "9")))
    // non-strict tolerates unknowns
    assert(Workers.RsiWorker.validate(Map("perid" -> "9"), strict = false)("period") === "14")
    intercept[IllegalArgumentException](
      Workers.BollingerWorker.validate(Map("period" -> "2.5")))
  }

  test("resolveInstances fails fast on unknown worker type, resolves configs") {
    val resolved = Workers.resolveInstances(Map(
      "rsi_fast" -> ("CORE/rsi", Map("period" -> "7")),
      "bb_main" -> ("CORE/bollinger", Map.empty)))
    assert(resolved.map(_._1) === Seq("bb_main", "rsi_fast"))
    assert(resolved.find(_._1 == "rsi_fast").get._3("period") === "7")
    assert(resolved.find(_._1 == "bb_main").get._2.warmupBars(Map("period" -> "20")) === 20)
    intercept[IllegalArgumentException](
      Workers.resolveInstances(Map("x" -> ("CORE/nope", Map.empty))))
  }

  test("registry workers produce their indicator columns") {
    val bars = (1 to 30).map(i => ("S", i.toLong, 100.0 + i, 10.0))
      .toDF("sym", "seq", "close", "vol")
    val rsi = Workers.registry("CORE/rsi").transform(
      bars, Seq("sym"), Seq("seq"), "close", "vol", Map("period" -> "14"))
    assert(rsi.columns.contains("rsi"))
    // strictly rising -> RSI 100 once warm
    assert(rsi.orderBy("seq").collect().last.getAs[Double]("rsi") === 100.0)
    val bb = Workers.registry("CORE/bollinger").transform(
      bars, Seq("sym"), Seq("seq"), "close", "vol", Map("period" -> "20", "k" -> "2.0"))
    assert(bb.columns.count(_.startsWith("bb_")) === 4)
  }
}
