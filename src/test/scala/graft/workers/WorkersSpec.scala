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

  test("resolveInstances normalizes path refs through the plugin loader") {
    val dir = java.nio.file.Files.createTempDirectory("workers-user-")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.write(dir.resolve("custom.scala"),
      """import graft.workers.Workers._
        |import org.apache.spark.sql.DataFrame
        |class CustomWorker extends Worker {
        |  val name = "USER/custom"
        |  val params = Seq(ParamDef("width", IntParam, "5", min = Some(1)))
        |  def warmupBars(c: Map[String, String]): Int = c("width").toInt
        |  def transform(df: DataFrame, keys: Seq[String], order: Seq[String],
        |                close: String, volume: String,
        |                c: Map[String, String]): DataFrame = df
        |}
        |""".stripMargin.getBytes("UTF-8"))
    // one CORE ref and one USER path ref resolve side by side; the user
    // worker's typed params validate exactly like a CORE worker's
    val resolved = Workers.resolveInstances(Map(
      "rsi" -> ("CORE/rsi", Map.empty),
      "mine" -> ("custom.scala", Map("width" -> "9"))),
      basePath = Some(dir))
    assert(resolved.find(_._1 == "mine").get._2.name === "USER/custom")
    assert(resolved.find(_._1 == "mine").get._3("width") === "9")
    intercept[IllegalArgumentException](Workers.resolveInstances(Map(
      "bad" -> ("custom.scala", Map("width" -> "0"))), basePath = Some(dir)))
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
