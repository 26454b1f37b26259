package graft.serve

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** S11–S13: the serving layer — read-API slice semantics and CSV/JSON
  * sinks (round-trips, since a sink's contract is what comes back). */
class ServeSpec extends SparkSpecBase {
  import spark.implicits._

  private def bars = (0 until 100).map { i =>
    (1000L + i * 60000L, "M1", 100.0 + i)
  }.toDF("ts_ms", "timeframe", "close")

  test("barsSlice caps at the NEWEST maxBars and returns ascending") {
    val got = Serve.barsSlice(bars, "M1", 0L, Long.MaxValue / 2, maxBars = 10)
      .select("ts_ms").as[Long].collect()
    // newest 10 of 100 bars, ascending
    assert(got.toSeq === (90 until 100).map(i => 1000L + i * 60000L))
  }

  test("barsSlice filters timeframe and range before capping") {
    val mixed = bars.union(
      Seq((1000L, "H1", 1.0)).toDF("ts_ms", "timeframe", "close"))
    val got = Serve.barsSlice(mixed, "M1", 1000L + 10 * 60000L,
      1000L + 20 * 60000L, maxBars = 100)
      .select("ts_ms").as[Long].collect()
    assert(got.length === 11)
    assert(got.toSeq === got.toSeq.sorted)
  }

  test("barsSlice validates inputs fail-fast") {
    intercept[IllegalArgumentException](Serve.barsSlice(bars, "M1", 10L, 5L, 1))
    intercept[IllegalArgumentException](Serve.barsSlice(bars, "M1", 0L, 5L, 0))
  }

  test("ranking CSV sink round-trips ordered with header") {
    val dir = Files.createTempDirectory("serve_csv").toString
    val ranking = Seq((1, "run_b", 2.5), (2, "run_a", 1.5), (3, "run_c", 0.5))
      .toDF("rank", "run_id", "objective")
    Serve.writeRankingCsv(ranking, s"$dir/ranking")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/ranking")
    assert(back.orderBy("rank").select("run_id").as[String].collect().toSeq ===
      Seq("run_b", "run_a", "run_c"))
  }

  test("report JSON store writes, lists, and reads back") {
    val dir = Files.createTempDirectory("serve_json").toString
    val report = Seq(("EUR", 10, 123.45), ("USD", 7, -1.5))
      .toDF("currency", "n_trades", "net_pnl")
    Serve.writeReportJson(report, dir, "portfolio_summary")
    Serve.writeReportJson(report.limit(1), dir, "another_report")
    assert(Serve.listReports(spark, dir) ===
      Seq("another_report", "portfolio_summary"))
    val back = Serve.readReportJson(spark, dir, "portfolio_summary")
    assert(back.count() === 2)
    assert(back.filter(col("currency") === "EUR")
      .select("net_pnl").as[Double].head() === 123.45)
  }
}
