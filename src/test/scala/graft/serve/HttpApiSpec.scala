package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** S12/S13 over real HTTP (`bars_router.py`, `reports_router.py`): the
  * JDK HttpServer wrapper serves the SAME engine functions the router
  * endpoints wrap, so each response is asserted against the direct
  * engine call, plus the 400/404 error envelope. */
class HttpApiSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val bars = Seq(
    ("M1", 1000L, 1.0, 2.0), ("M1", 2000L, 2.0, 3.0), ("M1", 3000L, 3.0, 4.0),
    ("M1", 4000L, 4.0, 5.0), ("M5", 1000L, 9.0, 9.5))
    .toDF("timeframe", "ts_ms", "open", "close")

  private def get(port: Int, path: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def withApi(storeDir: String)(f: Int => Unit): Unit = {
    val api = new HttpApi(spark, () => bars, storeDir)
    val port = api.start()
    try f(port) finally api.stop()
  }

  test("GET /bars returns the capped newest window ascending, matching the engine slice") {
    withApi(Files.createTempDirectory("store").toString) { port =>
      val (code, body) = get(port, "/bars?timeframe=M1&from=0&to=9999&max=2")
      assert(code === 200)
      // Engine truth: newest 2 of M1 in range, re-sorted ascending.
      val direct = Serve.barsSlice(bars, "M1", 0L, 9999L, 2)
        .toJSON.collect().mkString("[", ",", "]")
      assert(body === direct)
      assert(body.contains("\"ts_ms\":3000") && body.contains("\"ts_ms\":4000"))
      assert(!body.contains("\"ts_ms\":2000"))
    }
  }

  test("GET /bars with missing/invalid params → 400 envelope") {
    withApi(Files.createTempDirectory("store").toString) { port =>
      val (code, body) = get(port, "/bars?from=0&to=1&max=5")
      assert(code === 400)
      assert(body.contains("\"code\":\"bad_request\"") && body.contains("timeframe"))

      val (code2, body2) = get(port, "/bars?timeframe=M1&from=abc")
      assert(code2 === 400 && body2.contains("not an integer"))

      val (code3, body3) = get(port, "/bars?timeframe=M1&max=999999")
      assert(code3 === 400 && body3.contains("exceeds cap"))
    }
  }

  test("GET /reports lists the store index; /reports/<name> serves the document") {
    val store = Files.createTempDirectory("store").toString
    val report = Seq(("EURUSD", 12, 345.67)).toDF("symbol", "trades", "profit")
    Serve.writeReportJson(report, store, "portfolio")
    Serve.writeReportJson(report.withColumn("trades", lit(1)), store, "summary")

    withApi(store) { port =>
      val (code, body) = get(port, "/reports")
      assert(code === 200)
      assert(body === "[\"portfolio\",\"summary\"]")

      val (code2, body2) = get(port, "/reports/portfolio")
      assert(code2 === 200)
      assert(body2.contains("\"symbol\":\"EURUSD\"") && body2.contains("\"profit\":345.67"))
    }
  }

  test("GET /reports/<unknown> → 404 envelope") {
    withApi(Files.createTempDirectory("store").toString) { port =>
      val (code, body) = get(port, "/reports/nope")
      assert(code === 404)
      assert(body.contains("\"code\":\"not_found\"") && body.contains("nope"))
    }
  }
}
