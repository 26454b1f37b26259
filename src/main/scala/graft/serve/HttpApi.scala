package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S12/S13 over real HTTP: the reference serves its read-only API with
  * FastAPI (`api/endpoints/bars_router.py:65-115`,
  * `reports_router.py:24-270`); here the same contract rides the JDK's
  * built-in `HttpServer` — zero new dependencies, and the engine-side
  * plan shapes (`Serve.barsSlice`, the report store) stay the single
  * source of truth.
  *
  * Endpoints:
  *   - `GET /bars?timeframe=M1&from=<ms>&to=<ms>&max=<n>` — the capped
  *     newest-window slice, ascending, as a JSON array.
  *   - `GET /reports` — stored report names (the store's index view).
  *   - `GET /reports/<name>` — one report document set, JSON array.
  *
  * Error contract mirrors the reference's `ApiException` envelope:
  * `{"code": "<slug>", "detail": "..."}` with 400 for parameter errors
  * and 404 for unknown reports.
  *
  * Responses are driver-collected BY DESIGN: every endpoint is already
  * row-capped (`maxBars`, one coalesced report document) — the same
  * bounded-response contract the reference's routers enforce before
  * serialization. Unbounded data belongs in the parquet/CSV sinks, not
  * behind a GET.
  */
final class HttpApi(spark: SparkSession, bars: () => DataFrame,
                    storeDir: String, host: String = "127.0.0.1",
                    port: Int = 0, maxBarsCap: Int = 10000) {

  private val server = HttpServer.create(new InetSocketAddress(host, port), 0)
  server.createContext("/bars", (ex: HttpExchange) => handle(ex)(handleBars))
  server.createContext("/reports", (ex: HttpExchange) => handle(ex)(handleReports))

  /** Start serving; returns the bound port (ephemeral when `port=0`). */
  def start(): Int = {
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  private def handle(ex: HttpExchange)(f: HttpExchange => (Int, String)): Unit = {
    val (status, body) =
      try f(ex)
      catch {
        case e: IllegalArgumentException => (400, errJson("bad_request", e.getMessage))
        case e: NoSuchElementException   => (404, errJson("not_found", e.getMessage))
        case e: Exception                => (500, errJson("internal", e.toString))
      }
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def handleBars(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestMethod != "GET")
      return (405, errJson("method_not_allowed", ex.getRequestMethod))
    val q = query(ex)
    val timeframe = q.getOrElse("timeframe",
      throw new IllegalArgumentException("missing required parameter 'timeframe'"))
    val from = q.get("from").map(parseLong("from")).getOrElse(Long.MinValue)
    val to = q.get("to").map(parseLong("to")).getOrElse(Long.MaxValue)
    val max = q.get("max").map(parseLong("max")).map(_.toInt).getOrElse(1000)
    if (max > maxBarsCap)
      throw new IllegalArgumentException(s"max ($max) exceeds cap $maxBarsCap")
    val slice = Serve.barsSlice(bars(), timeframe, from, to, max)
    (200, jsonArray(slice))
  }

  private def handleReports(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestMethod != "GET")
      return (405, errJson("method_not_allowed", ex.getRequestMethod))
    val name = ex.getRequestURI.getPath.stripPrefix("/reports")
      .stripPrefix("/").takeWhile(_ != '/')
    if (name.isEmpty) {
      val names = Serve.listReports(spark, storeDir)
      (200, names.map(jsonString).mkString("[", ",", "]"))
    } else {
      if (!Serve.listReports(spark, storeDir).contains(name))
        throw new NoSuchElementException(s"no report named '$name'")
      (200, jsonArray(Serve.readReportJson(spark, storeDir, name)))
    }
  }

  /** One bounded result set → one JSON array (rows are already JSON
    * objects via Spark's own serializer, so types/encoding match the
    * store exactly). */
  private def jsonArray(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  private def parseLong(name: String)(raw: String): Long =
    try raw.toLong
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"parameter '$name' is not an integer: '$raw'")
    }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
      .filter(_.nonEmpty)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => decode(k) -> decode(v)
          case Array(k)    => decode(k) -> ""
        }
      }.toMap

  private def decode(s: String): String =
    java.net.URLDecoder.decode(s, UTF_8)

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    } + "\""

  private def errJson(slug: String, detail: String): String =
    s"""{"code":"$slug","detail":${jsonString(Option(detail).getOrElse(""))}}"""
}
