package graft.catalog

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class CatalogSpec extends SparkSpecBase {
  import spark.implicits._

  test("coverage: per-file bounds, counts, sampled stats over real testdata") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val cov = Catalog.coverage(ev, Seq.empty, "ts_ms", statCols = Seq("value"))
      .collect()
    assert(cov.length === 1) // single parquet file
    val r = cov.head
    assert(r.getAs[Long]("n_rows") === 1000L)
    assert(r.getAs[Long]("start_ms") < r.getAs[Long]("end_ms"))
    assert(r.getAs[String]("file").contains("events.parquet"))
    assert(r.getAs[Double]("avg_value") > 0)
  }

  test("coverage over a BARS table (S9): per-timeframe bounds and counts") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis(col("ts_ms")))
    val bars = graft.bars.Ohlcv.renderTimeframe(ev, Seq(lit("E")), col("ts"),
        col("value"), col("value"), col("ts_ms"), "H1")
      .withColumn("ts_ms", org.apache.spark.sql.functions.unix_millis(col("bar_start")))
      .withColumn("timeframe", lit("H1"))
    val cov = Catalog.coverage(bars, Seq("timeframe"), "ts_ms",
      statCols = Seq("close")).collect()
    assert(cov.length === 1)
    val r = cov.head
    assert(r.getAs[String]("timeframe") === "H1")
    assert(r.getAs[Long]("n_rows") > 0)
    assert(r.getAs[Long]("start_ms") < r.getAs[Long]("end_ms"))
    assert(r.getAs[Double]("avg_close") > 0)
  }

  test("availability: range containment verdict per key") {
    val cov = Seq(("A", 100L, 200L, 10L), ("B", 150L, 400L, 20L))
      .toDF("sym", "start_ms", "end_ms", "n_rows")
    val out = Catalog.availability(cov, Seq("sym"), 120L, 180L)
      .orderBy("sym").collect()
    assert(out(0).getAs[Boolean]("available"))   // A covers 120-180
    assert(!out(1).getAs[Boolean]("available"))  // B starts at 150
  }

  test("configFingerprint: order-insensitive, value-sensitive") {
    val a = Catalog.configFingerprint(Map("x" -> "1", "y" -> "2"))
    val b = Catalog.configFingerprint(Map("y" -> "2", "x" -> "1"))
    val c = Catalog.configFingerprint(Map("x" -> "1", "y" -> "3"))
    assert(a === b)
    assert(a !== c)
  }

  test("writeWithManifest: parquet + KV sidecar round-trips (incl. escapes)") {
    val dir = Files.createTempDirectory("graft_manifest").toString + "/ds"
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val meta = Map("source_file" -> "ticks_\"q1\".json",
      "import_version" -> "1.3.1", "n_rows" -> "2")
    Catalog.writeWithManifest(df, dir, meta)
    assert(spark.read.parquet(dir).count() === 2)
    assert(Catalog.readManifest(spark, dir) === meta)
    // no temp residue from the atomic write
    assert(!new java.io.File(dir, "_manifest.json.tmp").exists())
  }

  test("writeKvFile/readKvFile: control-char and unicode values round-trip") {
    // The Retrieval segment manifest encodes file lists with \u0001 field
    // and \n record separators INSIDE one value — the escape path must
    // carry control chars, quotes, backslashes, and non-ASCII exactly.
    val dir = Files.createTempDirectory("graft_kv").toString
    val path = s"$dir/_segments.json"
    val kv = Map(
      "files" -> ("file:/a b/part-0.parquet\u00011234\u00015678\n" +
        "file:/c\u00019\u00012"),
      "quote" -> """he said "hi" \ bye""",
      "unicode" -> "täst-ünïcode-€",
      "empty" -> "")
    Catalog.writeKvFile(spark, path, kv)
    assert(Catalog.readKvFile(spark, path) === Some(kv))
    assert(!new java.io.File(path + ".tmp").exists())
    // missing -> None; malformed -> loud (never silently absent)
    assert(Catalog.readKvFile(spark, s"$dir/absent.json") === None)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/torn.json"),
      """{"files":"part""".getBytes("UTF-8"))
    intercept[java.io.IOException](
      Catalog.readKvFile(spark, s"$dir/torn.json"))
  }

  test("readManifest: missing -> empty; malformed (truncated) -> loud failure") {
    val dir = Files.createTempDirectory("graft_manifest2").toString + "/ds"
    val df = Seq((1L, "x")).toDF("id", "v")
    df.write.parquet(dir)
    assert(Catalog.readManifest(spark, dir) === Map.empty)
    // simulate a torn write: a partial manifest must not read as "no lineage"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_manifest.json"),
      """{"source_file":"tick""".getBytes("UTF-8"))
    val e = intercept[java.io.IOException](Catalog.readManifest(spark, dir))
    assert(e.getMessage.contains("malformed manifest"))
  }

  test("cachedDerived: recomputes only when the fingerprint changes") {
    val dir = Files.createTempDirectory("graft_cache").toString + "/derived"
    var computes = 0
    def compute = { computes += 1; Seq((1, "a"), (2, "b")).toDF("id", "v") }
    val cfg1 = Map("param" -> "1")
    Catalog.cachedDerived(spark, dir, cfg1)(compute)
    Catalog.cachedDerived(spark, dir, cfg1)(compute) // hit -> no recompute
    assert(computes === 1)
    Catalog.cachedDerived(spark, dir, Map("param" -> "2"))(compute)
    assert(computes === 2)
    assert(spark.read.parquet(dir).count() === 2L)
  }
}
