package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpecBase
import graft.bars.Ohlcv

/** Streaming/batch bar parity — the Spark analogue of the reference's
  * golden parity suite (`tests/parity/test_bar_parity_*`): the same
  * deterministic tick stream must produce identical bars through the
  * batch renderer, the streaming window aggregation, and the stateful
  * incremental renderer. */
class StreamingBarsSpec extends SparkSpecBase {
  import spark.implicits._

  private val t0 = 1700000000000L - (1700000000000L % 60000L) // minute-aligned
  private def ticks: Seq[IncrementalBars.Tick] = {
    val rnd = new scala.util.Random(7)
    var p = 100.0
    (0 until 600).map { i =>
      p += rnd.nextDouble() - 0.5
      IncrementalBars.Tick("BTCUSD", t0 + i * 1000L, p, 1.0)
    }
  }

  private def batchBars = {
    val df = ticks.toDF()
      .withColumn("ts", timestamp_millis(col("tsMs")))
    Ohlcv.renderTimeframe(df, Seq(col("key")), col("ts"), col("price"),
        col("volume"), col("tsMs"), "M1")
      .select(col("key"), unix_millis(col("bar_start")).as("barStartMs"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("tick_count"))
      .orderBy("barStartMs").collect().map(_.toSeq)
  }

  test("streaming window agg matches batch renderer bar-for-bar") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[IncrementalBars.Tick]
    val bars = StreamingBars.ohlcvStream(
      stream.toDF().withColumn("ts", timestamp_millis(col("tsMs"))),
      Seq(col("key")), col("ts"), col("price"), col("volume"), col("tsMs"),
      "M1", "0 seconds")
    val q = bars.writeStream.outputMode("complete")
      .format("memory").queryName("stream_bars").start()
    try {
      stream.addData(ticks)
      q.processAllAvailable()
      val got = spark.table("stream_bars")
        .select(col("key"), unix_millis(col("bar_start")).as("barStartMs"),
          col("open"), col("high"), col("low"), col("close"),
          col("volume"), col("tick_count"))
        .orderBy("barStartMs").collect().map(_.toSeq)
      assert(got.toSeq === batchBars.toSeq)
    } finally q.stop()
  }

  test("ST11: open-bar state survives a checkpointed restart, closes exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val sink = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val stream = MemoryStream[IncrementalBars.Tick]
    def start() = IncrementalBars.renderTicks(stream.toDS(), 60000L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[IncrementalBars.Bar], _: Long) =>
        val rows = ds.collect().map(b => Seq[Any](b.key, b.barStartMs, b.open,
          b.high, b.low, b.close, b.volume, b.tickCount))
        sink.synchronized { sink ++= rows }
        ()
      }
      .start()
    // stop mid-minute: the forming minute-0 bar exists only in state
    val (first, rest) = ticks.splitAt(30)
    stream.addData(first)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(sink.isEmpty, "no bucket advanced before the restart")
    // restart from the checkpoint; feed the rest of minute 0, minute 1,
    // and the first tick of minute 2 (which closes minute 1)
    stream.addData(rest.take(91))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // minute-0 bar merges pre-restart state with post-restart ticks (its
    // open/volume/count prove the snapshot was restored, not rebuilt);
    // minutes 0 and 1 close exactly once and match the batch renderer
    assert(sink.sortBy(_(1).asInstanceOf[Long]).toSeq === batchBars.take(2).toSeq)
  }

  test("transformWithState renderer (Spark 4 API) matches the batch renderer") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[IncrementalBars.Tick]
    val bars = BarsTws.renderTicks(stream.toDS(), 60000L)
    val q = bars.writeStream.outputMode("append")
      .format("memory").queryName("tws_bars").start()
    try {
      val (first, second) = ticks.splitAt(250)
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
      val got = spark.table("tws_bars").orderBy("barStartMs").collect().map(_.toSeq)
      assert(got.length === 9)
      assert(got.toSeq === batchBars.take(9).toSeq)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState warm start seeds the forming bar from history (ST4)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val m0 = 1700000000000L - (1700000000000L % 60000L)
    val warm = Seq(("BTCUSD",
      IncrementalBars.OpenBar(m0, 100.0, 102.0, 99.0, 101.0, 5.0, 3L))).toDS()
    val stream = MemoryStream[IncrementalBars.Tick]
    val q = BarsTws.renderTicksWarm(stream.toDS(), 60000L, warm)
      .writeStream.outputMode("append").format("memory").queryName("tws_warm").start()
    try {
      stream.addData(
        IncrementalBars.Tick("BTCUSD", m0 + 30000L, 98.0, 1.0),
        IncrementalBars.Tick("BTCUSD", m0 + 60000L, 103.0, 1.0))
      q.processAllAvailable()
      val got = spark.table("tws_warm").as[IncrementalBars.Bar].collect()
      // minute-0 bar: open/high from history, low from the live tick,
      // volume 5+1, count 3+1 — the live bar CONTINUED the historical one
      assert(got.toSeq === Seq(IncrementalBars.Bar(
        "BTCUSD", m0, 100.0, 102.0, 98.0, 98.0, 6.0, 4L)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("incremental stateful renderer emits closed bars exactly once, in order") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[IncrementalBars.Tick]
    val bars = IncrementalBars.renderTicks(stream.toDS(), 60000L)
    val q = bars.writeStream.outputMode("append")
      .format("memory").queryName("inc_bars").start()
    try {
      // feed in two micro-batches to exercise cross-batch state
      val (first, second) = ticks.splitAt(250)
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
      val got = spark.table("inc_bars").orderBy("barStartMs").collect().map(_.toSeq)
      // 600 ticks @1/s from a minute boundary = 10 complete bars; the 10th
      // minute's bar never closes (no tick in a later bucket) -> 9 closed
      assert(got.length === 9)
      val batch = batchBars
      // closed bars must equal the batch bars for the same buckets
      assert(got.toSeq === batch.take(9).toSeq)
    } finally q.stop()
  }
}
