package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpecBase

/** SMA-cross demo strategy: BUY when the closing bar's close exceeds the
  * mean close of the full lookback window (needs a full window). */
private class SmaCross(val lookbackBars: Int) extends LiveLoop.BarStrategy {
  def onBarClose(history: Seq[IncrementalBars.Bar]): Seq[String] =
    if (history.length < lookbackBars) Seq.empty
    else {
      val mean = history.map(_.close).sum / history.length
      if (history.last.close > mean) Seq("BUY") else Seq.empty
    }
}

class LiveLoopSpec extends SparkSpecBase {
  import spark.implicits._

  test("ST1 live loop: ticks -> bars -> BAR_CLOSE strategy -> decisions, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val t0 = 1700000000000L - (1700000000000L % 60000L)
    // rising closes: 100, 101, ... one tick per second, 6 minutes
    val ticks = (0 until 360).map(i =>
      IncrementalBars.Tick("X", t0 + i * 1000L, 100.0 + i * 0.01, 1.0))
    val stream = MemoryStream[IncrementalBars.Tick]
    val q = LiveLoop.run(stream.toDS(), 60000L, new SmaCross(3))
      .writeStream.outputMode("append").format("memory").queryName("live_loop").start()
    try {
      val (a, b) = ticks.splitAt(150) // split mid-bar: state carries over
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val events = spark.table("live_loop").orderBy("barStartMs", "kind").collect()
        .map(e => (e.getAs[String]("kind"), e.getAs[String]("action"),
          e.getAs[Long]("barStartMs")))
      val bars = events.filter(_._1 == "bar")
      val decisions = events.filter(_._1 == "decision")
      // 6 minutes of ticks -> 5 closed bars (the 6th stays forming)
      assert(bars.length === 5)
      // strategy needs a full 3-bar window: closes fire on bars 3..5,
      // and with rising closes the last close always beats the mean
      assert(decisions.map(_._2).toSeq === Seq("BUY", "BUY", "BUY"))
      assert(decisions.map(_._3).toSeq === bars.map(_._3).drop(2).toSeq)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
