package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSession
import graft.streaming.{IncrementalBars, LiveLoop}

/** RocksDB state-store soak for the ST1 live loop at high KEY
  * cardinality — the reference runs one autotrader loop per symbol; the
  * Spark form holds every symbol's (forming bar + bar history) in ONE
  * transformWithState store, so the scale question is state-store
  * behavior as keys multiply, not tick volume alone.
  *
  * `runMain graft.tools.LiveLoopSoak [keys] [minutes]` (defaults
  * 1000 keys × 30 minutes of 1s ticks = 1.8M ticks, ~10× the key
  * cardinality any spec drives). Feeds ticks through MemoryStream in
  * bar-aligned batches (state must survive batch boundaries), RocksDB
  * provider, and checks the exact invariant: every key closes exactly
  * minutes−1 bars and fires the SMA decision on every bar from its
  * lookback on. Prints one JSON line with ticks/s and per-batch times. */
object LiveLoopSoak {

  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toInt).getOrElse(1000)
    val minutes = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = GraftSession.localFromEnv()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val t0 = 1700000000000L - (1700000000000L % 60000L)
    val lookback = 3
    val stream = MemoryStream[IncrementalBars.Tick]
    val q = LiveLoop.run(stream.toDS(), 60000L, new LiveLoop.BarStrategy {
        val lookbackBars = lookback
        def onBarClose(h: Seq[IncrementalBars.Bar]): Seq[String] =
          if (h.length >= lookbackBars) Seq("BUY") else Nil
      })
      .writeStream.outputMode("append").format("memory")
      .queryName("live_soak").start()

    // one batch per simulated minute: nKeys ticks/s, rising closes
    val batchSecs = new Array[Double](minutes)
    val total = System.nanoTime()
    var m = 0
    while (m < minutes) {
      val ticks = (0 until 60).flatMap { s =>
        val ts = t0 + (m * 60L + s) * 1000L
        (0 until nKeys).map(k =>
          IncrementalBars.Tick(s"sym_$k", ts, 100.0 + (m * 60 + s) * 0.01 + k, 1.0))
      }
      val b0 = System.nanoTime()
      stream.addData(ticks)
      q.processAllAvailable()
      batchSecs(m) = (System.nanoTime() - b0) / 1e9
      m += 1
    }
    val totalSec = (System.nanoTime() - total) / 1e9
    val nTicks = nKeys.toLong * 60L * minutes

    val events = spark.table("live_soak")
    val barsPerKey = events.filter($"kind" === "bar")
      .groupBy("key").count().select("count").distinct().as[Long].collect()
    val decisionsPerKey = events.filter($"kind" === "decision")
      .groupBy("key").count().select("count").distinct().as[Long].collect()
    val nKeysSeen = events.select("key").distinct().count()
    q.stop()

    val ok = nKeysSeen == nKeys &&
      barsPerKey.toSeq == Seq(minutes - 1L) &&
      decisionsPerKey.toSeq == Seq(minutes - 1L - (lookback - 1L))
    def f(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", v)
    println(s"""{"soak":"live_loop_rocksdb","keys":$nKeys,"minutes":$minutes,""" +
      s""""ticks":$nTicks,"sec":${f(totalSec)},"ticks_per_sec":${f(nTicks / totalSec)},""" +
      s""""batch_min_sec":${f(batchSecs.min)},"batch_max_sec":${f(batchSecs.max)},""" +
      s""""invariants_ok":$ok}""")
    require(ok, "live-loop soak invariant violated: " +
      s"keys=$nKeysSeen barsPerKey=${barsPerKey.toSeq} decisionsPerKey=${decisionsPerKey.toSeq}")
    spark.stop()
  }
}
