package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpecBase

class StreamingAsOfSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming as-of enrichment: ticks carry the latest prior signal across batches") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ticks = MemoryStream[IncrementalBars.Tick]
    val signals = MemoryStream[(String, Long, Double)]
    val out = StreamingAsOf.enrich(ticks.toDS(), signals.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_enriched").start()
    try {
      // batch 0: a tick before any signal exists
      ticks.addData(IncrementalBars.Tick("X", 50L, 1.0, 0))
      q.processAllAvailable()
      // batch 1: signal lands at t=100, then ticks at/after it (separate
      // sources = separate micro-batches; cross-batch order is the
      // source contract, same as the bar renderer)
      signals.addData(("X", 100L, 0.7))
      ticks.addData(IncrementalBars.Tick("X", 100L, 2.0, 0),
        IncrementalBars.Tick("X", 150L, 3.0, 0))
      q.processAllAvailable()
      // batch 2: no new signal — state must carry across the batch gap
      ticks.addData(IncrementalBars.Tick("X", 200L, 4.0, 0))
      q.processAllAvailable()
      // batch 3: fresh signal, then a tick; an OLDER signal is ignored
      signals.addData(("X", 250L, 0.9), ("X", 240L, 0.1))
      ticks.addData(IncrementalBars.Tick("X", 300L, 5.0, 0))
      q.processAllAvailable()
      val rows = spark.table("asof_enriched").orderBy("tsMs").collect()
        .map(r => (r.getAs[Long]("tsMs"), r.getAs[Boolean]("hasSignal"),
          r.getAs[Long]("signalTsMs"), r.getAs[Double]("signalValue")))
      assert(rows.toSeq === Seq(
        (50L, false, 0L, 0.0),     // before any signal
        (100L, true, 100L, 0.7),   // signal at the same instant visible (<=)
        (150L, true, 100L, 0.7),
        (200L, true, 100L, 0.7),   // carried across the micro-batch boundary
        (300L, true, 250L, 0.9)))  // newest wins; stale 240 ignored
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
