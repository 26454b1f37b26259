package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.AsOfJoin
import graft.streaming.{IncrementalBars, StreamingAsOf}

/** RocksDB soak for the streaming FORWARD as-of
  * ([[StreamingAsOf.enrichForward]]) at [[LiveLoopSoak]] scale — the
  * forward processor is the riskier of the two as-of streams: where
  * backward keeps one `LastSignal` per key, forward BUFFERS every tick
  * whose matching signal has not arrived yet (`ListState` of pending
  * ticks), so the scale questions are the pending buffer's behavior
  * across thousands of keys × thousands of batches, and exact parity of
  * the accumulated output against the batch operator
  * ([[AsOfJoin.forward]]) on the same events.
  *
  * `runMain graft.tools.ForwardAsOfSoak [keys] [minutes]` (defaults
  * 1000 × 30 = 1.8M ticks, one batch per simulated minute, signals every
  * 15 s per key). Checks, distributively (except-diff, no driver
  * materialization of the 1.8M-row result):
  *
  *   - every emitted row matches the batch forward join's non-null rows
  *     EXACTLY (same signal ts + value, the >= and highest-at-tie rules);
  *   - the still-pending set is exactly the batch null-payload set (the
  *     ticks after each key's last signal — a stream cannot know no
  *     later signal will come);
  *   - emitted + pending = all ticks (each tick exactly once).
  *
  * Prints one JSON line with ticks/s and per-batch min/max seconds. */
object ForwardAsOfSoak {

  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toInt).getOrElse(1000)
    val minutes = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = GraftSession.localFromEnv()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val t0 = 1700000000000L - (1700000000000L % 60000L)
    val ticks = MemoryStream[IncrementalBars.Tick]
    val signals = MemoryStream[(String, Long, Double)]
    val q = StreamingAsOf.enrichForward(ticks.toDS(), signals.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("fwd_soak").start()

    // 1 tick/s per key; a signal every 15 s per key (at s % 15 == 7), so
    // each minute's batch leaves the tail ticks (s > 52) pending until
    // the NEXT minute's first signal — pending state is exercised at
    // every batch boundary, and the final minute's tail stays pending
    // forever (the batch null-payload set).
    val batchSecs = new Array[Double](minutes)
    // Per-batch attribution (round-13 verdict: the r12 artifact's 32.7 s
    // batch_max vs 0.84 s batch_min carried no cause). Each batch records
    // its driver-JVM GC delta and the host 1-min loadavg at batch end, so
    // a spike separates into (a) GC pause, (b) co-tenant host load, or
    // (c) neither → state-store/stream-internal, directly from the
    // artifact.
    val batchGcS = new Array[Double](minutes)
    val batchLoad = new Array[Double](minutes)
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def loadavg(): Double = scala.util.Try(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split(' ')(0).toDouble).getOrElse(-1.0)
    val total = System.nanoTime()
    var m = 0
    while (m < minutes) {
      val tickRows = (0 until 60).flatMap { s =>
        val ts = t0 + (m * 60L + s) * 1000L
        (0 until nKeys).map(k =>
          IncrementalBars.Tick(s"sym_$k", ts, 100.0 + (m * 60 + s) * 0.01 + k, 1.0))
      }
      val sigRows = (0 until 60).filter(_ % 15 == 7).flatMap { s =>
        val ts = t0 + (m * 60L + s) * 1000L
        (0 until nKeys).map(k => (s"sym_$k", ts, (m * 60 + s) * 0.001 + k))
      }
      val b0 = System.nanoTime()
      val g0 = gcMs()
      ticks.addData(tickRows)
      signals.addData(sigRows)
      q.processAllAvailable()
      batchSecs(m) = (System.nanoTime() - b0) / 1e9
      batchGcS(m) = (gcMs() - g0) / 1e3
      batchLoad(m) = loadavg()
      m += 1
    }
    val totalSec = (System.nanoTime() - total) / 1e9
    val nTicks = nKeys.toLong * 60L * minutes

    // ---- batch mirror on the same events ----
    val allTicks = (0 until minutes).flatMap { mm =>
      (0 until 60).flatMap { s =>
        val ts = t0 + (mm * 60L + s) * 1000L
        (0 until nKeys).map(k =>
          (s"sym_$k", ts, 100.0 + (mm * 60 + s) * 0.01 + k))
      }
    }.toDF("key", "tsMs", "price")
    // sig ts duplicated into the payload so the matched signal's
    // TIMESTAMP is visible in the batch output (the operator consumes
    // the right ts column); tie rule orders by (sigTs, value) = the
    // streaming highest-value-at-minimal-ts rule on this data.
    val allSignals = (0 until minutes).flatMap { mm =>
      (0 until 60).filter(_ % 15 == 7).flatMap { s =>
        val ts = t0 + (mm * 60L + s) * 1000L
        (0 until nKeys).map(k => (s"sym_$k", ts, ts, (mm * 60 + s) * 0.001 + k))
      }
    }.toDF("key", "sigTs", "signalTsMs", "signalValue")
    val batch = AsOfJoin.forward(allTicks, allSignals, Seq("key"),
      "tsMs", "sigTs", Seq("signalTsMs", "signalValue"))
    val batchMatched = batch.filter(col("signalTsMs").isNotNull)
      .select(col("key"), col("tsMs"), col("price"),
        col("signalTsMs"), col("signalValue"))
    val nBatchPending = batch.filter(col("signalTsMs").isNull).count()

    val streamed = spark.table("fwd_soak")
      .select(col("key"), col("tsMs"), col("price"),
        col("signalTsMs"), col("signalValue"))
    val nStreamed = streamed.count()
    val diff = streamed.except(batchMatched).count() +
      batchMatched.except(streamed).count()
    q.stop()

    val ok = diff == 0 && nStreamed + nBatchPending == nTicks
    def f(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", v)
    val sortedSecs = batchSecs.sorted
    val p50 = sortedSecs(minutes / 2)
    val p95 = sortedSecs(math.min(minutes - 1, (minutes * 95) / 100))
    // Name the slowest batches WITH their attribution columns.
    val slow = batchSecs.zipWithIndex.sortBy(-_._1).take(5).map {
      case (sec, i) =>
        s"""{"batch":$i,"sec":${f(sec)},"gc_s":${f(batchGcS(i))},""" +
          s""""loadavg":${f(batchLoad(i))}}"""
    }.mkString("[", ",", "]")
    println(s"""{"soak":"forward_asof_rocksdb","keys":$nKeys,"minutes":$minutes,""" +
      s""""ticks":$nTicks,"sec":${f(totalSec)},"ticks_per_sec":${f(nTicks / totalSec)},""" +
      s""""batch_min_sec":${f(batchSecs.min)},"batch_max_sec":${f(batchSecs.max)},""" +
      s""""batch_p50_sec":${f(p50)},"batch_p95_sec":${f(p95)},""" +
      s""""slowest_batches":$slow,""" +
      s""""emitted":$nStreamed,"pending":${nTicks - nStreamed},""" +
      s""""parity_diff":$diff,"invariants_ok":$ok}""")
    require(ok, s"forward as-of soak violated: diff=$diff " +
      s"emitted=$nStreamed batch_pending=$nBatchPending ticks=$nTicks")
    spark.stop()
  }
}
