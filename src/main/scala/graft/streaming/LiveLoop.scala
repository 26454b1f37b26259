package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** The live tick loop (SURVEY ST1) as ONE streaming pipeline:
  * ticks → incremental bars → strategy on each bar close → decisions —
  * the Spark form of the reference's autotrader loop
  * (`/root/reference/python/framework/autotrader/autotrader_tick_loop.py`:
  * WS source → bar render → workers → decision → orders), with the
  * broker/order leg handled downstream by [[graft.sim.SimKernel]] or a
  * live adapter consuming the emitted decision rows.
  *
  * One `transformWithState` processor per key holds BOTH pieces of
  * state: the forming bar (`ValueState`) and a bounded bar history
  * (`ListState`, trimmed to the strategy's lookback — the ST4 warmup
  * requirement). BAR_CLOSE compute basis (X3): the strategy fires
  * exactly once per completed bar, never on intra-bar ticks, and sees
  * only closed bars. All state is checkpoint-restored (ST11).
  */
object LiveLoop {

  /** BAR_CLOSE strategy plugin: full (oldest-first) closed-bar history
    * including the bar that just closed; returns 0+ action strings
    * (e.g. "BUY"/"SELL") that become decision rows. */
  trait BarStrategy extends Serializable {
    def lookbackBars: Int
    def onBarClose(history: Seq[IncrementalBars.Bar]): Seq[String]
  }

  /** One output event: a closed bar (kind="bar", action empty) or a
    * strategy decision (kind="decision", action set) stamped with the
    * closing bar's bucket. */
  case class LoopEvent(key: String, barStartMs: Long, kind: String,
                       action: String, close: Double, tickCount: Long)

  class LoopProcessor(barMs: Long, strategy: BarStrategy)
      extends StatefulProcessor[String, IncrementalBars.Tick, LoopEvent] {

    @transient private var open: ValueState[IncrementalBars.OpenBar] = _
    @transient private var hist: ListState[IncrementalBars.Bar] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState("open",
        Encoders.product[IncrementalBars.OpenBar], TTLConfig.NONE)
      hist = getHandle.getListState("bar_history",
        Encoders.product[IncrementalBars.Bar], TTLConfig.NONE)
    }

    override def handleInputRows(key: String,
                                 rows: Iterator[IncrementalBars.Tick],
                                 timers: TimerValues): Iterator[LoopEvent] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[LoopEvent]
      var cur = if (open.exists()) open.get() else null

      def close(): Unit = {
        val bar = IncrementalBars.Bar(key, cur.barStartMs, cur.open, cur.high,
          cur.low, cur.close, cur.volume, cur.tickCount)
        out += LoopEvent(key, bar.barStartMs, "bar", "", bar.close, bar.tickCount)
        // bounded history: append, trim to the strategy lookback
        val bars = (hist.get().toSeq :+ bar).takeRight(strategy.lookbackBars)
        hist.put(bars.toArray)
        strategy.onBarClose(bars).foreach { action =>
          out += LoopEvent(key, bar.barStartMs, "decision", action,
            bar.close, bar.tickCount)
        }
      }

      rows.foreach { t =>
        val bs = t.tsMs - t.tsMs % barMs
        if (cur == null) {
          cur = IncrementalBars.OpenBar(bs, t.price, t.price, t.price, t.price, t.volume, 1L)
        } else if (bs == cur.barStartMs) {
          cur = cur.copy(high = math.max(cur.high, t.price),
            low = math.min(cur.low, t.price), close = t.price,
            volume = cur.volume + t.volume, tickCount = cur.tickCount + 1)
        } else {
          close()
          cur = IncrementalBars.OpenBar(bs, t.price, t.price, t.price, t.price, t.volume, 1L)
        }
      }
      if (cur != null) open.update(cur)
      out.iterator
    }
  }

  /** Run the loop over a live tick stream (RocksDB state store required). */
  def run(ticks: Dataset[IncrementalBars.Tick], barMs: Long,
          strategy: BarStrategy): Dataset[LoopEvent] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.key)
      .transformWithState(new LoopProcessor(barMs, strategy), TimeMode.None(),
        OutputMode.Append())
  }
}
