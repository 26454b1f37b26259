package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming bar rendering (SURVEY §2.9 ST1–ST3).
  *
  * Two forms, mirroring the reference's two renderers:
  *  - [[ohlcvStream]]: declarative tumbling-window aggregation over a
  *    streaming DataFrame (`readStream` → `groupBy(window(...))`), bars
  *    finalize when the event-time watermark passes the window end —
  *    the streaming twin of the batch `Ohlcv.render` (A1). Gaps produce
  *    no bars (no row → no group), matching ST3.
  *  - [[IncrementalBars.renderTicks]]: per-key `flatMapGroupsWithState`
  *    that maintains the currently-forming bar and emits each COMPLETED
  *    bar exactly once, in bucket order, when a tick arrives in a later
  *    bucket — the reference's bar-close lifecycle where the renderer is
  *    the single authority for closes
  *    (`/root/reference/python/framework/bars/bar_renderer.py:114-233`,
  *    `market_data_types.py:113-133`).
  */
object StreamingBars {

  /** Tumbling-window streaming OHLCV.
    * open/close use `min_by`/`max_by` over the unique (tsMs, tieBreak)
    * pair — deterministic, and legal in streaming aggregations (unlike
    * rank windows). */
  def ohlcvStream(ticks: DataFrame, keys: Seq[Column], ts: Column,
                  price: Column, volume: Column, tieBreak: Column,
                  timeframe: String, watermarkDelay: String): DataFrame = {
    val tf = graft.bars.Ohlcv.Timeframes(timeframe)
    ticks
      .withColumn("__ts", ts)
      .withColumn("__p", price)
      .withColumn("__v", volume)
      .withColumn("__ord", struct(ts.cast("timestamp"), tieBreak))
      .withWatermark("__ts", watermarkDelay)
      .groupBy(keys :+ window(col("__ts"), tf).getField("start").as("bar_start"): _*)
      .agg(
        min_by(col("__p"), col("__ord")).as("open"),
        max(col("__p")).as("high"),
        min(col("__p")).as("low"),
        max_by(col("__p"), col("__ord")).as("close"),
        sum(col("__v")).as("volume"),
        count(col("__p")).as("tick_count"))
  }
}

/** Incremental (stateful) bar rendering over a typed tick stream. */
object IncrementalBars {

  case class Tick(key: String, tsMs: Long, price: Double, volume: Double)

  case class Bar(key: String, barStartMs: Long, open: Double, high: Double,
                 low: Double, close: Double, volume: Double, tickCount: Long)

  /** Open-bar state per key. */
  case class OpenBar(barStartMs: Long, open: Double, high: Double, low: Double,
                     close: Double, volume: Double, tickCount: Long)

  private def bucketStart(tsMs: Long, barMs: Long): Long = tsMs - tsMs % barMs

  /** Fold one tick into the open bar (A2, `market_data_types.py:71-83`):
    * open on first, high=max, low=min, close=last, volume+=, count++. */
  private def update(b: OpenBar, t: Tick): OpenBar =
    b.copy(high = math.max(b.high, t.price), low = math.min(b.low, t.price),
      close = t.price, volume = b.volume + t.volume, tickCount = b.tickCount + 1)

  /** The per-group fold shared by cold and warm-started renders: fold
    * this micro-batch's ticks into the open-bar state, emitting each
    * completed bar exactly once, in bucket order. */
  private[streaming] def foldGroup(barMs: Long)(
      key: String, it: Iterator[Tick], state: GroupState[OpenBar])
      : Iterator[Bar] = {
    val closed = scala.collection.mutable.ArrayBuffer.empty[Bar]
    var open = state.getOption.orNull
    it.foreach { t =>
      val bs = bucketStart(t.tsMs, barMs)
      if (open == null) {
        open = OpenBar(bs, t.price, t.price, t.price, t.price, t.volume, 1L)
      } else if (bs == open.barStartMs) {
        open = update(open, t)
      } else {
        // bucket advanced: close the forming bar (gap buckets emit
        // nothing — ST3), start a new one
        closed += Bar(key, open.barStartMs, open.open, open.high,
          open.low, open.close, open.volume, open.tickCount)
        open = OpenBar(bs, t.price, t.price, t.price, t.price, t.volume, 1L)
      }
    }
    if (open != null) state.update(open)
    closed.iterator
  }

  /** Stateful streaming render: emits each completed bar exactly once, in
    * order, when the first tick of a later bucket arrives. Ticks must be
    * in event-time order per key within each micro-batch (upstream sorted;
    * out-of-order feeds need a watermark-buffered variant).
    * The still-forming bar stays in state and is never emitted early.
    * With a `checkpointLocation` on the query, the open-bar state is
    * snapshot per batch and restored on restart (ST11) — a bar spanning
    * a restart closes exactly once. */
  def renderTicks(ticks: Dataset[Tick], barMs: Long,
                  outputMode: OutputMode = OutputMode.Append()): Dataset[Bar] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.key)
      .flatMapGroupsWithState[OpenBar, Bar](
        outputMode, GroupStateTimeout.NoTimeout())(foldGroup(barMs))
  }
}
