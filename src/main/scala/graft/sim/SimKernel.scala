package graft.sim

import scala.collection.mutable
import org.apache.spark.sql.Dataset

/** The per-scenario sequential simulation kernel (SURVEY §3.1 phase 6).
  *
  * Distribution shape: `repartition(scenarioId)` +
  * `sortWithinPartitions(scenarioId, timeMsc)` + one streaming pass per
  * scenario — the Spark form of the reference's ProcessPool fork
  * (`batch_orchestrator.py:550-574`), with scenarios as the unit of
  * parallelism. State is O(open positions + pending orders + mid window)
  * per scenario; tick history never accumulates.
  *
  * Per-tick order mirrors `process_tick_loop.py:200-316`:
  *   (1) broker path sees EVERY tick — pending-order latency drain,
  *       limit monitoring, SL/TP monitoring, position price update;
  *   (2) clipping gate (ST5): the algo path runs only for non-clipped
  *       ticks (virtual clock: keep if collected_msc >= vclock, then
  *       vclock = collected_msc + budget — `shared_data_preparator.py:462-538`);
  *   (3) decision logic → orders (market orders acquire a seeded latency
  *       deadline, ST9 — fills resolve when tick time passes it);
  *   (4) end of scenario: force-close remaining positions at last price.
  *
  * Fill semantics (ST10, `trade_simulator.py:610-686`): LONG limit fills
  * when ask <= limit (at the limit price); SHORT limit when bid >= limit;
  * market fills at ask (LONG) / bid (SHORT) on the first tick at/after
  * the latency deadline. SL/TP close at the level when bid/ask crosses.
  */
object SimKernel {

  def runScenarios(ticks: Dataset[SimTick], config: SimConfig,
                   logic: DecisionLogic): Dataset[ScenarioResult] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .repartition(org.apache.spark.sql.functions.col("scenarioId"))
      .sortWithinPartitions(
        org.apache.spark.sql.functions.col("scenarioId"),
        org.apache.spark.sql.functions.col("timeMsc"))
      .mapPartitions { it =>
        new ScenarioRunner(config, logic).run(it)
      }
  }

  /** Runs consecutive scenario groups off a sorted partition iterator. */
  private final class ScenarioRunner(config: SimConfig, logic: DecisionLogic)
      extends Serializable {

    def run(it: Iterator[SimTick]): Iterator[ScenarioResult] = new Iterator[ScenarioResult] {
      private val buf = it.buffered
      override def hasNext: Boolean = buf.hasNext
      override def next(): ScenarioResult = {
        val sid = buf.head.scenarioId
        runOne(sid, new Iterator[SimTick] {
          override def hasNext: Boolean = buf.hasNext && buf.head.scenarioId == sid
          override def next(): SimTick = buf.next()
        })
      }
    }

    private case class PendingMarket(
        positionId: Long, direction: Direction, lots: Double,
        slPrice: Double, tpPrice: Double, deadlineMsc: Long)

    private case class PendingLimit(
        positionId: Long, direction: Direction, lots: Double,
        limitPrice: Double, slPrice: Double, tpPrice: Double)

    private def runOne(sid: String, ticks: Iterator[SimTick]): ScenarioResult = {
      val spec = config.spec
      val pointFactor = math.pow(10, spec.digits)
      val delay = new SeededDelay(
        config.latencySeed ^ sid.hashCode.toLong, config.latencyMinMs, config.latencyMaxMs)

      val open = mutable.ArrayBuffer.empty[OpenPosition]
      val pendingMarket = mutable.ArrayBuffer.empty[PendingMarket]
      val pendingLimit = mutable.ArrayBuffer.empty[PendingLimit]
      val trades = mutable.ArrayBuffer.empty[TradeRecord]
      val mids = new RingBuffer(config.midWindow)
      // ST2: per-timeframe forming bar; closes fire exactly once, in
      // timeframe order, on the first tick of a later bucket (the kernel
      // is the single authority for closes — bar_renderer.py:114-233)
      val tfs = config.barTimeframesMs.sorted.toArray
      val forming = new Array[KernelBar](tfs.length)
      // closes ACCUMULATE across clipped passes and drain when the algo
      // path next runs, so no close event is ever lost (ST2 —
      // market_data_types.py:113-133)
      val pendingCloses = mutable.ArrayBuffer.empty[KernelBar]

      var nextPositionId = 1L
      var vclock = 0.0
      // ST5 guard: pre-v1.3.0 captures carry no collection timestamps
      // (collected_msc backfilled to 0); the reference detects this on the
      // first tick and disables budget filtering entirely rather than
      // clipping everything after tick 1 (_apply_tick_budget,
      // shared_data_preparator.py — collected_msc==0 → no filtering).
      var clipEnabled = config.tickBudgetMs > 0
      var ticksTotal = 0L
      var ticksClipped = 0L
      var balance = config.startBalance
      var maxEquity = config.startBalance
      var maxDrawdown = 0.0
      var lastTick: SimTick = null

      def grossPnl(direction: Direction, entry: Double, exit: Double, lots: Double): Double =
        (exit - entry) * direction.sign * pointFactor * spec.tickValue * lots

      def closePosition(p: OpenPosition, exitPrice: Double, exitMsc: Long,
                        reason: String): Unit = {
        val gross = grossPnl(p.direction, p.entryPrice, exitPrice, p.lots)
        val commission = config.commissionPerLot * p.lots
        val net = gross - commission
        val risk =
          if (p.slPrice > 0)
            math.abs(p.entryPrice - p.slPrice) * pointFactor * spec.tickValue * p.lots
          else 0.0
        trades += TradeRecord(sid, p.positionId,
          if (p.direction == Long_) "LONG" else "SHORT", p.lots,
          p.entryTimeMsc, p.entryPrice, exitMsc, exitPrice, gross, commission,
          net, p.maePnl, p.mfePnl, p.maePrice, p.mfePrice, risk,
          if (risk > 0) Some(net / risk) else None, reason)
        balance += net
      }

      def openAt(positionId: Long, direction: Direction, lots: Double,
                 price: Double, sl: Double, tp: Double, msc: Long): Unit =
        open += OpenPosition(positionId, direction, lots, msc, price, sl, tp,
          maePnl = 0.0, mfePnl = 0.0, maePrice = price, mfePrice = price)

      while (ticks.hasNext) {
        val t = ticks.next()
        lastTick = t
        ticksTotal += 1

        // ---- (1) broker path: every tick ----
        // market-order latency drain (ST9)
        var i = 0
        while (i < pendingMarket.length) {
          val pm = pendingMarket(i)
          if (t.timeMsc >= pm.deadlineMsc) {
            val price = if (pm.direction == Long_) t.ask else t.bid
            openAt(pm.positionId, pm.direction, pm.lots, price, pm.slPrice,
              pm.tpPrice, t.timeMsc)
            pendingMarket.remove(i)
          } else i += 1
        }
        // limit monitoring (ST10): LONG ask<=limit; SHORT bid>=limit
        i = 0
        while (i < pendingLimit.length) {
          val pl = pendingLimit(i)
          val reached =
            if (pl.direction == Long_) t.ask <= pl.limitPrice
            else t.bid >= pl.limitPrice
          if (reached) {
            openAt(pl.positionId, pl.direction, pl.lots, pl.limitPrice,
              pl.slPrice, pl.tpPrice, t.timeMsc)
            pendingLimit.remove(i)
          } else i += 1
        }
        // position updates: unrealized P&L on bid (LONG) / ask (SHORT),
        // excursion on the gross axis; then SL/TP monitoring
        i = 0
        while (i < open.length) {
          val p = open(i)
          val cur = if (p.direction == Long_) t.bid else t.ask
          val gross = grossPnl(p.direction, p.entryPrice, cur, p.lots)
          var np = p
          if (gross < p.maePnl) np = np.copy(maePnl = gross, maePrice = cur)
          if (gross > p.mfePnl) np = np.copy(mfePnl = gross, mfePrice = cur)
          open(i) = np
          val slHit = np.slPrice > 0 &&
            (if (np.direction == Long_) t.bid <= np.slPrice else t.ask >= np.slPrice)
          val tpHit = np.tpPrice > 0 &&
            (if (np.direction == Long_) t.bid >= np.tpPrice else t.ask <= np.tpPrice)
          if (slHit) { closePosition(np, np.slPrice, t.timeMsc, "stop_loss"); open.remove(i) }
          else if (tpHit) { closePosition(np, np.tpPrice, t.timeMsc, "take_profit"); open.remove(i) }
          else i += 1
        }

        // equity / drawdown tracking (A20)
        var unrealized = 0.0
        i = 0
        while (i < open.length) {
          val p = open(i)
          val cur = if (p.direction == Long_) t.bid else t.ask
          unrealized += grossPnl(p.direction, p.entryPrice, cur, p.lots)
          i += 1
        }
        val equity = balance + unrealized
        if (equity > maxEquity) maxEquity = equity
        val dd = maxEquity - equity
        if (dd > maxDrawdown) maxDrawdown = dd

        val mid = (t.bid + t.ask) / 2
        mids.add(mid)

        // incremental bar rendering on every tick (clipped ticks feed
        // bars too — clipping only gates the algo path)
        var tfIdx = 0
        while (tfIdx < tfs.length) {
          val tf = tfs(tfIdx)
          val bs = t.timeMsc - t.timeMsc % tf
          val cur = forming(tfIdx)
          if (cur == null)
            forming(tfIdx) = KernelBar(tf, bs, mid, mid, mid, mid, 1L)
          else if (cur.barStartMs == bs)
            forming(tfIdx) = cur.copy(high = math.max(cur.high, mid),
              low = math.min(cur.low, mid), close = mid,
              tickCount = cur.tickCount + 1)
          else {
            pendingCloses += cur // gap buckets emit nothing (ST3)
            forming(tfIdx) = KernelBar(tf, bs, mid, mid, mid, mid, 1L)
          }
          tfIdx += 1
        }

        // ---- (2) clipping gate (ST5) ----
        if (ticksTotal == 1 && t.collectedMsc == 0L) clipEnabled = false
        val clipped = clipEnabled && {
          if (t.collectedMsc >= vclock) {
            vclock = t.collectedMsc + config.tickBudgetMs; false
          } else true
        }
        if (clipped) ticksClipped += 1
        else {
          // ---- (3) algo path: decision logic ----
          val ctx = new DecisionContext(t, ticksTotal - 1, open.toSeq, mids.snapshot,
            pendingCloses.toSeq,
            tfs.indices.iterator.filter(forming(_) != null)
              .map(i => tfs(i) -> forming(i)).toMap)
          pendingCloses.clear()
          logic.onTick(ctx).foreach {
            case OpenMarket(dir, lots, sl, tp) =>
              val pid = nextPositionId; nextPositionId += 1
              val deadline =
                if (config.latencyMaxMs > 0) t.timeMsc + delay.next() else t.timeMsc
              if (deadline <= t.timeMsc) {
                val price = if (dir == Long_) t.ask else t.bid
                openAt(pid, dir, lots, price, sl, tp, t.timeMsc)
              } else pendingMarket += PendingMarket(pid, dir, lots, sl, tp, deadline)
            case OpenLimit(dir, lots, limit, sl, tp) =>
              val pid = nextPositionId; nextPositionId += 1
              val reached = if (dir == Long_) t.ask <= limit else t.bid >= limit
              if (reached) openAt(pid, dir, lots, limit, sl, tp, t.timeMsc)
              else pendingLimit += PendingLimit(pid, dir, lots, limit, sl, tp)
            case ClosePosition(pid) =>
              val idx = open.indexWhere(_.positionId == pid)
              if (idx >= 0) {
                val p = open(idx)
                val price = if (p.direction == Long_) t.bid else t.ask
                closePosition(p, price, t.timeMsc, "decision_close")
                open.remove(idx)
              }
            case Hold => ()
          }
        }
      }

      // ---- (4) end of scenario: force-close at last price ----
      if (lastTick != null) {
        open.foreach { p =>
          val price = if (p.direction == Long_) lastTick.bid else lastTick.ask
          closePosition(p, price, lastTick.timeMsc, "end_of_scenario")
        }
        open.clear()
      }

      val wins = trades.count(_.netPnl > 0).toLong
      val losses = trades.count(_.netPnl < 0).toLong
      ScenarioResult(
        ScenarioStats(sid, ticksTotal, ticksClipped, trades.length.toLong,
          wins, losses, balance, maxEquity, maxDrawdown),
        trades.toSeq)
    }
  }

  /** Fixed-capacity ring of recent mids, oldest-first snapshot. */
  private final class RingBuffer(capacity: Int) extends Serializable {
    private val a = new Array[Double](capacity)
    private var n = 0
    private var pos = 0
    def add(v: Double): Unit = { a(pos) = v; pos = (pos + 1) % capacity; if (n < capacity) n += 1 }
    def snapshot: IndexedSeq[Double] = {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = a((pos - n + i + capacity * 2) % capacity); i += 1 }
      out.toIndexedSeq
    }
  }
}
