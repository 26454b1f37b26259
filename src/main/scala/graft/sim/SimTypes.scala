package graft.sim

/** Simulation kernel data model (SURVEY §2.9 ST5/ST9/ST10, §3.1 phase 6).
  * Mirrors the reference's tick/position/trade shapes
  * (`/root/reference/python/framework/types/portfolio_types/`) without
  * porting its process architecture: one scenario = one sorted group,
  * processed in a single streaming pass inside `flatMapGroups`.
  */

/** One simulation input tick, scenario-tagged. */
case class SimTick(
    scenarioId: String,
    timeMsc: Long,
    collectedMsc: Long,
    bid: Double,
    ask: Double)

/** Symbol economics for P&L conversion (the J4 dimension lookup):
  * gross = priceDiff · 10^digits · tickValue · lots
  * (`/root/reference/python/framework/utils/trading_math/pnl_math.py:8`). */
case class SymbolSpec(digits: Int, tickValue: Double)

sealed trait Direction extends Serializable { def sign: Int }
case object Long_ extends Direction { val sign = 1 }
case object Short_ extends Direction { val sign = -1 }

/** Decisions the strategy can emit on a (non-clipped) tick.
  *
  * Order-type surface mirrors `trade_simulator.py`:
  *   - STOP triggers on breakout (LONG: ask >= stop; SHORT: bid <= stop)
  *     and fills AT MARKET (`_is_stop_price_reached`, :630-649);
  *   - STOP_LIMIT converts to a limit order at `limitPrice` when the stop
  *     triggers (`_convert_stop_limit_to_limit`, :652-686);
  *   - Modify/Cancel of working limit/stop orders are ASYNC (#318): they
  *     schedule at decision time (validation immediate) and apply at the
  *     next pass with time >= now + modifyCancelDelayMs (:692-808);
  *   - PartialClose realizes proportional P&L/fees and keeps the
  *     remainder open (`portfolio_manager.py:454-560`).
  *
  * In Modify fields, NaN = keep current value, 0.0 = remove the level. */
sealed trait Decision extends Serializable
case class OpenMarket(direction: Direction, lots: Double,
                      slPrice: Double = 0.0, tpPrice: Double = 0.0) extends Decision
case class OpenLimit(direction: Direction, lots: Double, limitPrice: Double,
                     slPrice: Double = 0.0, tpPrice: Double = 0.0) extends Decision
case class OpenStop(direction: Direction, lots: Double, stopPrice: Double,
                    slPrice: Double = 0.0, tpPrice: Double = 0.0) extends Decision
case class OpenStopLimit(direction: Direction, lots: Double, stopPrice: Double,
                         limitPrice: Double, slPrice: Double = 0.0,
                         tpPrice: Double = 0.0) extends Decision
case class ModifyOrder(orderId: Long, newPrice: Double = Double.NaN,
                       newLimitPrice: Double = Double.NaN,
                       newSl: Double = Double.NaN,
                       newTp: Double = Double.NaN) extends Decision
case class CancelOrder(orderId: Long) extends Decision
case class PartialClose(positionId: Long, lots: Double) extends Decision
case class ClosePosition(positionId: Long) extends Decision
case object Hold extends Decision

/** Read-only view of a working order, exposed on DecisionContext so the
  * strategy can address Modify/Cancel by orderId. `busy` = a modify or
  * cancel is already in flight (#318: one operation at a time). */
case class PendingOrderView(orderId: Long, kind: String, direction: Direction,
                            lots: Double, price: Double, limitPrice: Double,
                            slPrice: Double, tpPrice: Double, busy: Boolean)

/** Account snapshot (margin mode, `portfolio_manager.get_account_info`):
  * equity = balance + unrealized; marginUsed = Σ lots·contractSize/leverage;
  * freeMargin = equity - marginUsed. */
case class AccountInfo(balance: Double, equity: Double, marginUsed: Double,
                       freeMargin: Double)

/** One in-kernel bar (mid-price OHLC, tick_count = ticks seen). */
case class KernelBar(timeframeMs: Long, barStartMs: Long, open: Double,
                     high: Double, low: Double, close: Double, tickCount: Long)

/** Strategy context visible to the decision logic: open positions, a
  * rolling window of recent mid prices (for in-kernel indicators), the
  * bars CLOSED by this tick (ST2 — each fires exactly once, in order),
  * and the currently forming bar per timeframe.
  *
  * Views are LAZY (by-name): the kernel hands the context to every
  * non-clipped tick, and materializing all six views per tick dominated
  * the replay profile for strategies that read one or two of them. Each
  * view snapshots on first read and is stable for the rest of the
  * callback; reads are only valid DURING the onTick/onHeartbeat call
  * and the execution of its returned decisions (the kernel mutates its
  * buffers between ticks). The kernel ENFORCES this: it invalidates the
  * context once the decisions have executed, and a first read of any
  * view after that throws instead of silently observing mutated/cleared
  * kernel buffers. Views already forced during the callback stay
  * readable (they are stable snapshots). */
final class DecisionContext(
    val tick: SimTick,
    val tickIndex: Long,
    openPositions0: => Seq[OpenPosition],
    recentMids0: => IndexedSeq[Double],
    closedBars0: => Seq[KernelBar] = Seq.empty,
    formingBars0: => Map[Long, KernelBar] = Map.empty,
    pendingOrders0: => Seq[PendingOrderView] = Seq.empty,
    account0: => AccountInfo = AccountInfo(0, 0, 0, 0)) {
  private var live: Boolean = true
  /** Kernel-only: mark the context dead once its decisions executed. */
  private[sim] def invalidate(): Unit = live = false
  private def guard[A](view: => A): A = {
    if (!live) throw new IllegalStateException(
      "DecisionContext view read after its callback completed: views are " +
        "only valid during onTick/onHeartbeat (and the execution of the " +
        "decisions it returned). Force the view inside the callback if the " +
        "strategy needs to retain a snapshot.")
    view
  }
  lazy val openPositions: Seq[OpenPosition] = guard(openPositions0)
  lazy val recentMids: IndexedSeq[Double] = guard(recentMids0)
  lazy val closedBars: Seq[KernelBar] = guard(closedBars0)
  lazy val formingBars: Map[Long, KernelBar] = guard(formingBars0)
  lazy val pendingOrders: Seq[PendingOrderView] = guard(pendingOrders0)
  lazy val account: AccountInfo = guard(account0)
}

/** The X5 plugin surface: deterministic, serializable strategy.
  * Heartbeats (ST6, #360): an opt-in strategy also receives ghost-passes
  * at `heartbeatIntervalMs` steps of simulated time strictly inside a
  * tick gap — no bar render, no tick count, broker fills resolved at the
  * ghost instant with last-known prices. */
trait DecisionLogic extends Serializable {
  def onTick(ctx: DecisionContext): Seq[Decision]
  def wantsHeartbeat: Boolean = false
  /** `ctx.tick` is the PREVIOUS data tick; `timeMsc` is the ghost instant. */
  def onHeartbeat(timeMsc: Long, ctx: DecisionContext): Seq[Decision] = Seq.empty
}

/** Open position state (kernel-internal but exposed to DecisionLogic). */
case class OpenPosition(
    positionId: Long,
    direction: Direction,
    lots: Double,
    entryTimeMsc: Long,
    entryPrice: Double,
    slPrice: Double,
    tpPrice: Double,
    // running excursion (gross P&L axis, prices seeded to entry —
    // `portfolio_types.py:102-118`)
    maePnl: Double = 0.0,
    mfePnl: Double = 0.0,
    maePrice: Double = 0.0,
    mfePrice: Double = 0.0,
    // accrued overnight swap (signed cost; debit positive) and the instant
    // accrued up to (`portfolio_manager.py:875-917` #365)
    swapCost: Double = 0.0,
    swapAccruedUntilMsc: Long = 0L)

/** Closed trade — the result ledger row (`portfolio_trade_record_types.py`). */
case class TradeRecord(
    scenarioId: String,
    positionId: Long,
    direction: String,
    lots: Double,
    entryTimeMsc: Long,
    entryPrice: Double,
    exitTimeMsc: Long,
    exitPrice: Double,
    grossPnl: Double,
    commission: Double,
    netPnl: Double,
    maePnl: Double,
    mfePnl: Double,
    maePrice: Double,
    mfePrice: Double,
    initialRisk: Double,
    rMultiple: Option[Double],
    closeReason: String,
    /** realized swap cost for this (portion of the) position; debit > 0 */
    swapCost: Double = 0.0,
    /** "full" | "partial" (`CloseType`, portfolio_manager.py:534) */
    closeType: String = "full")

/** Per-scenario summary (A20 running portfolio stats + ST5 clipping). */
case class ScenarioStats(
    scenarioId: String,
    ticksTotal: Long,
    ticksClipped: Long,
    nTrades: Long,
    nWins: Long,
    nLosses: Long,
    finalBalance: Double,
    maxEquity: Double,
    maxDrawdown: Double,
    /** orders rejected by SL/TP validation or the margin check */
    nRejected: Long = 0L)

/** One row per scenario: stats + nested trade ledger (matches the
  * reference's per-scenario result packaging, `ProcessTickLoopResult`). */
case class ScenarioResult(stats: ScenarioStats, trades: Seq[TradeRecord])

/** Per-scenario outcome with executor-side failure isolation:
  * error == "" iff `result` is present. One bad scenario no longer fails
  * the whole action (used by the sweep ledger). */
case class ScenarioOutcome(scenarioId: String, error: String,
                           result: Option[ScenarioResult])

/** Kernel configuration. */
case class SimConfig(
    spec: SymbolSpec,
    startBalance: Double = 10000.0,
    commissionPerLot: Double = 0.0,
    /** ST5 virtual-clock budget; <=0 disables clipping. */
    tickBudgetMs: Double = 0.0,
    /** ST9 seeded order latency bounds (ms). */
    latencyMinMs: Long = 0L,
    latencyMaxMs: Long = 0L,
    latencySeed: Long = 42L,
    /** rolling mid window kept for DecisionContext.recentMids */
    midWindow: Int = 32,
    /** ST2: timeframes (ms) rendered incrementally inside the kernel;
      * closed bars surface on DecisionContext.closedBars. */
    barTimeframesMs: Seq[Long] = Seq.empty,
    /** #318 async modify/cancel: scheduled at decision time, applied at the
      * first pass with time >= scheduled + this delay (reference default 1). */
    modifyCancelDelayMs: Long = 1L,
    /** Overnight swap accrual (points mode, `trading_fees.py:118-140`):
      * cost per rollover crossing = -(rate · mult · tickValue · lots);
      * Sat/Sun carry no rollover, the triple weekday books 3 days. */
    swapEnabled: Boolean = false,
    swapLongPoints: Double = 0.0,
    swapShortPoints: Double = 0.0,
    /** broker rollover instant, UTC hour (weekend-only model; the
      * reference's DST-aware local rollover collapses to a UTC hour here) */
    swapRolloverUtcHour: Int = 22,
    /** weekday carrying triple swap, 0=Mon … 6=Sun (typically Wednesday) */
    swapTripleWeekday: Int = 2,
    /** margin checks: leverage 0 disables; required = lots·contractSize/
      * leverage (quote-margin mode, `abstract_adapter.py:1010-1043`) */
    leverage: Double = 0.0,
    contractSize: Double = 100000.0,
    /** ST6 heartbeat ghost-passes: 0 disables; only strategies with
      * wantsHeartbeat=true receive them (#360) */
    heartbeatIntervalMs: Long = 0L,
    /** #208: no ghost-passes across gaps longer than this (market silent) */
    interTickGapThresholdMs: Long = 300000L)

/** Deterministic delay generator (concept of
  * `seeded_delay_generator.py:15-35`: seeded RNG, uniform inclusive
  * [min,max], identical sequence per seed) — implemented as splitmix64 so
  * the sequence is stable across JVMs and runs. */
final class SeededDelay(seed: Long, minMs: Long, maxMs: Long) extends Serializable {
  private var state = seed
  def next(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    val span = maxMs - minMs + 1
    minMs + java.lang.Long.remainderUnsigned(z, span)
  }
}
