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

/** Decisions the strategy can emit on a (non-clipped) tick. */
sealed trait Decision extends Serializable
case class OpenMarket(direction: Direction, lots: Double,
                      slPrice: Double = 0.0, tpPrice: Double = 0.0) extends Decision
case class OpenLimit(direction: Direction, lots: Double, limitPrice: Double,
                     slPrice: Double = 0.0, tpPrice: Double = 0.0) extends Decision
case class ClosePosition(positionId: Long) extends Decision
case object Hold extends Decision

/** One in-kernel bar (mid-price OHLC, tick_count = ticks seen). */
case class KernelBar(timeframeMs: Long, barStartMs: Long, open: Double,
                     high: Double, low: Double, close: Double, tickCount: Long)

/** Strategy context visible to the decision logic: open positions, a
  * rolling window of recent mid prices (for in-kernel indicators), the
  * bars CLOSED by this tick (ST2 — each fires exactly once, in order),
  * and the currently forming bar per timeframe. */
final class DecisionContext(
    val tick: SimTick,
    val tickIndex: Long,
    val openPositions: Seq[OpenPosition],
    val recentMids: IndexedSeq[Double],
    val closedBars: Seq[KernelBar] = Seq.empty,
    val formingBars: Map[Long, KernelBar] = Map.empty)

/** The X5 plugin surface: deterministic, serializable strategy. */
trait DecisionLogic extends Serializable {
  def onTick(ctx: DecisionContext): Seq[Decision]
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
    mfePrice: Double = 0.0)

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
    closeReason: String)

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
    maxDrawdown: Double)

/** One row per scenario: stats + nested trade ledger (matches the
  * reference's per-scenario result packaging, `ProcessTickLoopResult`). */
case class ScenarioResult(stats: ScenarioStats, trades: Seq[TradeRecord])

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
    barTimeframesMs: Seq[Long] = Seq.empty)

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
