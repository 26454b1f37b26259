package graft

import org.apache.spark.sql.functions._
import graft.sim._

/** E2E spec for the §3.1 flagship: a dense synthetic tick table runs the
  * full phase 0–7 pipeline with a SCRIPTED deterministic strategy, so
  * window shapes, warmup gating, kernel wiring, report values, and the
  * ranking artifact are all asserted against first-principles values
  * (kernel-internal exactness — fills, latency, P&L math — is covered by
  * SimKernelSpec; this spec proves the orchestration around it). */
class BacktestSpec extends SparkSpecBase {
  import spark.implicits._

  /** One symbol, 1 tick/min for 6 days: one continuous region → three
    * 2-day blocks → roles IS, IS, OOS at oosSplit 0.3. */
  private def syntheticTicks = {
    val t0 = 1700000000000L
    val n = 6 * 24 * 60
    spark.range(0, n, 1, 4)
      .select(lit("EURUSD").as("symbol"),
        (lit(t0) + col("id") * 60000L).as("ts_ms"),
        (lit(100.0) + sin(col("id") / lit(40.0)) * 5.0).as("mid"))
  }

  /** Scripted per-scenario logic: open LONG on the 10th tick seen in the
    * scenario, close on the 20th. Scenario transitions are tracked by
    * scenarioId (scenarios arrive sequentially within a partition). */
  final class Scripted extends DecisionLogic {
    private var sid: String = null
    private var count = 0
    def onTick(ctx: DecisionContext): Seq[Decision] = {
      if (ctx.tick.scenarioId != sid) { sid = ctx.tick.scenarioId; count = 0 }
      count += 1
      if (count >= 10 && count < 20 && ctx.openPositions.isEmpty)
        Seq(OpenMarket(Long_, lots = 1.0))
      else if (count >= 20 && ctx.openPositions.nonEmpty)
        Seq(ClosePosition(ctx.openPositions.head.positionId))
      else Seq(Hold)
    }
  }

  private val cfg = Backtest.Config(
    splitGapMs = 3600000L, blockMs = 2L * 86400 * 1000,
    minBlockMs = 86400000L, oosSplit = 0.3, warmupBarMs = 60000L,
    halfSpread = 0.005, commissionPerLot = 2.5)

  test("phases 0-7: windows, warmup gate, trades, reports, ranking") {
    val out = java.nio.file.Files.createTempDirectory("backtest_e2e").toString
    val ranked = Backtest.run(spark, syntheticTicks, out, new Scripted, cfg)
      .collect()

    // window generation: exactly 3 scenarios, trailing one OOS
    assert(ranked.length === 3)
    val byStart = ranked.sortBy(_.getAs[String]("scenarioId")
      .split('@').last.toLong)
    assert(byStart.map(_.getAs[String]("role")).toSeq ===
      Seq("IN_SAMPLE", "IN_SAMPLE", "OUT_OF_SAMPLE"))

    // every scenario ran its scripted round-trip exactly once
    assert(ranked.forall(_.getAs[Long]("nTrades") === 1L))

    // ranking is net_pnl desc with rank 1..3
    assert(ranked.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("net_pnl"))
      .toSeq.reverse === ranked.map(_.getAs[Double]("net_pnl")).toSeq.sorted)

    // the ranking CSV artifact exists with a header and 3 data rows
    val csv = spark.read.option("header", "true").csv(s"$out/ranking")
    assert(csv.count() === 3)
    assert(csv.columns.contains("net_pnl"))

    // report JSONs exist and are consistent with the trade ledger
    val analytics = spark.read.json(s"$out/trade_analytics")
    val sumNet = analytics.agg(sum("sum_net")).head().getDouble(0)
    val rankedNet = ranked.map(_.getAs[Double]("net_pnl")).sum
    assert(math.abs(sumNet - rankedNet) < 1e-6,
      s"analytics sum_net $sumNet != ranked net total $rankedNet")
    val wfe = spark.read.json(s"$out/wfe")
    assert(wfe.count() === 1) // one symbol, IS and OOS means both present
    assert(wfe.head().getAs[Long]("n_is") === 2L)
    assert(wfe.head().getAs[Long]("n_oos") === 1L)
  }

  test("warmup gate: ticks warm indicators but trades never start early") {
    val out = java.nio.file.Files.createTempDirectory("backtest_gate").toString
    // capture trades via the pipeline's outcome path: rerun with a logic
    // that tries to open IMMEDIATELY (count >= 1) — the gate must hold
    // every entry until the scenario's trade window starts
    final class Eager extends DecisionLogic {
      def onTick(ctx: DecisionContext): Seq[Decision] =
        if (ctx.openPositions.isEmpty) Seq(OpenMarket(Long_, 1.0)) else Seq(Hold)
    }
    Backtest.run(spark, syntheticTicks, out, new Eager, cfg)
    // block 2 and 3 have warmup ticks (8 bars before the window);
    // entries must all sit at/after their block_start
    val trades = spark.read.json(s"$out/trade_analytics")
    assert(trades.count() >= 1) // trades happened at all
    // structural check via the ranking: every scenario's id carries its
    // trade start; the eager logic would open during warmup without the
    // gate, producing an entry before start — proven impossible by the
    // kernel outcome: re-derive entries from the event-stream CSV is
    // overkill here, the WarmupGate property is asserted directly below
    val gateProbe = new Backtest.WarmupGate(new Eager)
    val tick = SimTick("S#0#0@1000", 999L, 999L, 1.0, 1.01)
    val ctx = new DecisionContext(tick, 0L, Nil, IndexedSeq(1.0))
    assert(gateProbe.onTick(ctx) === Seq(Hold))
    val tickAfter = SimTick("S#0#0@1000", 1000L, 1000L, 1.0, 1.01)
    val ctxAfter = new DecisionContext(tickAfter, 1L, Nil, IndexedSeq(1.0))
    assert(gateProbe.onTick(ctxAfter).exists(_.isInstanceOf[OpenMarket]))
  }

  test("sweep mode: shared mount, fused grid, combo matches its solo run") {
    val out = java.nio.file.Files.createTempDirectory("backtest_sweep").toString
    // (5, 8) carries the grid's max warmup (rsi 5→6 bars, bb 8→8 bars),
    // so its sweep execution sees exactly the warmup margin a solo run
    // with those params computes — the parity below is then bit-exact
    val grid = Map("rsi_period" -> Seq("5", "3"), "bb_period" -> Seq("8", "6"))
    val ranked = Backtest.sweep(spark, syntheticTicks, out, grid,
      lots = 1.0, cfg = cfg).collect()

    assert(ranked.length === 4)
    assert(ranked.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2, 3, 4))
    // ranking is objective desc
    assert(ranked.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("net_pnl"))
      .toSeq.reverse === ranked.map(_.getAs[Double]("net_pnl")).toSeq.sorted)

    // parity: the (5, 8) combination == the solo phase 0-7 pipeline with
    // the same params (cfg defaults are rsi 5 / bb 8)
    val soloOut = java.nio.file.Files.createTempDirectory("backtest_solo").toString
    val solo = Backtest.run(spark, syntheticTicks, soloOut,
      new TickReplay.RsiBollingerTrend(lots = 1.0, rsiPeriod = 5, bbPeriod = 8),
      cfg)
    val soloNet = solo.collect().map(_.getAs[Double]("net_pnl")).sum
    val combo = ranked.find { r =>
      val p = r.getAs[Map[String, String]]("params")
      p("rsi_period") == "5" && p("bb_period") == "8"
    }.get
    // ranking objective passes through ledgerObjectives' round(..., 6)
    assert(combo.getAs[Double]("net_pnl") ===
      BigDecimal(soloNet).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      "fused sweep combo diverges from the solo pipeline")
    // ...and the un-rounded ledger rows match the solo run to the bit
    val comboLedger = spark.read.json(s"$out/sweep_ledger")
      .filter(col("runId") === combo.getAs[String]("run_id"))
      .select("scenarioId", "netPnl").collect()
      .map(r => r.getAs[String]("scenarioId") -> r.getAs[Double]("netPnl")).toMap
    val soloPerScenario = solo.collect()
      .map(r => r.getAs[String]("scenarioId") -> r.getAs[Double]("net_pnl")).toMap
    assert(comboLedger === soloPerScenario,
      "fused sweep ledger diverges from the solo pipeline per scenario")

    // artifacts: ranking CSV with 4 rows, ledger JSON per combo x scenario
    val csv = spark.read.option("header", "true").csv(s"$out/sweep_ranking")
    assert(csv.count() === 4)
    val ledger = spark.read.json(s"$out/sweep_ledger")
    assert(ledger.select("runId").distinct().count() === 4)
    assert(ledger.count() === 12) // 4 combos x 3 scenarios
  }

  test("phase 0 fails fast on invalid strategy parameters") {
    val out = java.nio.file.Files.createTempDirectory("backtest_bad").toString
    val e = intercept[IllegalArgumentException] {
      Backtest.run(spark, syntheticTicks, out, new Scripted,
        cfg.copy(rsiParams = Map("period" -> "not_a_number")))
    }
    assert(e.getMessage.contains("not numeric"))
  }
}
