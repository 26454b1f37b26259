package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.ingest.TickIngest
import graft.report.Reports
import graft.serve.Serve
import graft.sim._
import graft.windows.ScenarioWindows
import graft.workers.Workers

/** §3.1 flagship entry point: ONE runnable backtest pipeline from parquet
  * ticks to a ranked report, mirroring the reference batch orchestrator's
  * phases 0–7 (`batch_orchestrator.py:255-321` → `prepare_mount` phases
  * 0–5 + `execute` phases 6–7) as one declarative Spark job chain.
  *
  *   0. validate — typed strategy-parameter validation, FAIL-FAST before
  *      any data is touched (`ScenarioValidator.validate_scenario_parameters`);
  *   1. index/coverage — per-(symbol, file) time bounds + row counts
  *      (`tick_index_manager`);
  *   2. availability — requested range ⊆ covered range per symbol;
  *   3. requirements — warmup lookback derived from the strategy's
  *      workers (`warmupBars`, ST4), converted to a tick-time margin;
  *   4. load — normalized tick read (events table → per-symbol mid with
  *      a deterministic synthetic spread);
  *   5. quality — invalid-quote / excess-spread / price-jump counts
  *      (`tick_importer.py:569-593`), fail-fast above thresholds;
  *   6. execute — scenario windows (continuous regions → blocks →
  *      IS/OOS roles) × symbols → [[sim.SimKernel]] sequential pass per
  *      scenario, warmup ticks feeding indicators but gated from trading;
  *   7. summary — trade analytics + portfolio rollup + robustness/WFE
  *      by role + ranked scenarios, written to `outDir` (ranking as CSV,
  *      reports as JSON via [[serve.Serve]]).
  *
  * Scale shape: every phase is a groupBy/window/join plan (no driver
  * loops); the kernel phase partitions BY SCENARIO — the reference's
  * process-pool-per-scenario (`batch_orchestrator.py` worker pool)
  * becomes `repartition(scenarioId) + sortWithinPartitions + mapPartitions`,
  * so a 1000-executor cluster runs 1000 scenarios concurrently with no
  * coordinator. Windows are a dimension table (broadcast into the tick
  * tagging join); ticks shuffle exactly once (into scenario partitions).
  */
object Backtest {

  /** Tunables for the window generator + quality gate + kernel. Defaults
    * fit the driver testdata's events table (~4-day span per symbol). */
  case class Config(
      maxSymbols: Int = 20,
      splitGapMs: Long = 3L * 86400 * 1000,
      blockMs: Long = 10L * 86400 * 1000,
      minBlockMs: Long = 2L * 86400 * 1000,
      oosSplit: Double = 0.3,
      /** bar interval backing warmupBars → warmup time margin; sized to
        * the feed cadence (events demo feed ≈ 1 tick / 30 min) */
      warmupBarMs: Long = 1800000L,
      /** deterministic synthetic half-spread for mid-only feeds */
      halfSpread: Double = 0.005,
      /** phase-5 gate: max tolerated share of bad quotes per symbol */
      maxBadQuotePct: Double = 5.0,
      /** indicator periods — sized to the feed's tick cadence (the
        * events demo feed is ~1 tick/30 min, so small periods; dense
        * tick feeds use the 14/20 defaults of [[sim.TickReplay]]) */
      rsiParams: Map[String, String] = Map("period" -> "5"),
      bbParams: Map[String, String] = Map("period" -> "8"),
      startBalance: Double = 10000.0,
      commissionPerLot: Double = 2.5)

  /** Phase-6 warmup gate: ticks before the window's trade start feed the
    * strategy's indicator state (DecisionContext windows warm up exactly
    * like the reference's warmup phase) but every decision is suppressed
    * to Hold, so no position can open before the scenario's trade window.
    * The trade start rides in the scenarioId (`sym#region#block@startMs`)
    * — per-scenario state without any driver-side map. */
  final class WarmupGate(inner: DecisionLogic) extends DecisionLogic {
    override def onTick(ctx: DecisionContext): Seq[Decision] = {
      val sid = ctx.tick.scenarioId
      val start = sid.substring(sid.lastIndexOf('@') + 1).toLong
      if (ctx.tick.timeMsc < start) { inner.onTick(ctx); Seq(Hold) }
      else inner.onTick(ctx)
    }
    override def wantsHeartbeat: Boolean = inner.wantsHeartbeat
    override def onHeartbeat(timeMsc: Long, ctx: DecisionContext): Seq[Decision] = {
      val sid = ctx.tick.scenarioId
      val start = sid.substring(sid.lastIndexOf('@') + 1).toLong
      if (timeMsc < start) { inner.onHeartbeat(timeMsc, ctx); Seq(Hold) }
      else inner.onHeartbeat(timeMsc, ctx)
    }
  }

  case class Summary(
      nSymbols: Long, nWindows: Long, nScenarios: Long, nErrors: Long,
      nTrades: Long, totalNetPnl: Double)

  /** The prepared mount (reference `prepare_mount` output, phases 1-6
    * tick tagging): everything a kernel execution needs, independent of
    * the strategy parameters — which is exactly why a sweep can reuse it
    * across the whole grid (`batch_orchestrator.py:656-695`: mount
    * identity excludes strategy params). */
  case class Mount(simTicks: Dataset[SimTick], windows: DataFrame,
                   quality: DataFrame, avail: DataFrame)

  /** Phases 1-6 (pre-kernel): coverage, availability, load, quality
    * gate, scenario windows, tick tagging. `warmupMs` is the caller's
    * phase-3 requirement (max over the strategy grid for sweeps). */
  def prepareMount(spark: SparkSession, ticks: DataFrame, cfg: Config,
                   warmupMs: Long): Mount = {
    import spark.implicits._

    // ---- Phase 1: index & coverage -----------------------------------
    val coverage = Catalog.coverage(ticks, Seq("symbol"), "ts_ms",
      statCols = Seq("mid")).cache()

    // ---- Phase 2: availability (requested range = full covered span) -
    val span = coverage.agg(min(col("start_ms")), max(col("end_ms")))
      .head()
    val (startMs, endMs) = (span.getLong(0), span.getLong(1))
    val avail = Catalog.availability(coverage, Seq("symbol"), startMs, endMs)

    // ---- Phase 4: load (spread synthesis for mid-only feeds) ---------
    val loaded = ticks.select(col("symbol"), col("ts_ms"),
        (col("mid") - cfg.halfSpread).as("bid"),
        (col("mid") + cfg.halfSpread).as("ask"))
      .filter(col("ts_ms").isNotNull && col("mid").isNotNull)

    // ---- Phase 5: data quality gate ----------------------------------
    val quality = TickIngest.qualityReport(
      loaded.withColumn("broker_type", lit("SIM"))
        .withColumn("source_file", lit("events"))
        .withColumn("arrival_idx", col("ts_ms"))
        .withColumn("spread_pct",
          (col("ask") - col("bid")) / col("bid") * 100)
        .withColumnRenamed("symbol", "symbol")).cache()
    val bad = quality.filter(
      col("n_invalid_quote") + col("n_excess_spread") >
        col("n_ticks") * cfg.maxBadQuotePct / 100.0)
    val nBad = bad.count()
    require(nBad == 0,
      s"phase 5: $nBad symbol(s) exceed the ${cfg.maxBadQuotePct}% bad-quote gate")

    // ---- Phase 6: scenario windows × kernel execution ----------------
    val regions = ScenarioWindows.continuousRegions(
      loaded, Seq("symbol"), "ts_ms", cfg.splitGapMs)
    val blocks = ScenarioWindows.blocks(regions, Seq("symbol"),
      cfg.blockMs, cfg.minBlockMs)
    val windows = ScenarioWindows.assignRolesTimeOrdered(blocks,
        Seq("symbol"), "block_start_ms", cfg.oosSplit)
      .withColumn("scenario_id", concat_ws("", col("symbol"), lit("#"),
        col("region_idx"), lit("#"), col("block_no"), lit("@"),
        col("block_start_ms")))
      .cache()

    // tag ticks into scenarios: windows are a broadcast dimension; each
    // tick lands in every window whose [start−warmup, end) covers it
    val simTicks = loaded.join(
        broadcast(windows.select(col("symbol").as("__wsym"),
          col("scenario_id"), col("block_start_ms"), col("block_end_ms"))),
        col("symbol") === col("__wsym") &&
          col("ts_ms") >= col("block_start_ms") - warmupMs &&
          col("ts_ms") < col("block_end_ms"))
      .select(col("scenario_id").as("scenarioId"),
        col("ts_ms").as("timeMsc"), col("ts_ms").as("collectedMsc"),
        col("bid"), col("ask"))
      .as[SimTick]

    Mount(simTicks, windows, quality, avail)
  }

  /** The phase-6 kernel config shared by [[run]] and [[sweep]]. */
  private def simConfig(cfg: Config): SimConfig = SimConfig(
    SymbolSpec(digits = 2, tickValue = 1.0),
    startBalance = cfg.startBalance,
    commissionPerLot = cfg.commissionPerLot,
    latencyMinMs = 20, latencyMaxMs = 120, latencySeed = 42L,
    barTimeframesMs = Seq(cfg.warmupBarMs))

  /** Run the full phase 0–7 pipeline. `ticks` must carry (symbol: string,
    * ts_ms: long, mid: double) — see [[loadEventsAsTicks]] for the
    * events-table adapter. Writes ranking CSV + report JSONs under
    * `outDir` and returns the per-scenario summary frame (one row per
    * scenario: stats ⋈ window role ⋈ rank). */
  def run(spark: SparkSession, ticks: DataFrame, outDir: String,
          logic: DecisionLogic, cfg: Config = Config()): DataFrame = {
    import spark.implicits._

    // ---- Phase 0: fail-fast typed parameter validation (X6) ----------
    val rsiW = Workers.registry("CORE/rsi")
    val bbW = Workers.registry("CORE/bollinger")
    val rsiCfg = rsiW.validate(cfg.rsiParams)
    val bbCfg = bbW.validate(cfg.bbParams)

    // ---- Phase 3: data requirements (ST4 warmup lookback) ------------
    val warmupBars = math.max(
      rsiW.warmupBars(rsiCfg), bbW.warmupBars(bbCfg))
    val warmupMs = warmupBars * cfg.warmupBarMs

    // ---- Phases 1-6 (pre-kernel): the mount --------------------------
    val mount = prepareMount(spark, ticks, cfg, warmupMs)
    val (simTicks, windows, quality, avail) =
      (mount.simTicks, mount.windows, mount.quality, mount.avail)

    val outcomes = SimKernel.runScenariosOutcomes(simTicks, simConfig(cfg),
      new WarmupGate(logic)).cache()

    // ---- Phase 7: summary — report stack + ranking -------------------
    val stats = outcomes.filter(_.error == "").flatMap(_.result)
      .map(_.stats).toDF()
    val trades = outcomes.filter(_.error == "").flatMap(_.result)
      .flatMap(_.trades).toDF()
    val errors = outcomes.filter(_.error != "")
      .map(o => (o.scenarioId, o.error)).toDF("scenario_id", "error")

    val tradeLedger = trades.select(lit("USD").as("currency"),
      col("scenarioId").as("scenario_name"), col("netPnl").as("net_pnl"),
      col("rMultiple").as("r_multiple"), col("maePnl").as("mae"),
      col("mfePnl").as("mfe"), col("grossPnl").as("gross_profit"),
      (col("commission") + col("swapCost")).as("fees"))
    val analytics = Reports.tradeAnalytics(tradeLedger)
    val rollup = Reports.portfolioRollup(tradeLedger.join(
      stats.select(col("scenarioId").as("scenario_name"),
        col("maxDrawdown").as("max_drawdown")), Seq("scenario_name")))

    // per-scenario pnl ⋈ window role → robustness + WFE by symbol
    val perScenario = stats
      .withColumn("net_pnl", col("finalBalance") - cfg.startBalance)
      .join(broadcast(windows.select(col("scenario_id").as("scenarioId"),
        col("symbol"), col("role"))), Seq("scenarioId"))
    val robustness = Reports.robustnessStats(perScenario, Seq("symbol"), "net_pnl")
    val wfe = Reports.walkForwardEfficiency(perScenario, Seq("symbol"), "net_pnl")

    // ranking: objective desc with a stable tie-break (A16 semantics)
    val ranked = Reports.sweepRanking(
      perScenario.withColumn("sweep_id", lit("backtest"))
        .withColumn("run_id", col("scenarioId"))
        .withColumn("status", lit("ok")),
      objective = "net_pnl")
      .select(col("rank"), col("scenarioId"), col("symbol"), col("role"),
        col("net_pnl"), col("nTrades"), col("maxDrawdown"))

    // ---- artifacts ---------------------------------------------------
    Serve.writeRankingCsv(ranked.orderBy(col("rank")), s"$outDir/ranking")
    Serve.writeReportJson(analytics, outDir, "trade_analytics")
    Serve.writeReportJson(rollup, outDir, "portfolio_rollup")
    Serve.writeReportJson(robustness.orderBy(col("symbol")), outDir, "robustness")
    Serve.writeReportJson(wfe.orderBy(col("symbol")), outDir, "wfe")
    Serve.writeReportJson(avail.orderBy(col("symbol")), outDir, "availability")
    Serve.writeReportJson(quality.orderBy(col("symbol")), outDir, "quality")
    if (!errors.isEmpty)
      Serve.writeReportJson(errors.orderBy(col("scenario_id")), outDir, "errors")

    ranked.orderBy(col("rank"))
  }

  /** Sweep mode (reference warm path, #419): a strategy parameter grid
    * through the SAME phase chain, preparing the mount ONCE (phases 0-5 +
    * window tagging are parameter-independent) and executing the whole
    * grid in ONE kernel pass ([[graft.sweep.Sweep.runSweepFused]] — one
    * tick shuffle total, per-scenario in-memory replay per combination,
    * vs. the naive one-full-pipeline-per-point which re-reads and
    * re-shuffles the ticks G times).
    *
    * Grid keys: `rsi_period`, `bb_period` (each a list of values —
    * validated fail-fast per combination through the X6 worker surface,
    * phase 0). Warmup margin is the MAX over the grid, so every
    * combination sees at least its required lookback; the WarmupGate
    * still pins trading to each scenario's window start.
    *
    * Artifacts under `outDir`: `sweep_ranking` CSV (rank × combination,
    * objective = total net P&L, A16 tie-break semantics), `sweep_ledger`
    * JSON (per combination × scenario), plus availability/quality from
    * the mount. Returns the ranked per-combination frame. */
  def sweep(spark: SparkSession, ticks: DataFrame, outDir: String,
            grid: Map[String, Seq[String]], lots: Double = 1.0,
            cfg: Config = Config()): DataFrame = {
    val rsiW = Workers.registry("CORE/rsi")
    val bbW = Workers.registry("CORE/bollinger")

    // ---- Phase 0 over the grid + phase 3 max-lookback ----------------
    val combos = graft.sweep.Sweep.expandGrid(grid)
    require(combos.nonEmpty, "sweep: empty parameter grid")
    val warmupBars = combos.map { c =>
      val rsiCfg = rsiW.validate(Map("period" -> c.params("rsi_period")))
      val bbCfg = bbW.validate(Map("period" -> c.params("bb_period")))
      math.max(rsiW.warmupBars(rsiCfg), bbW.warmupBars(bbCfg))
    }.max
    val warmupMs = warmupBars * cfg.warmupBarMs

    // ---- Phases 1-6 once: the shared mount ---------------------------
    val mount = prepareMount(spark, ticks, cfg, warmupMs)

    // ---- Phase 6 fused: whole grid, one tick shuffle -----------------
    val ledger = graft.sweep.Sweep.runSweepFused("backtest_sweep",
      mount.simTicks, grid, params => {
        (simConfig(cfg), new WarmupGate(new TickReplay.RsiBollingerTrend(
          lots = lots,
          rsiPeriod = params("rsi_period").toInt,
          bbPeriod = params("bb_period").toInt)))
      }).cache()

    // ---- Phase 7: objectives + ranking -------------------------------
    val ranked = Reports.sweepRanking(
      graft.sweep.Sweep.ledgerObjectives(ledger), objective = "objective")
      .select(col("rank"), col("run_id"), col("params"), col("status"),
        col("objective").as("net_pnl"), col("n_trades"), col("worst_drawdown"))

    Serve.writeRankingCsv(
      ranked.withColumn("params", to_json(col("params")))
        .orderBy(col("rank")), s"$outDir/sweep_ranking")
    Serve.writeReportJson(ledger.orderBy(col("runId"), col("scenarioId")),
      outDir, "sweep_ledger")
    Serve.writeReportJson(mount.avail.orderBy(col("symbol")), outDir, "availability")
    Serve.writeReportJson(mount.quality.orderBy(col("symbol")), outDir, "quality")

    ranked.orderBy(col("rank"))
  }

  /** Adapter: the driver testdata's events table as a tick feed —
    * user_id → symbol, value → mid, epoch-ms event time. */
  def loadEventsAsTicks(spark: SparkSession, sfDir: String,
                        maxSymbols: Int): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("user_id") <= maxSymbols)
      .select(concat(lit("SYM"), format_string("%03d", col("user_id")))
        .as("symbol"), col("ts_ms"), col("value").as("mid"))

  /** `sbt "runMain graft.Backtest [sfDir] [outDir]"` — the one-command
    * backtest: events ticks → windows → kernel → ranked report.
    * `sbt "runMain graft.Backtest [sfDir] [outDir] sweep"` — sweep mode:
    * a default rsi×bollinger grid through the shared mount, one fused
    * kernel pass, ranked combinations. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("target/backtest_out")
    val spark = GraftSession.localFromEnv()
    val cfg = Config()
    if (args.lift(2).contains("sweep")) {
      val grid = Map("rsi_period" -> Seq("3", "5", "8"),
        "bb_period" -> Seq("6", "8", "12"))
      val ranked = sweep(spark,
        loadEventsAsTicks(spark, sfDir, cfg.maxSymbols), outDir, grid,
        lots = 1.0, cfg).collect()
      println(s"[backtest] sweep: ${ranked.length} ranked combinations:")
      ranked.foreach { r =>
        println(f"[backtest]   #${r.getAs[Int]("rank")}%3d ${r.getAs[String]("run_id")}%-10s " +
          f"${r.getAs[Map[String, String]]("params").toSeq.sorted.mkString(" ")}%-34s " +
          f"net=${r.getAs[Double]("net_pnl")}%10.2f trades=${r.getAs[Long]("n_trades")}%4d")
      }
      println(s"[backtest] artifacts in $outDir (sweep_ranking CSV + ledger JSON)")
    } else {
      val ranked = run(spark, loadEventsAsTicks(spark, sfDir, cfg.maxSymbols),
        outDir, new TickReplay.RsiBollingerTrend(lots = 1.0,
          rsiPeriod = cfg.rsiParams("period").toInt,
          bbPeriod = cfg.bbParams("period").toInt), cfg)
      val top = ranked.limit(10).collect()
      println(f"[backtest] ${top.length} top scenarios (of ${ranked.count()}):")
      top.foreach { r =>
        println(f"[backtest]   #${r.getAs[Int]("rank")}%3d ${r.getAs[String]("scenarioId")}%-28s " +
          f"${r.getAs[String]("role")}%-13s net=${r.getAs[Double]("net_pnl")}%10.2f " +
          f"trades=${r.getAs[Long]("nTrades")}%3d")
      }
      println(s"[backtest] artifacts in $outDir (ranking CSV + report JSONs)")
    }
    spark.stop()
  }
}
