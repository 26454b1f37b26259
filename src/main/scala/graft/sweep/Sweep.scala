package graft.sweep

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.sim._

/** Parameter-sweep orchestration (SURVEY §3.4, J8, A16–A18).
  *
  * - [[expandGrid]] — deterministic cartesian product of the parameter
  *   grid (`/root/reference/python/framework/optimization/grid_expander.py:16-28`):
  *   keys sorted, value order preserved, combination order reproducible.
  * - [[runSweep]] — load-once/run-many: the tick Dataset is persisted
  *   ONCE and every combination replays against the same cached
  *   partitions — the Spark form of the reference's mount-identity reuse
  *   (`batch_orchestrator.py:656-695`: data identity excludes strategy
  *   params, so the mount is shared across the whole sweep).
  *
  * The sweep ledger feeds [[graft.report.Reports.sweepRanking]] (A16) and
  * [[graft.report.Reports.ofatSensitivity]] (A17).
  */
object Sweep {

  /** One sweep combination. runId is stable: zero-padded position in the
    * deterministic expansion order. */
  case class Combo(runId: String, params: Map[String, String])

  def expandGrid(grid: Map[String, Seq[String]]): Seq[Combo] = {
    val keys = grid.keys.toSeq.sorted
    val combos = keys.foldLeft(Seq(Map.empty[String, String])) { (acc, k) =>
      for (m <- acc; v <- grid(k)) yield m + (k -> v)
    }
    combos.zipWithIndex.map { case (m, i) => Combo(f"run_$i%04d", m) }
  }

  /** Sweep ledger row: per (combo, scenario) outcome. `status` is exactly
    * "ok" | "error" (the reference ledger convention —
    * `optimization_analysis.py` matches on the literal); the failure
    * message lives in `error`, not in the status value. */
  case class SweepRow(
      sweepId: String, runId: String, status: String,
      params: Map[String, String], scenarioId: String,
      nTrades: Long, netPnl: Double, maxDrawdown: Double,
      error: String = "")

  /** Run every combination against the same persisted tick data.
    * `build` maps a combination to (config, strategy) — the reference's
    * dotted-path parameter override collapses to ordinary function
    * application here.
    *
    * Fully distributed: per-combo results map to stats-level `SweepRow`s
    * ON THE EXECUTORS (the nested trade ledgers never reach the driver)
    * and the per-combo Datasets union lazily into one ledger — the driver
    * holds only the plan. Callers wanting the trades keep them by writing
    * `SimKernel.runScenarios(...)` output to a table per combo instead. */
  def runSweep(sweepId: String, ticks: Dataset[SimTick],
               grid: Map[String, Seq[String]],
               build: Map[String, String] => (SimConfig, DecisionLogic)): DataFrame =
    runSweepWithHandle(sweepId, ticks, grid, build)._1

  /** [[runSweep]] plus a release hook: call it AFTER materializing the
    * ledger (the persisted tick partitions must stay alive while the plan
    * executes). Callers that skip it rely on LRU block eviction. */
  def runSweepWithHandle(sweepId: String, ticks: Dataset[SimTick],
               grid: Map[String, Seq[String]],
               build: Map[String, String] => (SimConfig, DecisionLogic))
      : (DataFrame, () => Unit) = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val cached = ticks.persist(StorageLevel.MEMORY_AND_DISK)
    val perCombo = expandGrid(grid).map { combo =>
      try {
        val (cfg, logic) = build(combo.params)
        val (runId, params, start) = (combo.runId, combo.params, cfg.startBalance)
        // Executor-side failures are captured PER SCENARIO inside the
        // kernel (runScenariosOutcomes): one throwing scenario emits an
        // error row instead of aborting the whole lazily-unioned ledger.
        SimKernel.runScenariosOutcomes(cached, cfg, logic).map { o =>
          o.result match {
            case Some(r) =>
              SweepRow(sweepId, runId, "ok", params,
                r.stats.scenarioId, r.stats.nTrades,
                r.stats.finalBalance - start, r.stats.maxDrawdown)
            case None =>
              SweepRow(sweepId, runId, "error", params,
                o.scenarioId, 0L, 0.0, 0.0, o.error)
          }
        }
      } catch {
        // build() failures surface at plan-construction time on the driver;
        // record the message so the ledger says WHY the combo failed.
        case e: Exception =>
          spark.createDataset(Seq(SweepRow(sweepId, combo.runId,
            "error", combo.params, "", 0L, 0.0, 0.0, e.getMessage)))
      }
    }
    // empty grid (any key with zero values) → empty ledger, not a crash
    val ledger =
      if (perCombo.isEmpty) spark.emptyDataset[SweepRow].toDF()
      else perCombo.reduce(_ union _).toDF()
    (ledger, () => { cached.unpersist(); () })
  }

  /** [[runSweep]] with the sweep-fused kernel: the whole grid executes in
    * ONE repartition+sort pass over the ticks
    * ([[SimKernel.runScenariosMultiplexed]] — each scenario's rows buffer
    * once and replay through every combination in memory), instead of one
    * full shuffle of the tick data per combination. Same ledger rows as
    * [[runSweep]], bit-identical per (runId, scenarioId) — the kernel
    * runs under the original scenarioId, so latency seeds and every
    * downstream stat match the per-combo path exactly (spec'd).
    *
    * Prefer this path for real sweeps; [[runSweep]] remains for callers
    * that need per-combo plans (e.g. streaming results out combo by
    * combo) and as the parity witness. */
  def runSweepFused(sweepId: String, ticks: Dataset[SimTick],
               grid: Map[String, Seq[String]],
               build: Map[String, String] => (SimConfig, DecisionLogic)): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val built = expandGrid(grid).map { c => (c, scala.util.Try(build(c.params))) }
    // build() failures surface at plan-construction time on the driver;
    // record the message so the ledger says WHY the combo failed.
    val bad = built.collect { case (c, scala.util.Failure(e)) =>
      SweepRow(sweepId, c.runId, "error", c.params, "", 0L, 0.0, 0.0, e.getMessage)
    }
    val good = built.collect { case (c, scala.util.Success((cfg, logic))) =>
      (c.runId, cfg, logic)
    }
    val meta = built.collect { case (c, scala.util.Success((cfg, _))) =>
      c.runId -> (c.params, cfg.startBalance)
    }.toMap
    val fused =
      if (good.isEmpty) spark.emptyDataset[SweepRow]
      else SimKernel.runScenariosMultiplexed(ticks, good).map { case (runId, o) =>
        val (params, start) = meta(runId)
        o.result match {
          case Some(r) =>
            SweepRow(sweepId, runId, "ok", params,
              r.stats.scenarioId, r.stats.nTrades,
              r.stats.finalBalance - start, r.stats.maxDrawdown)
          case None =>
            SweepRow(sweepId, runId, "error", params,
              o.scenarioId, 0L, 0.0, 0.0, o.error)
        }
      }
    if (bad.isEmpty) fused.toDF()
    else fused.toDF().union(spark.createDataset(bad).toDF())
  }

  /** Per-run objective roll-up of a sweep ledger (sum net P&L across the
    * run's scenarios) — the input shape for Reports.sweepRanking. */
  def ledgerObjectives(ledger: DataFrame): DataFrame =
    ledger.groupBy(col("sweepId").as("sweep_id"), col("runId").as("run_id"),
        col("status"), col("params"))
      .agg(round(sum(col("netPnl")), 6).as("objective"),
        sum(col("nTrades")).as("n_trades"),
        max(col("maxDrawdown")).as("worst_drawdown"))
}
