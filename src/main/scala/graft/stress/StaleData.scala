package graft.stress

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stale-data stress (SURVEY ST8): carve planned outage windows out of a
  * refined SIGNAL series so as-of lookups inside a window resolve to the
  * last pre-window snapshot and the staleness chain fires.
  *
  * Mirrors `/root/reference/python/framework/stress_test/
  * stale_data_slicer.py:12-47`: SOURCE-level by design (every consumer of
  * the feed sees the same gap), [start, end) window semantics, and the
  * TICK source is deliberately never carved — a dead feed does not freeze
  * the market.
  *
  * The carve is a single conjunctive filter (windows are a handful of
  * literals), so it pushes into the parquet scan and costs nothing at
  * 100 TB.
  */
object StaleData {

  /** Remove all snapshots whose `collected_msc` falls inside any
    * [start, end) window. Empty window list → input unchanged. */
  def carveSignalSeries(signals: DataFrame,
                        windows: Seq[(Long, Long)],
                        tsCol: String = "collected_msc"): DataFrame = {
    windows.foreach { case (s, e) =>
      require(s <= e, s"stale window start $s after end $e")
    }
    if (windows.isEmpty) signals
    else {
      val inAnyWindow = windows
        .map { case (s, e) => col(tsCol) >= s && col(tsCol) < e }
        .reduce(_ || _)
      signals.filter(!inAnyWindow)
    }
  }
}
