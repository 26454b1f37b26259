package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ops.OrderStats

/** Dev-only same-phase A/B cell for the q10 OrderStats routing: times the
  * construction (the eager probe + selection) and the full q10-shaped
  * action for (a) the histogram branch (default cap) and (b) the sort
  * branch (cap 0), interleaved over SPARK_GRAFT_RUNS rounds so host
  * phase hits both cells equally. Prints per-run seconds per cell.
  */
object OrderStatsPhase {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "5").toInt
    val spark = GraftSession.localFromEnv()
    val li = Tables.lineitem(spark, sfDir)
    li.count() // warm the reader

    val specs = Seq(
      OrderStats.PctSpec("l_quantity", 0.5, "median_raw"),
      OrderStats.PctSpec("l_extendedprice", 0.95, "p95_raw"))

    def cell(tag: String, cap: Long): Double = {
      val t0 = System.nanoTime()
      val pct = OrderStats.groupedPercentiles(li, "l_returnflag", specs, cap)
      val t1 = System.nanoTime()
      pct.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[osphase] $tag: construct ${(t1 - t0) / 1e9}%.3f action ${(t2 - t1) / 1e9}%.3f")
      (t2 - t0) / 1e9
    }

    (1 to runs).foreach { r =>
      val h = cell(s"hist  r$r", OrderStats.HistogramMaxCells)
      // r18: a cap between the qty spec's cell count (~150) and the
      // price spec's routes qty→histogram and price→sort — the per-spec
      // SPLIT. The cap-0 cell (both specs forced onto the sort branch,
      // 2× melt) is exactly the pre-r18 global routing in the regime
      // where any one spec exceeds the cap, so split-vs-sort is the
      // change's same-phase A/B at any SF.
      val p = cell(s"split r$r", 1000L)
      val s = cell(s"sort  r$r", 0L)
      println(f"[osphase] round $r: hist $h%.3f split $p%.3f sort $s%.3f")
    }
    spark.stop()
  }
}
