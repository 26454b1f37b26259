package graft.windows

import graft.SparkSpecBase

class ScenarioWindowsSpec extends SparkSpecBase {
  import spark.implicits._

  private val H = 3600000L

  test("continuous regions split only at disallowed gaps") {
    // key A: events at hours 0,1,2, [10-hour gap], 12,13 -> 2 regions
    val ev = Seq(0L, 1L, 2L, 12L, 13L).map(h => ("A", h * H)) :+ (("B", 0L))
    val regions = ScenarioWindows.continuousRegions(
        ev.toDF("sym", "ts_ms"), Seq("sym"), "ts_ms", splitGapMs = 2 * H)
      .orderBy("sym", "region_start_ms").collect()
    assert(regions.length === 3)
    assert(regions(0).getAs[Long]("region_start_ms") === 0L)
    assert(regions(0).getAs[Long]("region_end_ms") === 2 * H)
    assert(regions(0).getAs[Long]("n_events") === 3L)
    assert(regions(1).getAs[Long]("region_start_ms") === 12 * H)
    assert(regions(2).getAs[String]("sym") === "B")
  }

  test("blocks: fixed-duration blocks within regions, short remainder dropped") {
    val regions = Seq(("A", 0L, 0L, 10 * H, 11L))
      .toDF("sym", "region_idx", "region_start_ms", "region_end_ms", "n_events")
    val blocks = ScenarioWindows.blocks(regions, Seq("sym"),
        blockMs = 4 * H, minBlockMs = 3 * H)
      .orderBy("block_start_ms").collect()
    // 0-4h, 4-8h, then 8-10h remainder (2h) < 3h minimum -> dropped
    assert(blocks.length === 2)
    assert(blocks(0).getAs[Long]("block_start_ms") === 0L)
    assert(blocks(0).getAs[Long]("block_end_ms") === 4 * H)
    assert(blocks(1).getAs[Long]("block_end_ms") === 8 * H)
  }

  test("role assignment: trailing OOS fraction, at least one of each for n>=2") {
    val ws = (1 to 5).map(i => ("A", i.toLong)) :+ (("B", 1L))
    val out = ScenarioWindows.assignRolesTimeOrdered(
        ws.toDF("sym", "start"), Seq("sym"), "start", oosSplit = 0.4)
      .orderBy("sym", "start").collect()
    // A: n=5, n_oos=round(2.0)=2 -> IS,IS,IS,OOS,OOS ; B: single -> IS
    assert(out.map(_.getAs[String]("role")).toSeq ===
      Seq("IN_SAMPLE", "IN_SAMPLE", "IN_SAMPLE", "OUT_OF_SAMPLE", "OUT_OF_SAMPLE",
        "IN_SAMPLE"))
  }
}
