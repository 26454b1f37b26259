package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval joins and interval algebra (SURVEY §2.3 J3, §2.7 U3).
  *
  * The reference computes window↔data containment and requirement-overlap
  * merges with per-row scans (`window_materializer.py`,
  * `continuous_region_extractor.py`). A naive Spark translation is a
  * non-equi join — Catalyst can only run that as BroadcastNestedLoopJoin
  * (fine when one side is small, fatal when both are big). The scalable
  * shape is the BUCKETED range join used by every distributed engine:
  * quantize the time axis into fixed buckets, explode each interval to
  * the buckets it covers, equi-join on (keys…, bucket) — which shuffles
  * and parallelizes like any hash join — and keep a pair only in the
  * FIRST bucket both intervals share, so no dedup pass is needed.
  * Bucket width trades explode factor against join fan-in: pick ~the
  * median interval length (a 100 TB tick table with day-scale windows
  * wants hour-to-day buckets).
  */
object RangeJoin {

  private def bucketsOf(start: Column, end: Column, width: Long): Column =
    sequence(floor(start / width).cast("long"), floor(end / width).cast("long"))

  /** Interval-overlap join: all (left, right) pairs with
    * `l.start <= r.end && r.start <= l.end` (closed intervals) sharing
    * `keys`. Columns from both sides survive; right's start/end are
    * aliased with `rightSuffix` when names collide.
    *
    * @param bucketWidth quantization width in the units of start/end
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collide = right.columns.toSet.intersect(left.columns.toSet) -- keys
    val r2 = collide.foldLeft(right)((df, c) => df.withColumnRenamed(c, c + "_r"))
    val rs = if (collide.contains(rStart)) rStart + "_r" else rStart
    val re = if (collide.contains(rEnd)) rEnd + "_r" else rEnd
    val lB = left.withColumn("__bucket",
      explode(bucketsOf(col(lStart), col(lEnd), bucketWidth)))
    val rB = r2.withColumn("__bucket",
      explode(bucketsOf(col(rs), col(re), bucketWidth)))
    lB.join(rB, keys :+ "__bucket")
      .filter(col(lStart) <= col(re) && col(rs) <= col(lEnd))
      // each overlapping pair shares >=1 bucket; count it exactly once,
      // in the first bucket covered by both intervals
      .filter(col("__bucket") ===
        floor(greatest(col(lStart), col(rs)) / bucketWidth).cast("long"))
      .drop("__bucket")
  }

  /** Point-in-interval join: rows of `points` matched to every interval
    * of `intervals` containing them (closed): interval scenario↔tick
    * containment (J7/window materialization). A point covers exactly one
    * bucket, so there is no dedup concern at all. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pt: String,
                      iStart: String, iEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pB = points.withColumn("__bucket",
      floor(col(pt) / bucketWidth).cast("long"))
    val iB = intervals.withColumn("__bucket",
      explode(bucketsOf(col(iStart), col(iEnd), bucketWidth)))
    pB.join(iB, keys :+ "__bucket")
      .filter(col(pt).between(col(iStart), col(iEnd)))
      .drop("__bucket")
  }

  /** U3: merge overlapping-or-touching intervals per key (requirement
    * dedup): classic islands pass — one shuffle on keys, one sort.
    * Intervals touching within `slackMs` merge too (the reference merges
    * requirements whose ranges abut). Returns (keys…, start, end,
    * n_merged). */
  def mergeIntervals(df: DataFrame, keys: Seq[String],
                     start: String, end: String,
                     slackMs: Long = 0L): DataFrame = {
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(start), col(end))
      .rowsBetween(Window.unboundedPreceding, -1)
    val island = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(start), col(end))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      // new island when this interval starts beyond every prior end
      .withColumn("__new", when(
        col(start) > max(col(end)).over(ord) + slackMs, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(island))
      .groupBy((keys.map(col) :+ col("__island")): _*)
      .agg(min(col(start)).as(start), max(col(end)).as(end),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
