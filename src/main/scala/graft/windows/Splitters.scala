package graft.windows

import org.apache.spark.sql.DataFrame
import graft.ops.GlobalRank
import org.apache.spark.sql.functions._

/** Scenario splitters beyond chronological blocks (SURVEY §7 step 6):
  * walk-forward folds and volatility-targeted windows.
  *
  * Reference: `/root/reference/python/scenario/generator/splitters/
  * walk_forward_split.py` (rolling train/test folds over the data span)
  * and `volatility_split.py` (windows carved from contiguous runs of
  * target volatility regimes over hourly activity periods).
  *
  * Both are pure DataFrame plans: one aggregation for the span (or the
  * hourly profile) followed by a generator expression — no driver-side
  * loops, so a million keys split in one pass.
  */
object Splitters {

  /** Walk-forward folds per key: fold i trains on
    * [t0 + i·step, +train) and tests on the adjacent [trainEnd, +test),
    * while the test window still fits inside the key's data span.
    * Emits two window rows per fold (IN_SAMPLE train, OUT_OF_SAMPLE test)
    * — the role convention of `role_assignment.py`.
    *
    * @return (keys…, fold, role, start_ms, end_ms)
    */
  def walkForward(df: DataFrame, keys: Seq[String], tsMs: String,
                  trainMs: Long, testMs: Long, stepMs: Long): DataFrame = {
    val span = df.groupBy(keys.map(col): _*)
      .agg(min(col(tsMs)).as("__t0"), max(col(tsMs)).as("__t1"))
    val nFolds = (floor((col("__t1") - col("__t0") - lit(trainMs + testMs))
      / lit(stepMs.toDouble)) + 1).cast("long")
    val folds = span
      .withColumn("__n", greatest(nFolds, lit(0L)))
      .filter(col("__n") >= 1)
      .withColumn("fold", explode(sequence(lit(0L), col("__n") - 1)))
      .withColumn("__fs", col("__t0") + col("fold") * stepMs)
    folds.select(
      (keys.map(col) :+ col("fold") :+ lit("IN_SAMPLE").as("role") :+
        col("__fs").as("start_ms") :+
        (col("__fs") + trainMs).as("end_ms")): _*)
      .unionByName(folds.select(
        (keys.map(col) :+ col("fold") :+ lit("OUT_OF_SAMPLE").as("role") :+
          (col("__fs") + trainMs).as("start_ms") :+
          (col("__fs") + trainMs + testMs).as("end_ms")): _*))
  }

  /** Volatility-targeted windows: bucket the series into fixed periods,
    * classify each period's range against the global mean (the regime
    * scheme of `volatility_profile_analyzer.py:578-624`), keep periods in
    * `targetRegimes`, and merge CONTIGUOUS kept periods into windows.
    *
    * @param periodMs   bucket width (e.g. 1 hour)
    * @return (keys…, window_start_ms, window_end_ms, n_periods) — end is
    *         exclusive (last period start + periodMs)
    */
  def volatilityWindows(df: DataFrame, keys: Seq[String], tsMs: String,
                        value: String, periodMs: Long,
                        thresholds: Seq[Double] = Seq(0.3, 0.8, 1.2, 2.0),
                        regimeNames: Seq[String] =
                          Seq("very_low", "low", "medium", "high", "very_high"),
                        targetRegimes: Seq[String] = Seq("high", "very_high"))
      : DataFrame = {
    require(regimeNames.length == thresholds.length + 1)
    val periods = df
      .groupBy((keys.map(col) :+
        (col(tsMs) - col(tsMs) % periodMs).as("bucket_ms")): _*)
      .agg((max(col(value)) - min(col(value))).as("__range"))

    // Per-key mean via aggregate + equi-join, NOT avg().over(partitionBy
    // (keys)): a caller with a constant key (q55 buckets one synthetic
    // "ALL" symbol) would have the foldable partition spec optimized
    // away and the whole series moved to ONE task — the unpartitioned-
    // window trap. The aggregate side is one row per key; AQE broadcasts
    // the join.
    val avgs = periods.groupBy(keys.map(col): _*)
      .agg(avg(col("__range")).as("__avg"))
    val ratio = col("__range") / col("__avg")
    val regime = thresholds.zip(regimeNames.init)
      .foldRight(lit(regimeNames.last)) { case ((t, name), rest) =>
        when(ratio < t, name).otherwise(rest)
      }
    val kept = periods.join(avgs, keys)
      .withColumn("__regime", regime)
      .filter(col("__regime").isin(targetRegimes: _*))

    // islands-and-gaps: contiguous kept buckets share (bucket#/period −
    // per-key rank). The rank comes from the two-pass GlobalRank over
    // (keys…, bucket_ms) — a range-partitioned distributed sort, so it
    // survives ANY key distribution (real symbols, one hot key, or a
    // constant) with no single-task window; per-key numbering is then
    // rank − min(rank per key) + 1, with the min-rank side one row per
    // key (broadcast join).
    val order = (keys.map(col) :+ col("bucket_ms")).map(_.asc)
    val ranked = GlobalRank.withRowNumber(kept, order, "__rank")
    val offsets = ranked.groupBy(keys.map(col): _*)
      .agg(min(col("__rank")).as("__rank0"))
    ranked.join(offsets, keys)
      .withColumn("__island",
        (col("bucket_ms") / periodMs).cast("long")
          - (col("__rank") - col("__rank0") + 1L))
      .groupBy((keys.map(col) :+ col("__island")): _*)
      .agg(min(col("bucket_ms")).as("window_start_ms"),
        (max(col("bucket_ms")) + periodMs).as("window_end_ms"),
        count(lit(1)).as("n_periods"))
      .drop("__island")
  }
}
