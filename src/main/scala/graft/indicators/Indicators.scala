package graft.indicators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import graft.ops.SequentialOps

/** Technical-indicator column transforms (SURVEY §2.5 W1, W6–W10).
  *
  * Every indicator is a `DataFrame => DataFrame` that appends columns —
  * the Spark-native analogue of the reference's worker plugins
  * (`/root/reference/python/framework/workers/`). All bounded-frame math is
  * expressed with built-in window functions (whole-stage codegen'd); only
  * the recursive EMA family drops to the SequentialOps kernel.
  *
  * Scale: every indicator is a window over (keys, orderBy) — one shuffle
  * per distinct partitioning; chained indicators over the same keys reuse
  * the same Exchange+Sort.
  */
object Indicators {

  private def w(keys: Seq[String], order: Seq[String]): WindowSpec =
    Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)

  /** True range: max(high-low, |high-prevClose|, |low-prevClose|) —
    * `/root/reference/python/data_management/discoveries/volatility_profile_analyzer.py:420-443`.
    * First row of each group (no prev close) falls back to high-low. */
  def trueRange(df: DataFrame, keys: Seq[String], order: Seq[String],
                high: String, low: String, close: String, out: String = "tr"): DataFrame = {
    val prevClose = lag(col(close), 1).over(w(keys, order))
    df.withColumn(out,
      when(prevClose.isNull, col(high) - col(low))
        .otherwise(greatest(col(high) - col(low),
          abs(col(high) - prevClose), abs(col(low) - prevClose))))
  }

  /** ATR = EMA(TR, span=period), alpha=2/(period+1), seeded with first TR —
    * matches the reference's `ewm(span=period, adjust=False)`. */
  def atr(df: DataFrame, keys: Seq[String], order: Seq[String],
          high: String, low: String, close: String, period: Int,
          out: String = "atr"): DataFrame = {
    val withTr = trueRange(df, keys, order, high, low, close, "__tr")
    SequentialOps.ema(withTr, keys, order, "__tr", 2.0 / (period + 1), out)
      .drop("__tr")
  }

  /** RSI, simple-mean variant over the trailing `period` deltas —
    * `/root/reference/python/framework/workers/core/rsi_worker.py:96-139`.
    * RSI = 100 - 100/(1+RS), RS = meanGain/meanLoss; all-gain window → 100.
    * Emitted only once `period` deltas exist (earlier rows → null). */
  def rsi(df: DataFrame, keys: Seq[String], order: Seq[String],
          close: String, period: Int, out: String = "rsi"): DataFrame = {
    val ws = w(keys, order)
    val frame = ws.rowsBetween(-(period - 1), 0)
    val d = col(close) - lag(col(close), 1).over(ws)
    df.withColumn("__d", d)
      .withColumn("__nd", count("__d").over(frame))
      .withColumn("__gain", avg(when(col("__d") > 0, col("__d")).otherwise(0.0)).over(frame))
      .withColumn("__loss", avg(when(col("__d") < 0, -col("__d")).otherwise(0.0)).over(frame))
      .withColumn(out,
        when(col("__nd") < period, lit(null))
          .when(col("__loss") === 0.0, lit(100.0))
          .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + col("__gain") / col("__loss"))))
      .drop("__d", "__nd", "__gain", "__loss")
  }

  /** Bollinger bands over a trailing window —
    * `/root/reference/python/framework/workers/core/bollinger_worker.py:165+`:
    * mid = SMA(close, period), band = mid ± k·stddev_samp, %B raw
    * (unclamped) position = (close - lower) / (upper - lower). */
  def bollinger(df: DataFrame, keys: Seq[String], order: Seq[String],
                close: String, period: Int, k: Double,
                prefix: String = "bb"): DataFrame = {
    val frame = w(keys, order).rowsBetween(-(period - 1), 0)
    val nCol = count(col(close)).over(frame)
    df.withColumn("__n", nCol)
      .withColumn(s"${prefix}_mid",
        when(col("__n") >= period, avg(col(close)).over(frame)))
      .withColumn("__sd",
        when(col("__n") >= period, stddev_samp(col(close)).over(frame)))
      .withColumn(s"${prefix}_upper", col(s"${prefix}_mid") + lit(k) * col("__sd"))
      .withColumn(s"${prefix}_lower", col(s"${prefix}_mid") - lit(k) * col("__sd"))
      .withColumn(s"${prefix}_pct_b",
        when(col("__sd") > 0,
          (col(close) - col(s"${prefix}_lower")) /
            (col(s"${prefix}_upper") - col(s"${prefix}_lower"))))
      .drop("__n", "__sd")
  }

  /** OBV: running sum of signed volume; sign from close vs previous close —
    * `/root/reference/python/framework/workers/core/obv_worker.py:131-243`. */
  def obv(df: DataFrame, keys: Seq[String], order: Seq[String],
          close: String, volume: String, out: String = "obv"): DataFrame = {
    val ws = w(keys, order)
    val prev = lag(col(close), 1).over(ws)
    val signed = when(prev.isNull, 0.0)
      .when(col(close) > prev, col(volume))
      .when(col(close) < prev, -col(volume))
      .otherwise(0.0)
    df.withColumn("__sv", signed)
      .withColumn(out, sum(col("__sv")).over(ws.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__sv")
  }

  /** MACD: fast/slow EMA of close, signal EMA of the MACD line, histogram —
    * `/root/reference/python/framework/workers/core/macd_worker.py:189-275`.
    *
    * r17: ONE fused per-key scan instead of three chained
    * [[SequentialOps.ema]] kernels. A MapPartitions kernel's output
    * partitioning is opaque to Catalyst, so each chained EMA re-paid the
    * full repartition(keys) + sort + row (de)serialization — three
    * exchanges and three object boundaries for one logical pass (the q46
    * plan: 4 Exchange / 3 MapPartitions → 2 / 1). All three recursions
    * are row-local given the previous state, so a single scan carrying
    * (fast, slow, signal) state emits identical values in the identical
    * FP operation order: per row, fast/slow update exactly as the
    * standalone EMA (null close carries state), the line is fast − slow
    * whenever both are seeded (null-close rows emit the CARRIED line,
    * the chained form's documented behavior), and the signal EMA
    * consumes every non-null line. */
  def macd(df: DataFrame, keys: Seq[String], order: Seq[String], close: String,
           fast: Int = 12, slow: Int = 26, signal: Int = 9,
           prefix: String = "macd"): DataFrame = {
    val aF = 2.0 / (fast + 1)
    val aS = 2.0 / (slow + 1)
    val aG = 2.0 / (signal + 1)
    val vIdx = df.schema.fieldIndex(close)
    SequentialOps.perKeyScan[(Option[Double], Option[Double], Option[Double])](
      df, keys, order,
      Seq(s"${prefix}_line" -> org.apache.spark.sql.types.DoubleType,
        s"${prefix}_signal" -> org.apache.spark.sql.types.DoubleType,
        s"${prefix}_hist" -> org.apache.spark.sql.types.DoubleType),
      init = _ => (None, None, None),
      step = (st, row) => {
        val (f0, s0, g0) = st
        val (f1, s1) =
          if (row.isNullAt(vIdx)) (f0, s0)
          else {
            val v = row.getDouble(vIdx)
            (Some(f0 match { case None => v
               case Some(p) => aF * v + (1.0 - aF) * p }),
              Some(s0 match { case None => v
                case Some(p) => aS * v + (1.0 - aS) * p }))
          }
        (f1, s1) match {
          case (Some(fv), Some(sv)) =>
            val line = fv - sv
            val sig = g0 match { case None => line
              case Some(p) => aG * line + (1.0 - aG) * p }
            ((f1, s1, Some(sig)), Seq(line, sig, line - sig))
          case _ =>
            ((f1, s1, g0), Seq(null, null, null))
        }
      })
  }

  /** Moving-average trend slope: (MA - lag(MA)) normalized by window stddev —
    * `/root/reference/python/framework/workers/core/ma_trend_worker.py:145-196`. */
  def maTrend(df: DataFrame, keys: Seq[String], order: Seq[String],
              close: String, period: Int, prefix: String = "ma"): DataFrame = {
    val ws = w(keys, order)
    val frame = ws.rowsBetween(-(period - 1), 0)
    df.withColumn(s"${prefix}_avg", avg(col(close)).over(frame))
      .withColumn("__sd", stddev_samp(col(close)).over(frame))
      .withColumn(s"${prefix}_slope",
        when(col("__sd") > 0,
          (col(s"${prefix}_avg") - lag(col(s"${prefix}_avg"), 1).over(ws)) / col("__sd")))
      .drop("__sd")
  }
}
