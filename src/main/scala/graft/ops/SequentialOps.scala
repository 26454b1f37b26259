package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed per-key sequential scans.
  *
  * Recursive smoothing (EMA / Wilder) and the reference's other inherently
  * sequential passes (virtual-clock tick clipping, simulation state) cannot
  * be expressed as Spark SQL window aggregates (SURVEY §4.1). The scalable
  * shape is: one shuffle on the key, one sort within partitions, then a
  * single streaming pass per partition holding O(1) state per key —
  * `repartition(keys).sortWithinPartitions(keys, order).mapPartitions`.
  * Each key's series lives in exactly one partition; partitions stream
  * row-by-row, so memory is O(1) regardless of series length. At 100 TB
  * the parallelism is the number of distinct keys (symbols/users), same as
  * any per-symbol engine; skewed single-symbol history is the known limit
  * (mitigate by time-chunking with carried-in seed state).
  */
object SequentialOps {

  /** Append columns produced by a stateful left-to-right scan of each key
    * group in `orderCols` order.
    *
    * @param newCols  (name, type) of appended columns
    * @param init     state for the first row of a key group
    * @param step     (state, row) => (nextState, appended values for this row)
    */
  def perKeyScan[S](df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
                    newCols: Seq[(String, DataType)],
                    init: Row => S,
                    step: (S, Row) => (S, Seq[Any])): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++
      newCols.map { case (n, t) => StructField(n, t, nullable = true) })
    val keyIdx = keyCols.map(inSchema.fieldIndex)
    val sorted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    val result = sorted.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      var state: S = null.asInstanceOf[S]
      rows.map { row =>
        val k = keyIdx.map(row.get)
        if (curKey == null || k != curKey) { curKey = k; state = init(row) }
        val (next, appended) = step(state, row)
        state = next
        Row.fromSeq(row.toSeq ++ appended)
      }
    }(Encoders.row(outSchema))
    result
  }

  /** Exponential moving average, seeded with the first value of each group —
    * the reference's convention (`/root/reference/python/framework/utils/
    * trading_math/moving_average.py:18-20`: alpha = 2/(period+1), first
    * output = first input).
    */
  def ema(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
          valueCol: String, alpha: Double, outCol: String): DataFrame = {
    val vIdx = df.schema.fieldIndex(valueCol)
    perKeyScan[Option[Double]](df, keyCols, orderCols,
      Seq(outCol -> DoubleType),
      init = _ => None,
      step = (s, row) => {
        if (row.isNullAt(vIdx)) (s, Seq(s.orNull))
        else {
          val v = row.getDouble(vIdx)
          val e = s match {
            case None => v
            case Some(prev) => alpha * v + (1.0 - alpha) * prev
          }
          (Some(e), Seq(e))
        }
      })
  }

  /** Wilder smoothing (RSI/ATR classic): alpha = 1/period, seeded with the
    * simple mean of the first `period` values. */
  def wilder(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
             valueCol: String, period: Int, outCol: String): DataFrame = {
    val vIdx = df.schema.fieldIndex(valueCol)
    // state: (n seen so far, running sum while seeding, smoothed value once live)
    perKeyScan[(Int, Double, Double)](df, keyCols, orderCols,
      Seq(outCol -> DoubleType),
      init = _ => (0, 0.0, 0.0),
      step = (s, row) => {
        if (row.isNullAt(vIdx)) (s, Seq(null))
        else {
          val v = row.getDouble(vIdx)
          val (n, sum0, sm) = s
          if (n + 1 < period) ((n + 1, sum0 + v, sm), Seq(null))
          else if (n + 1 == period) {
            val seed = (sum0 + v) / period
            ((n + 1, 0.0, seed), Seq(seed))
          } else {
            val next = (sm * (period - 1) + v) / period
            ((n + 1, 0.0, next), Seq(next))
          }
        }
      })
  }
}
