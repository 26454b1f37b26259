package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scalable total-order ranking (SURVEY A16/W15 at scale).
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY is semantically
  * a total order, and Spark executes it by moving EVERY row to one
  * partition — the classic single-task bottleneck (the engine even logs
  * "Moving all data to a single partition"). The scalable idiom is the
  * two-pass rank:
  *
  *   1. `repartitionByRange` on the sort key (one range-partitioned
  *      shuffle; partition p holds keys strictly before partition p+1),
  *      then `sortWithinPartitions` — a full distributed sort, no
  *      single-point merge;
  *   2. `zipWithIndex` — one lightweight count job over the partition
  *      SIZES (a per-partition count, not the data), then each partition
  *      stamps `offset + local index` in a single pass.
  *
  * Rank values equal the unpartitioned `row_number` exactly when the
  * sort key is a total order (make it one — add a unique tiebreak
  * column, as any deterministic ranking needs anyway).
  */
object GlobalRank {

  /** Append a 1-based `rankCol` following `order` (which must be a total
    * order for deterministic results). Output keeps the input columns in
    * order, plus `rankCol: long` last; rows come back globally sorted. */
  def withRowNumber(df: DataFrame, order: Seq[Column],
                    rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val out = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(out, sorted.schema.add(rankCol, LongType, nullable = false))
  }

  /** Append `offsetCol` = the EXCLUSIVE running sum of `valueCol` (a long
    * column) in `order` — `sum(v) OVER (ORDER BY …) − v` without the
    * single-partition window. Same two-pass shape as [[withRowNumber]]:
    * a range-partitioned distributed sort, then one lightweight job that
    * reduces each partition to its value SUM (driver state =
    * O(partitions), exactly what `zipWithIndex`'s count pass holds), a
    * broadcast of the cumulative partition offsets, and a single stamping
    * pass. The second job reuses the first's shuffle files (same RDD
    * lineage — the map stage is skipped). `order` must be a total order. */
  def withRunningOffset(df: DataFrame, order: Seq[Column], valueCol: String,
                        offsetCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val partSums = rdd.mapPartitionsWithIndex { (p, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator.single((p, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(p) = sum of parts < p
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (p, it) =>
      var acc = bc.value(p)
      it.map { r =>
        val stamped = Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(vIdx)
        stamped
      }
    }
    spark.createDataFrame(out, sorted.schema.add(offsetCol, LongType, nullable = false))
  }
}
