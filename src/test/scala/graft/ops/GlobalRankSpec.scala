package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class GlobalRankSpec extends SparkSpecBase {
  import spark.implicits._

  private def scores = (1 to 997).map(i =>
    (i.toLong, (i * 7919 % 101).toDouble)) // many ties -> tiebreak matters
    .toDF("id", "objective")

  test("matches the unpartitioned row_number exactly (ties broken by id)") {
    val order = Seq(col("objective").desc, col("id").asc)
    val got = GlobalRank.withRowNumber(scores, order, "rank")
      .select(col("id"), col("rank")).as[(Long, Long)].collect().toMap
    val want = scores
      .withColumn("rank", row_number().over(
        Window.orderBy(col("objective").desc, col("id").asc)))
      .select(col("id"), col("rank").cast("long")).as[(Long, Long)]
      .collect().toMap
    assert(got === want)
  }

  /** The multi-partition assertions pin AQE coalescing OFF for their
    * plan read: under the engine's adaptive default, this spec's
    * sub-64KB fixtures legitimately coalesce to ONE partition (tiny
    * data, one task IS the right plan). The assertion is about the
    * OPERATOR — a range-partitioned sort that never funnels rows
    * through a single-task Window — which only shows at a partition
    * count the bytes here can't justify. */
  private def withCoalescingOff[A](body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, old)
  }

  test("ranks across many partitions — never a single-task sort") {
    withCoalescingOff {
      val order = Seq(col("objective").desc, col("id").asc)
      val ranked = GlobalRank.withRowNumber(scores.repartition(8), order, "rank")
      assert(ranked.rdd.getNumPartitions > 1,
        "two-pass rank collapsed to one partition")
      // and the executed plan contains no Window at all
      assert(!ranked.queryExecution.executedPlan.toString.contains("Window"))
    }
  }

  test("withRunningOffset equals the unpartitioned exclusive cumsum") {
    val vals = (1 to 500).map(i => (i.toLong, (i * 31 % 17 + 1).toLong))
      .toDF("id", "n")
    val got = GlobalRank.withRunningOffset(
        vals.repartition(9), Seq(col("id")), "n", "start")
      .select(col("id"), col("start")).as[(Long, Long)].collect().toMap
    val want = vals
      .withColumn("start",
        coalesce(sum(col("n")).over(
          Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("id"), col("start")).as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("withRunningOffset runs multi-partition with no Window node") {
    withCoalescingOff {
      val vals = (1 to 300).map(i => (i.toLong, 3L)).toDF("id", "n")
      val out = GlobalRank.withRunningOffset(
        vals.repartition(7), Seq(col("id")), "n", "start")
      assert(out.rdd.getNumPartitions > 1)
      assert(!out.queryExecution.executedPlan.toString.contains("Window"))
    }
  }
}
