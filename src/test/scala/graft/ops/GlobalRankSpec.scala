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

  test("ranks across many partitions — never a single-task sort") {
    val order = Seq(col("objective").desc, col("id").asc)
    val ranked = GlobalRank.withRowNumber(scores.repartition(8), order, "rank")
    assert(ranked.rdd.getNumPartitions > 1,
      "two-pass rank collapsed to one partition")
    // and the executed plan contains no Window at all
    assert(!ranked.queryExecution.executedPlan.toString.contains("Window"))
  }
}
