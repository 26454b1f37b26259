package graft

import org.apache.spark.sql.functions._

/** Pins the engine's adaptive shuffle-partitioning contract
  * ([[GraftSession]]): shuffles plan at 8× cores and AQE coalesces by
  * MEASURED bytes — never below the core count while there are ≥64 KB
  * per core. This is the engine-default form of the round-12 same-phase
  * knob measurements (q91 sf100: 3.9×/2.1× wall, 8.4× GC, half the peak
  * task memory at 256 vs 32 pinned partitions): partition count grows
  * with data, as a cluster's would, instead of being pinned at launch.
  */
class GraftSessionSpec extends SparkSpecBase {

  test("adaptive coalescing is the engine default (no env knob in specs)") {
    assert(spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.enabled") === "true")
    // spec session is local[4] -> shuffles plan at 8x4 = 32
    assert(spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum") === "32")
    assert(spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize") === "64KB")
  }

  test("a multi-MB compute-dense shuffle keeps every core working") {
    // ~16 MB of md5 hex (incompressible, the compute-dense shape the
    // old coalescing-off comment worried about): target size =
    // min(64MB, max(total/4, 64KB)) ≈ 4 MB -> all 4 cores keep a
    // partition; coalescing must not serialize this.
    val big = spark.range(100000L).select(
      (col("id") % 50000L).as("k"),
      concat(md5(col("id").cast("string")),
        md5((col("id") + 1L).cast("string")),
        md5((col("id") + 2L).cast("string")),
        md5((col("id") + 3L).cast("string")),
        md5((col("id") + 4L).cast("string"))).as("payload"))
    val agg = big.groupBy(col("k")).agg(count(lit(1)).as("n"),
      max(col("payload")).as("p"))
    val parts = agg.rdd.getNumPartitions
    assert(parts >= spark.sparkContext.defaultParallelism,
      s"$parts partitions — adaptive coalescing serialized a ${16}MB shuffle")
    assert(parts < 32, s"$parts partitions — coalescing did not engage")
  }

  test("a tiny shuffle coalesces far below the planned 8x-cores count") {
    val out = spark.range(100L).groupBy((col("id") % 10L).as("k")).count()
    val parts = out.rdd.getNumPartitions
    assert(parts < spark.sparkContext.defaultParallelism,
      s"$parts partitions for ~KB of data — coalescing off?")
  }
}
