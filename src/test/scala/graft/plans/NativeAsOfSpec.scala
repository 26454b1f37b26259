package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.ops.AsOfJoin

class NativeAsOfSpec extends SparkSpecBase {
  import spark.implicits._

  test("native as-of: nulls before first signal, <= visibility, key isolation") {
    val ticks = Seq(
      ("X", 5L, 1), ("X", 10L, 2), ("X", 20L, 3), ("Y", 10L, 4))
      .toDF("sym", "ts", "tick_id")
    val signals = Seq(
      ("X", 10L, "s1"), ("X", 15L, "s2"), ("Z", 1L, "s3"))
      .toDF("sym", "ts", "sig")
    val out = NativeAsOf.backward(ticks, signals, Seq("sym"), "ts", "ts", Seq("sig"))
      .orderBy("tick_id").collect()
    assert(out(0).getAs[String]("sig") === null)
    assert(out(1).getAs[String]("sig") === "s1") // signal AT tick ts visible
    assert(out(2).getAs[String]("sig") === "s2")
    assert(out(3).getAs[String]("sig") === null) // Y never sees X/Z signals
    assert(out.length === 4)
  }

  test("native as-of equals the union+window idiom on multi-key data with ties") {
    val rnd = new scala.util.Random(17)
    val keys = Array("A", "B", "C")
    val ticks = (0 until 5000).map(i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(10000).toLong, i)).toDF("sym", "ts", "tick_id")
    // deliberately generate duplicate (key, ts) signals: the deterministic
    // highest-payload tie-break must match between the two paths
    val signals = (0 until 600).map { i =>
      (keys(rnd.nextInt(3)), (rnd.nextInt(1000) * 10).toLong, s"s$i", rnd.nextDouble())
    }.toDF("sym", "ts", "sig", "score")
    val idiom = AsOfJoin.backward(ticks, signals, Seq("sym"), "ts", "ts",
      Seq("sig", "score")).orderBy("tick_id").collect().map(_.toSeq).toSeq
    val native = NativeAsOf.backward(ticks, signals, Seq("sym"), "ts", "ts",
      Seq("sig", "score")).orderBy("tick_id").collect().map(_.toSeq).toSeq
    assert(native === idiom)
  }

  test("native as-of accepts TimestampType event time (micros-backed)") {
    val ticks = Seq(("X", "2026-01-01 10:00:05", 1), ("X", "2026-01-01 10:00:20", 2))
      .toDF("sym", "ts", "tick_id")
      .withColumn("ts", to_timestamp(col("ts")))
    val signals = Seq(("X", "2026-01-01 10:00:10", "s1"))
      .toDF("sym", "ts", "sig")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = NativeAsOf.backward(ticks, signals, Seq("sym"), "ts", "ts", Seq("sig"))
      .orderBy("tick_id").collect()
    assert(out(0).getAs[String]("sig") === null)
    assert(out(1).getAs[String]("sig") === "s1")
    // and a non-long-backed type is rejected loudly, not silently wrong
    val bad = ticks.withColumn("ts", col("ts").cast("date"))
    val e = intercept[IllegalArgumentException](
      NativeAsOf.backward(bad, signals, Seq("sym"), "ts", "ts", Seq("sig")))
    assert(e.getMessage.contains("long-backed"))
    // MIXED long/timestamp would compare micros against arbitrary-unit
    // longs — rejected loudly too, never a silent wrong match
    val longSide = ticks.withColumn("ts", col("ts").cast("long"))
    val e2 = intercept[IllegalArgumentException](
      NativeAsOf.backward(longSide, signals, Seq("sym"), "ts", "ts", Seq("sig")))
    assert(e2.getMessage.contains("must match"))
  }

  test("plan shape: merge node, one exchange+sort per side, no union/window") {
    val ticks = Seq(("X", 5L, 1)).toDF("sym", "ts", "tick_id")
    val signals = Seq(("X", 1L, "s")).toDF("sym", "ts", "sig")
    val df = NativeAsOf.backward(ticks, signals, Seq("sym"), "ts", "ts", Seq("sig"))
    df.collect() // force the final adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfMergeJoin"), s"merge node missing:\n$p")
    assert(!p.contains("Union"), "the idiom's union crept into the native plan")
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window"),
      "the idiom's window crept into the native plan")
  }
}
