package graft.ops

import graft.SparkSpecBase

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("backward as-of: most recent right row at/before left ts, nulls before first") {
    val ticks = Seq(
      ("X", 5L, 1), ("X", 10L, 2), ("X", 20L, 3), ("Y", 10L, 4))
      .toDF("sym", "ts", "tick_id")
    val signals = Seq(
      ("X", 10L, "s1"), ("X", 15L, "s2"), ("Z", 1L, "s3"))
      .toDF("sym", "ts", "sig")
    val out = AsOfJoin.backward(ticks, signals, Seq("sym"), "ts", "ts", Seq("sig"))
      .orderBy("tick_id").collect()
    assert(out(0).getAs[String]("sig") === null) // t=5 before any signal
    assert(out(1).getAs[String]("sig") === "s1") // t=10: signal at 10 visible (<=)
    assert(out(2).getAs[String]("sig") === "s2") // t=20: latest is 15
    assert(out(3).getAs[String]("sig") === null) // key Y has no signals
    assert(out.length === 4)                     // left rows preserved exactly
  }

  test("as-of carries multiple payload columns and keeps left schema") {
    val ticks = Seq(("X", 100L)).toDF("sym", "ts")
    val signals = Seq(("X", 50L, 0.7, 42L)).toDF("sym", "ts", "score", "sid")
    val out = AsOfJoin.backward(ticks, signals, Seq("sym"), "ts", "ts",
      Seq("score", "sid")).collect()
    assert(out.head.getAs[Double]("score") === 0.7)
    assert(out.head.getAs[Long]("sid") === 42L)
    assert(out.head.getAs[Long]("ts") === 100L)
  }

  test("backwardSalted equals backward on a skewed key with sparse signal buckets") {
    // hot key: 2000 ticks; signals only land in a few early buckets, so
    // most left buckets repair from the cross-bucket carry path
    val rnd = new scala.util.Random(11)
    val ticks = ((0 until 2000).map(i => ("HOT", 1000L + i * 7L, i)) ++
      Seq(("COLD", 1500L, 9001), ("COLD", 90L, 9002)))
      .toDF("sym", "ts", "tick_id")
    val signals = ((0 until 12).map(i => ("HOT", 900L + i * 13L, s"s$i")) ++
      Seq(("HOT", 9000L, "late"), ("COLD", 100L, "c0")))
      .toDF("sym", "ts", "sig")
    val plain = AsOfJoin.backward(ticks, signals, Seq("sym"), "ts", "ts", Seq("sig"))
      .orderBy("tick_id").collect().map(_.toSeq)
    val salted = AsOfJoin.backwardSalted(ticks, signals, Seq("sym"), "ts", "ts",
        Seq("sig"), bucketMs = 500L)
      .orderBy("tick_id").collect().map(_.toSeq)
    assert(salted.toSeq === plain.toSeq)
  }

  test("one-symbol stream: plain as-of single-tasks, salted spreads the key") {
    import org.apache.spark.sql.functions._
    // The reference's signal streams are per-symbol — ONE key carries the
    // whole join (signal_data_provider.py). Plain backward puts that key
    // in one window task by construction; salted must not.
    val n = 100000L
    val ticks = spark.range(n).select(lit("EURUSD").as("sym"),
      (col("id") * 7L).as("ts"), col("id").as("tick_id"))
    val signals = spark.range(500).select(lit("EURUSD").as("sym"),
      (col("id") * 1400L).as("ts"), col("id").as("sig"))
    // non-empty partitions of the FULL result (.rdd materializes every
    // column, so the window can't be pruned away) = the as-of stage's
    // working tasks (adaptive coalescing merges only same-byte-class
    // partitions, so the salted spread stays multi-task while the plain
    // form's single hot key is one partition at ANY partition count)
    def nonEmptyTasks(df: org.apache.spark.sql.DataFrame): Int =
      df.rdd.mapPartitionsWithIndex((i, it) =>
        if (it.hasNext) Iterator(i) else Iterator.empty).collect().length
    val plain = AsOfJoin.backward(ticks, signals, Seq("sym"), "ts", "ts", Seq("sig"))
    val salted = AsOfJoin.backwardSalted(ticks, signals, Seq("sym"), "ts", "ts",
      Seq("sig"), bucketMs = 7L * n / 32) // ~32 buckets across the stream
    assert(nonEmptyTasks(plain) === 1,
      "plain backward no longer single-tasks — update this documentation of the trade-off")
    assert(nonEmptyTasks(salted) > 1,
      "salted as-of collapsed the hot key back into one task")
    // and both still agree row-for-row
    val p = plain.orderBy("tick_id").collect().map(_.toSeq).toSeq
    val s = salted.orderBy("tick_id").collect().map(_.toSeq).toSeq
    assert(s === p)
  }
}
