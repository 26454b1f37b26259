package graft.ops

import graft.SparkSpecBase

class SequentialOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("ema matches hand-computed recursion, seeded with first value, per key") {
    val df = Seq(
      ("A", 1L, 10.0), ("A", 2L, 20.0), ("A", 3L, 30.0),
      ("B", 1L, 5.0), ("B", 2L, 5.0)).toDF("k", "seq", "v")
    val out = SequentialOps.ema(df, Seq("k"), Seq("seq"), "v", 0.5, "ema")
      .orderBy("k", "seq").collect().map(_.getAs[Double]("ema"))
    // A: 10; 0.5*20+0.5*10=15; 0.5*30+0.5*15=22.5. B: 5; 5.
    assert(out.toSeq === Seq(10.0, 15.0, 22.5, 5.0, 5.0))
  }

  test("ema key isolation survives repartitioning (keys interleaved in input)") {
    val rows = (1 to 500).flatMap(i => Seq(("A", i.toLong, 1.0), ("B", i.toLong, 2.0)))
    val df = rows.toDF("k", "seq", "v").repartition(7)
    val out = SequentialOps.ema(df, Seq("k"), Seq("seq"), "v", 0.3, "ema")
      .orderBy("k", "seq").collect()
    // constant series -> ema stays at the constant for every row of each key
    out.foreach { r =>
      val expect = if (r.getString(0) == "A") 1.0 else 2.0
      assert(r.getAs[Double]("ema") === expect)
    }
  }

  test("wilder seeds with simple mean of first `period` values") {
    val df = Seq(("A", 1L, 2.0), ("A", 2L, 4.0), ("A", 3L, 9.0))
      .toDF("k", "seq", "v")
    val out = SequentialOps.wilder(df, Seq("k"), Seq("seq"), "v", 2, "w")
      .orderBy("seq").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("w"))) // warmup
    assert(out(1).getAs[Double]("w") === 3.0)       // mean(2,4)
    assert(out(2).getAs[Double]("w") === (3.0 * 1 + 9.0) / 2)
  }
}
