package graft.bars

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Mirrors the reference's synthetic bar-parity fixture
  * (`/root/reference/tests/parity/test_bar_parity_kraken_spot_btcusd.py:1-14`,
  * generators `tests/shared/parity_fixtures.py`): a deterministic tick
  * stream at 1 tick/second must render exact, gap-free M1 bars; plus
  * ScalaCheck OHLC invariants per SURVEY §5.
  */
class OhlcvSpec extends SparkSpecBase {
  import spark.implicits._

  private val t0 = 1700000000000L // 2023-11-14 22:13:20 UTC

  /** 1000 ticks, 1/s, seeded deterministic walk (mid = 100 + wiggle). */
  private def syntheticTicks = {
    val rnd = new scala.util.Random(42)
    var mid = 100.0
    (0 until 1000).map { i =>
      mid += (rnd.nextDouble() - 0.5)
      (i.toLong, t0 + i * 1000L, mid, 1.0)
    }.toDF("tick_id", "ts_ms", "price", "vol")
  }

  test("1000 ticks at 1/s render 17 M1 buckets, 16 complete (reference parity shape)") {
    val ticks = syntheticTicks
      .withColumn("sym", lit("BTCUSD"))
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val bars = Ohlcv.renderTimeframe(ticks, Seq(col("sym")), col("ts"),
        col("price"), col("vol"), col("tick_id"), "M1")
      .orderBy("bar_start").collect()
    // t0 is 20s past the minute: bucket 1 has 40 ticks, then 16 complete
    // 60-tick bars, bucket 18 has 0 -> total 1000 = 40 + 16*60
    assert(bars.length === 17)
    val counts = bars.map(_.getAs[Long]("tick_count"))
    assert(counts.head === 40L)
    assert(counts.tail.forall(_ === 60L))
    assert(counts.sum === 1000L)
  }

  test("open/close are first/last by time; high/low bound them") {
    val ticks = Seq(
      ("A", 1L, 10.0), ("A", 2L, 30.0), ("A", 3L, 5.0), ("A", 4L, 20.0),
      ("B", 1L, 7.0)).toDF("sym", "seq", "price")
    val bars = Ohlcv.render(ticks, Seq(col("sym")), lit(0L), col("price"),
        col("price"), col("seq"), col("seq"))
      .orderBy("sym").collect()
    assert(bars(0).getAs[Double]("open") === 10.0)
    assert(bars(0).getAs[Double]("close") === 20.0)
    assert(bars(0).getAs[Double]("high") === 30.0)
    assert(bars(0).getAs[Double]("low") === 5.0)
    assert(bars(1).getAs[Double]("open") === 7.0)
    assert(bars(1).getAs[Double]("close") === 7.0)
  }

  test("OHLC invariants hold on random tick streams (property, 10 seeds)") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(200)
      val ps = List.fill(n)(1.0 + rnd.nextDouble() * 999.0)
      val ticks = ps.zipWithIndex
        .map { case (p, i) => ("S", i.toLong, t0 + i * 7000L, p) }
        .toDF("sym", "tick_id", "ts_ms", "price")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      val bars = Ohlcv.renderTimeframe(ticks, Seq(col("sym")), col("ts"),
        col("price"), col("price"), col("tick_id"), "M5").collect()
      // window-count conservation
      assert(bars.map(_.getAs[Long]("tick_count")).sum === ps.length.toLong)
      bars.foreach { b =>
        val (o, h, l, c) = (b.getAs[Double]("open"), b.getAs[Double]("high"),
          b.getAs[Double]("low"), b.getAs[Double]("close"))
        assert(l <= o && o <= h)
        assert(l <= c && c <= h)
      }
    }
  }
}
