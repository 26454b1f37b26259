package graft.indicators

import graft.SparkSpecBase

class IndicatorsSpec extends SparkSpecBase {
  import spark.implicits._

  private def series(vs: Double*) =
    vs.zipWithIndex.map { case (v, i) => ("S", i.toLong, v) }
      .toDF("sym", "seq", "close")

  test("trueRange: first row falls back to high-low; else max of three") {
    val df = Seq(
      ("S", 1L, 12.0, 8.0, 10.0),  // tr = 4 (no prev)
      ("S", 2L, 11.0, 9.0, 9.5))   // tr = max(2, |11-10|, |9-10|) = 2
      .toDF("sym", "seq", "high", "low", "close")
    val out = Indicators.trueRange(df, Seq("sym"), Seq("seq"), "high", "low", "close")
      .orderBy("seq").collect().map(_.getAs[Double]("tr"))
    assert(out.toSeq === Seq(4.0, 2.0))
  }

  test("rsi: all-gain window -> 100; mixed matches formula") {
    val df = series(1, 2, 3, 4)
    val out = Indicators.rsi(df, Seq("sym"), Seq("seq"), "close", 3)
      .orderBy("seq").collect()
    assert(out(2).isNullAt(out(2).fieldIndex("rsi"))) // only 2 deltas so far
    assert(out(3).getAs[Double]("rsi") === 100.0)
    val mixed = series(10, 12, 11, 13)
    val o2 = Indicators.rsi(mixed, Seq("sym"), Seq("seq"), "close", 3)
      .orderBy("seq").collect()
    // deltas: +2,-1,+2 -> gain=(2+0+2)/3, loss=(0+1+0)/3 -> rs=4 -> rsi=80
    assert(math.abs(o2(3).getAs[Double]("rsi") - 80.0) < 1e-9)
  }

  test("obv: signed cumulative volume") {
    val df = Seq(("S", 1L, 10.0, 100.0), ("S", 2L, 11.0, 50.0),
      ("S", 3L, 11.0, 70.0), ("S", 4L, 10.0, 30.0))
      .toDF("sym", "seq", "close", "vol")
    val out = Indicators.obv(df, Seq("sym"), Seq("seq"), "close", "vol")
      .orderBy("seq").collect().map(_.getAs[Double]("obv"))
    assert(out.toSeq === Seq(0.0, 50.0, 50.0, 20.0))
  }

  test("bollinger: constant series -> zero width, null %B") {
    val df = series(Seq.fill(25)(7.0): _*)
    val out = Indicators.bollinger(df, Seq("sym"), Seq("seq"), "close", 20, 2.0)
      .orderBy("seq").collect()
    val last = out.last
    assert(last.getAs[Double]("bb_mid") === 7.0)
    assert(last.getAs[Double]("bb_upper") === 7.0)
    assert(last.isNullAt(last.fieldIndex("bb_pct_b")))
    assert(out(10).isNullAt(out(10).fieldIndex("bb_mid"))) // warmup
  }

  test("macd: constant series -> zero line, signal, histogram") {
    val df = series(Seq.fill(40)(5.0): _*)
    val out = Indicators.macd(df, Seq("sym"), Seq("seq"), "close")
      .orderBy("seq").collect().last
    assert(out.getAs[Double]("macd_line") === 0.0)
    assert(out.getAs[Double]("macd_signal") === 0.0)
    assert(out.getAs[Double]("macd_hist") === 0.0)
  }

  test("macd: null closes — fused scan ≡ the chained three-EMA composition") {
    import org.apache.spark.sql.functions.col
    // The r17 ADVICE claimed the fused scan emits (null,null,null) on a
    // null close after seeding and freezes the signal state. It does
    // not: the null branch carries (f0, s0) which stay Some once seeded,
    // so the seeded case emits the CARRIED line and ADVANCES the signal
    // on it — exactly the chained composition. This spec pins that
    // equivalence on nulls at the head (unseeded), mid-stream (seeded,
    // single and consecutive), and the tail.
    val rows = Seq[Option[Double]](None, Some(10.0), Some(12.0), None,
      Some(11.0), None, None, Some(14.0), Some(13.0), None)
    val df = rows.zipWithIndex.map { case (v, i) => ("S", i.toLong, v) }
      .toDF("sym", "seq", "close")
    val fused = Indicators.macd(df, Seq("sym"), Seq("seq"), "close",
        fast = 3, slow = 7, signal = 3).orderBy("seq")
      .select("macd_line", "macd_signal", "macd_hist").collect()
    // the pre-r17 three-kernel composition, inlined verbatim
    val f = graft.ops.SequentialOps.ema(df, Seq("sym"), Seq("seq"),
      "close", 2.0 / 4, "__f")
    val s = graft.ops.SequentialOps.ema(f, Seq("sym"), Seq("seq"),
      "close", 2.0 / 8, "__s")
    val line = s.withColumn("line", col("__f") - col("__s"))
    val chained = graft.ops.SequentialOps.ema(line, Seq("sym"), Seq("seq"),
        "line", 2.0 / 4, "sig")
      .withColumn("hist", col("line") - col("sig"))
      .orderBy("seq").select("line", "sig", "hist").collect()
    fused.zip(chained).zipWithIndex.foreach { case ((a, b), i) =>
      (0 until 3).foreach { c =>
        assert(a.isNullAt(c) === b.isNullAt(c), s"row $i col $c nullity")
        if (!a.isNullAt(c))
          assert(a.getDouble(c) === b.getDouble(c), s"row $i col $c value")
      }
    }
    // and the seeded null-close row (seq 3) is non-null on both forms:
    // carried line, signal advanced one step on it
    assert(!fused(3).isNullAt(0) && !fused(3).isNullAt(1))
  }

  test("atr: EMA of true range with alpha 2/(p+1) seeded at first TR") {
    val df = Seq(("S", 1L, 12.0, 8.0, 10.0), ("S", 2L, 11.0, 9.0, 9.5))
      .toDF("sym", "seq", "high", "low", "close")
    val out = Indicators.atr(df, Seq("sym"), Seq("seq"), "high", "low", "close", 3)
      .orderBy("seq").collect().map(_.getAs[Double]("atr"))
    // alpha=0.5: atr1=4, atr2=0.5*2+0.5*4=3
    assert(out.toSeq === Seq(4.0, 3.0))
  }
}
