package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** F8 pip-size rule + F15 currency formatting
  * (reference `pip_math.py`, `currency_codes.py`). */
class TradingMathSpec extends SparkSpecBase {
  import spark.implicits._

  test("pipSize: TICK markets use the tick; fractional-pip 3/5-digit x10") {
    val df = Seq(
      // (tick, digits, mode, expected)
      (0.1, 1, "TICK", 0.1),            // crypto: pip = tick
      (0.00001, 5, "TICK", 0.00001),
      (0.00001, 5, "FRACTIONAL_PIP", 0.0001),  // EURUSD pipette broker
      (0.001, 3, "FRACTIONAL_PIP", 0.01),      // USDJPY pipette broker
      (0.0001, 4, "FRACTIONAL_PIP", 0.0001),   // whole-pip broker
      (0.01, 2, "FRACTIONAL_PIP", 0.01))
      .toDF("tick_size", "digits", "pip_mode", "expected")
    val got = df.withColumn("pip",
      TradingMath.pipSize(col("tick_size"), col("digits"), col("pip_mode")))
    assert(got.filter(col("pip") =!= col("expected")).count() === 0)
  }

  test("pipSize scala twin agrees with the column rule") {
    assert(TradingMath.pipSize(0.00001, 5, fractionalPip = true) === 0.0001)
    assert(TradingMath.pipSize(0.00001, 4, fractionalPip = true) === 0.00001)
    assert(TradingMath.pipSize(0.1, 1, fractionalPip = false) === 0.1)
  }

  test("formatCurrencySimple: symbol prefix when known, code + space otherwise") {
    val df = Seq((100.5, "USD"), (100.5, "EUR"), (100.5, "ZAR"), (100.5, "XYZ"),
      (1234567.891, "USD")).toDF("amount", "code")
    val got = df.select(
      TradingMath.formatCurrencySimple(col("amount"), col("code")).as("s"))
      .as[String].collect().toSeq
    assert(got === Seq("$100.50", "€100.50", "R100.50", "XYZ 100.50",
      "$1,234,567.89"))
  }
}
