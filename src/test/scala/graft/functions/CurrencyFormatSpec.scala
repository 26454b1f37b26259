package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** F15 (`currency_codes.py:218-267`): every style family against
  * first-principles expected strings, mirroring the reference CODE
  * (not its docstrings — EUR really renders `€1.234,50`). */
class CurrencyFormatSpec extends SparkSpecBase {
  import spark.implicits._

  private def fmt(amount: Double, code: String,
                  useDecimals: Boolean = true): String =
    Seq((amount, code)).toDF("amount", "code")
      .select(CurrencyFormat.formatCurrency(col("amount"), col("code"),
        useDecimals))
      .head().getString(0)

  test("EN style: symbol attaches, comma thousands") {
    assert(fmt(1234.5, "USD") === "$1,234.50")
    assert(fmt(100.5, "USD") === "$100.50")
    assert(fmt(1234567.891, "GBP") === "£1,234,567.89")
    assert(fmt(1234.5, "ZAR") === "R1,234.50")
    assert(fmt(1234.5, "JPY") === "¥1,234.50")
  }

  test("DE style: dot thousands, comma decimal") {
    assert(fmt(1234.5, "EUR") === "€1.234,50")
    assert(fmt(1234567.891, "BRL") === "R$1.234.567,89")
  }

  test("CH style: apostrophe thousands, identity symbol spaced") {
    assert(fmt(1234.5, "CHF") === "CHF 1'234.50")
  }

  test("symboled code with NO style row falls to FMT_NONE (SEK quirk)") {
    // CURRENCY_FORMATS omits SEK/NOK/DKK/VND in the reference, so the
    // symbol attaches but thousands separators vanish.
    assert(fmt(1234.5, "SEK") === "kr1234.50")
    assert(fmt(1234.5, "VND") === "₫1234.50")
  }

  test("unknown code: spaced code prefix, FMT_NONE") {
    assert(fmt(1234.5, "XYZ") === "XYZ 1234.50")
  }

  test("identity commodities render like unknown codes") {
    assert(fmt(1234.5, "XAU") === "XAU 1,234.50") // styled (FMT_EN) but spaced
  }

  test("sign is dropped — the reference formats abs(amount)") {
    assert(fmt(-1234.5, "USD") === "$1,234.50")
    assert(fmt(-100.5, "EUR") === "€100,50")
  }

  test("case-insensitive codes") {
    assert(fmt(100.5, "usd") === "$100.50")
  }

  test("useDecimals=false drops the fraction") {
    assert(fmt(1234.4, "USD", useDecimals = false) === "$1,234")
  }

  test("symbol() and hasSymbol() mirror get/has_currency_symbol") {
    val row = Seq(("USD", "CHF", "ZWL")).toDF("a", "b", "c")
      .select(
        CurrencyFormat.symbol(col("a")).as("sa"),
        CurrencyFormat.hasSymbol(col("a")).as("ha"),
        CurrencyFormat.symbol(col("b")).as("sb"),
        CurrencyFormat.hasSymbol(col("b")).as("hb"),
        CurrencyFormat.symbol(col("c")).as("sc"),
        CurrencyFormat.hasSymbol(col("c")).as("hc"))
      .head()
    assert(row.getString(0) === "$" && row.getBoolean(1))
    assert(row.getString(2) === "CHF" && row.getBoolean(3)) // identity entry IS mapped
    assert(row.getString(4) === "ZWL" && !row.getBoolean(5))
  }

  test("the whole pipeline stays codegen'd — no UDF in the plan") {
    val plan = Seq((1234.5, "EUR")).toDF("amount", "code")
      .select(CurrencyFormat.formatCurrency(col("amount"), col("code")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
