package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Trading-math scalars (SURVEY F8, F15) as pure column expressions —
  * codegen-friendly, no UDFs.
  */
object TradingMath {

  val PipModeTick = "TICK"
  val PipModeFractional = "FRACTIONAL_PIP"

  /** F8: authoritative per-symbol pip size from broker tick/digits
    * (`/root/reference/python/framework/utils/trading_math/pip_math.py:11-33`):
    * TICK markets have no pip concept (pip = tick); FRACTIONAL_PIP (forex)
    * pipette brokers (5-digit, or 3-digit JPY) quote one extra fractional
    * digit → pip = tick × 10, whole-pip brokers → pip = tick. */
  def pipSize(tickSize: Column, digits: Column, pipMode: Column): Column =
    when(pipMode === PipModeTick, tickSize)
      .otherwise(when(digits.isin(3, 5), tickSize * 10).otherwise(tickSize))

  /** Scala-side twin for row-wise kernels (same rule, no DataFrame). */
  def pipSize(tickSize: Double, digits: Int, fractionalPip: Boolean): Double =
    if (!fractionalPip) tickSize
    else if (digits == 3 || digits == 5) tickSize * 10 else tickSize

  /** F15: simple currency formatting — symbol prefixed with no space when
    * known, else "CODE amount" (`currency_codes.py:203-233`). Display-only. */
  private val Symbols = Map(
    "USD" -> "$", "EUR" -> "€", "GBP" -> "£", "JPY" -> "¥", "CHF" -> "Fr",
    "AUD" -> "A$", "CAD" -> "C$", "NZD" -> "NZ$", "ZAR" -> "R")

  def formatCurrencySimple(amount: Column, currencyCode: Column,
                           useDecimals: Boolean = true): Column = {
    val formatted =
      if (useDecimals) format_number(amount, 2)
      else format_number(amount, 0)
    val symbol = Symbols.foldLeft(lit(null).cast("string")) {
      case (acc, (code, sym)) => when(currencyCode === code, lit(sym)).otherwise(acc)
    }
    when(symbol.isNotNull, concat(symbol, formatted))
      .otherwise(concat(currencyCode, lit(" "), formatted))
  }
}
