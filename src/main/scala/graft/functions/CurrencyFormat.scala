package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F15: ISO-4217 currency display formatting
  * (`currency_codes.py:21-99` symbol map, `:104-168` per-currency
  * number styles, `format_currency_simple:218-267`).
  *
  * Built entirely from codegen'd built-ins — `format_number` produces the
  * en-US grouped form and `translate` re-punctuates it into the target
  * style — with the symbol/style dictionaries as literal `MapType`s
  * (`element_at` on a map literal stays inside whole-stage codegen; no
  * UDF, no broadcast join for a 40-row dictionary).
  *
  * Semantics mirrored from the reference CODE (its docstrings disagree
  * with it in two places):
  *   - the sign is dropped — `format_currency_simple` formats
  *     `abs(amount)` and never re-applies the sign;
  *   - EUR formats as `€1.234,50` (FMT_DE), not the docstring's
  *     `€100.50`;
  *   - a symbol identical to the code (CHF, XAU, XAG, or any unmapped
  *     code) renders as `"CODE 1,234.50"` with a space; a real symbol
  *     attaches directly (`$1,234.50`).
  *
  * Known divergence, display-only: ties round HALF_UP here
  * (`format_number`'s contract) vs Python's round-half-even. Two-decimal
  * inputs formatted at 2 decimals never tie, so the oracle query is
  * unaffected.
  */
object CurrencyFormat {

  /** ISO 4217 code → display symbol (`currency_codes.py:21-99`).
    * Codes whose "symbol" is the code itself (CHF, XAU, XAG) are left
    * OUT of the map: the formatter's fallback produces exactly the
    * reference's `"CODE amount"` rendering for them, and `symbol()`
    * falls back to the code anyway. */
  val Symbols: Map[String, String] = Map(
    "USD" -> "$", "EUR" -> "€", "GBP" -> "£", "JPY" -> "¥",
    "CAD" -> "C$", "AUD" -> "A$", "NZD" -> "NZ$",
    "SEK" -> "kr", "NOK" -> "kr", "DKK" -> "kr",
    "CNY" -> "¥", "HKD" -> "HK$", "SGD" -> "S$", "KRW" -> "₩",
    "TWD" -> "NT$", "THB" -> "฿", "INR" -> "₹", "IDR" -> "Rp",
    "MYR" -> "RM", "PHP" -> "₱", "VND" -> "₫",
    "PLN" -> "zł", "CZK" -> "Kč", "HUF" -> "Ft", "RON" -> "lei",
    "RUB" -> "₽", "TRY" -> "₺",
    "ILS" -> "₪", "SAR" -> "﷼", "AED" -> "د.إ",
    "KWD" -> "د.ك",
    "MXN" -> "Mex$", "BRL" -> "R$", "ARS" -> "AR$", "CLP" -> "CLP$",
    "COP" -> "COL$", "PEN" -> "S/",
    "ZAR" -> "R", "EGP" -> "E£", "NGN" -> "₦", "KES" -> "KSh",
    "BTC" -> "₿")

  /** Codes that format with the European style (thousands `.`, decimal
    * `,`) — `currency_codes.py:110-154` FMT_DE rows. */
  val EuropeanStyle: Set[String] = Set(
    "EUR", "PLN", "CZK", "HUF", "RON", "TRY", "RUB",
    "BRL", "ARS", "CLP", "COP", "PEN")

  /** Codes that format with the Swiss style (thousands `'`). */
  val SwissStyle: Set[String] = Set("CHF")

  /** Every code with a declared style; anything else gets FMT_NONE
    * (no thousands separator, `.` decimal). SEK/NOK/DKK/VND have symbols
    * but NO style row in the reference (`CURRENCY_FORMATS` omits them),
    * so they deliberately fall through to FMT_NONE — `kr1234.50`. */
  val KnownStyles: Set[String] = EuropeanStyle ++ SwissStyle ++ Set(
    "USD", "GBP", "CAD", "AUD", "NZD", "HKD", "SGD", "MXN", "ZAR",
    "JPY", "CNY", "KRW", "INR", "IDR", "MYR", "PHP", "THB", "TWD",
    "ILS", "SAR", "AED", "KWD", "EGP", "NGN", "KES",
    "XAU", "XAG", "BTC")

  private val symbolMap: Column =
    typedlit(Symbols)

  /** `get_currency_symbol` (`currency_codes.py:175-196`): symbol if
    * mapped, else the (upper-cased) code itself. */
  def symbol(code: Column): Column = {
    val upr = upper(code)
    coalesce(element_at(symbolMap, upr), upr).as("symbol")
  }

  /** `has_currency_symbol` (`currency_codes.py:199-215`). True exactly
    * for codes the reference maps — including the identity entries
    * (CHF/XAU/XAG), which ARE present in its dict. */
  def hasSymbol(code: Column): Column = {
    val upr = upper(code)
    (element_at(symbolMap, upr).isNotNull ||
      upr.isin(Seq("CHF", "XAU", "XAG"): _*)).as("has_symbol")
  }

  /** `format_currency_simple` (`currency_codes.py:218-267`) as one
    * codegen'd column: `$1,234.50`, `€1.234,50`, `CHF 1'234.50`,
    * `XYZ 1234.50`. Sign-dropping abs() mirrors the reference exactly. */
  def formatCurrency(amount: Column, code: Column,
                     useDecimals: Boolean = true): Column = {
    val upr = upper(code)
    // en-US grouped base form; the style translate never touches digits.
    val base = format_number(abs(amount), if (useDecimals) 2 else 0)
    val styled =
      when(upr.isin(EuropeanStyle.toSeq: _*), translate(base, ",.", ".,"))
        .when(upr.isin(SwissStyle.toSeq: _*), translate(base, ",", "'"))
        .when(upr.isin(KnownStyles.toSeq: _*), base) // FMT_EN
        .otherwise(translate(base, ",", ""))         // FMT_NONE fallback
    val sym = coalesce(element_at(symbolMap, upr), upr)
    when(sym === upr, concat_ws(" ", upr, styled))
      .otherwise(concat(sym, styled))
      .as("formatted")
  }
}
