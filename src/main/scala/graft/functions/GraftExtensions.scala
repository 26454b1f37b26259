package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: injects the graft custom
  * functions into every session built with
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * so `ema(close, 0.2) OVER (...)` and `array_dot(a, b)` resolve in
  * plain SQL on any cluster without per-session registration calls —
  * the deployment-grade form of [[GraftFunctions.register]] /
  * [[ArrayDotProduct.register]] (which remain for ad-hoc sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("ema"),
      new ExpressionInfo(classOf[EmaWindow].getName, "ema"),
      (exprs: Seq[Expression]) => EmaWindow(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (exprs: Seq[Expression]) => ArrayDotProduct(exprs.head, exprs(1))))
    // whole-operator extension: the native as-of join's planner strategy
    // (the DataFrame API in graft.plans.NativeAsOf also self-registers
    // per session for ad-hoc use)
    ext.injectPlannerStrategy(_ => graft.plans.NativeAsOf.AsOfJoinStrategy)
    // ASOF JOIN SQL syntax: parser interceptor rewrites the token pair
    // and plants the marker; the resolution rule rebuilds the marked
    // join as the native node (graft.plans.AsofSql)
    ext.injectParser((_, delegate) => new graft.plans.AsofSql.AsofSqlParser(delegate))
    ext.injectResolutionRule(_ => graft.plans.AsofSql.ResolveAsofJoin)
    ext.injectFunction((
      FunctionIdentifier("graft_asof_marker"),
      new ExpressionInfo(classOf[graft.plans.AsofSql.GraftAsofMarker].getName,
        "graft_asof_marker"),
      (_: Seq[Expression]) => graft.plans.AsofSql.GraftAsofMarker()))
  }
}
