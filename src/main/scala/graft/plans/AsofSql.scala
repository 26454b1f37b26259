package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression,
  GreaterThanOrEqual, LeafExpression, LessThanOrEqual, PredicateHelper,
  Unevaluable}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StructType,
  TimestampType}
import graft.plans.NativeAsOf.AsOfJoinNode

/** `ASOF JOIN` SQL syntax over the native Catalyst node (PLAN stretch,
  * round-5 verdict item 4): a parser interceptor + resolution rule pair,
  * so
  *
  * {{{
  *   SELECT ... FROM ticks t ASOF JOIN signals s
  *     ON t.sym = s.sym AND t.ts >= s.ts
  * }}}
  *
  * plans to [[NativeAsOf.AsOfMergeJoinExec]] — the same operator the
  * DataFrame API (`NativeAsOf.backward`) uses, with identical backward
  * as-of semantics (DuckDB's `ASOF LEFT JOIN ... ON l.ts >= r.ts`:
  * every left row, the LAST visible right row per key, null payload when
  * none). The right side's columns are ALL exposed (like a plain join),
  * nullable.
  *
  * Mechanics — Spark's grammar is not extensible, so the standard
  * interceptor pattern applies ([[AsofSqlParser]]):
  *   1. the parser rewrites `ASOF JOIN` → `JOIN` and injects a
  *      [[GraftAsofMarker]] conjunct into that join's `ON` condition
  *      (a paren/quote/comment-aware scan, NOT a regex — `ON` inside a
  *      subquery on the right side is skipped by depth);
  *   2. the delegate parser parses the rewritten text as a normal join;
  *   3. [[ResolveAsofJoin]] (analyzer resolution rule) finds the marked
  *      join once both sides resolve and rebuilds it as an
  *      [[NativeAsOf.AsOfJoinNode]], classifying the ON conjuncts into
  *      equi-keys and exactly one `left_ts >= right_ts` bound;
  *   4. the injected planner strategy maps the node to the merge exec.
  *
  * Anything outside the supported shape fails LOUDLY: an `OR` in the ON,
  * a missing/duplicate time bound, mixed timestamp types, or a marker
  * that somehow escapes analysis (it is [[Unevaluable]], so it can never
  * silently degrade into a cross join). Registered by
  * [[graft.functions.GraftExtensions]]; [[graft.GraftSession]] builds
  * every session with those extensions.
  */
object AsofSql {

  /** Unevaluable marker conjunct the parser plants in the rewritten ON
    * condition. Never survives a correct analysis; if the condition shape
    * is unsupported the resolution rule throws first, and if a plan
    * escapes anyway, planning fails on the Unevaluable — loud either way. */
  case class GraftAsofMarker() extends LeafExpression with Unevaluable {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_asof_marker"
  }

  private def unsupported(what: String): Nothing =
    throw new IllegalArgumentException(
      s"ASOF JOIN: $what — the ON condition must be a conjunction of " +
        "equi-key predicates (l.k = r.k) plus exactly one time bound " +
        "(l.ts >= r.ts or r.ts <= l.ts), both sides LongType or both " +
        "TimestampType")

  /** Analyzer rule: marked inner join → [[AsOfJoinNode]]. Fires only
    * once both children and the condition are resolved (fixed-point
    * analysis); idempotent because the rebuilt node carries no marker. */
  object ResolveAsofJoin extends Rule[LogicalPlan] with PredicateHelper {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperatorsUp {
        case j @ Join(l, r, Inner, Some(cond), _)
            if cond.exists(_.isInstanceOf[GraftAsofMarker]) &&
              j.childrenResolved && cond.resolved =>
          val preds = splitConjunctivePredicates(cond)
          if (!preds.exists(_.isInstanceOf[GraftAsofMarker]))
            unsupported("the marker is nested under a non-AND operator " +
              "(an OR or NOT in the ON condition?)")
          val lSet = l.outputSet
          val rSet = r.outputSet
          val keys = scala.collection.mutable.ArrayBuffer.empty[(Attribute, Attribute)]
          var ts: Option[(Attribute, Attribute)] = None
          def addTs(lt: Attribute, rt: Attribute): Unit = {
            if (ts.nonEmpty) unsupported("more than one time bound")
            ts = Some((lt, rt))
          }
          preds.foreach {
            case _: GraftAsofMarker => ()
            case EqualTo(a: Attribute, b: Attribute)
                if lSet.contains(a) && rSet.contains(b) => keys += ((a, b))
            case EqualTo(a: Attribute, b: Attribute)
                if rSet.contains(a) && lSet.contains(b) => keys += ((b, a))
            case GreaterThanOrEqual(a: Attribute, b: Attribute)
                if lSet.contains(a) && rSet.contains(b) => addTs(a, b)
            case LessThanOrEqual(a: Attribute, b: Attribute)
                if rSet.contains(a) && lSet.contains(b) => addTs(b, a)
            case other => unsupported(s"unsupported conjunct $other")
          }
          if (keys.isEmpty) unsupported("no equi-key predicate")
          val (lt, rt) = ts.getOrElse(unsupported("no time bound"))
          for (t <- Seq(lt, rt))
            if (t.dataType != LongType && t.dataType != TimestampType)
              unsupported(s"time column ${t.name} has type ${t.dataType}")
          if (lt.dataType != rt.dataType)
            unsupported(s"mixed time types ${lt.dataType} vs ${rt.dataType}")
          // all right columns ride as payload — same output attributes as
          // the plain join the analyzer resolved, so upstream references
          // (projections, filters) stay valid untouched
          AsOfJoinNode(l, r, keys.map(_._1).toSeq, keys.map(_._2).toSeq,
            lt, rt, r.output)
      }
  }

  /** Paren/quote/comment-aware `ASOF JOIN` rewriter. Returns the input
    * unchanged when it contains no ASOF token. Throws (loudly) when an
    * ASOF join's ON cannot be located unambiguously (an intervening
    * unparenthesized JOIN at the same depth). */
  private[plans] def rewrite(sql: String): String = {
    if (!sql.toLowerCase(java.util.Locale.ROOT).contains("asof")) return sql
    val s = sql
    val out = new java.lang.StringBuilder(s.length + 64)
    val n = s.length
    var i = 0
    var depth = 0
    // depths with a rewritten ASOF JOIN still waiting for its ON
    val pending = scala.collection.mutable.Set.empty[Int]
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '\'' | '"' | '`' => // quoted literal/identifier: copy verbatim
          val q = c
          out.append(c); i += 1
          var closed = false
          while (i < n && !closed) {
            out.append(s.charAt(i))
            if (s.charAt(i) == q)
              if (i + 1 < n && s.charAt(i + 1) == q) { out.append(q); i += 1 }
              else closed = true
            i += 1
          }
        case '-' if i + 1 < n && s.charAt(i + 1) == '-' => // line comment
          while (i < n && s.charAt(i) != '\n') { out.append(s.charAt(i)); i += 1 }
        case '/' if i + 1 < n && s.charAt(i + 1) == '*' => // block comment
          out.append("/*"); i += 2
          while (i < n && !(s.charAt(i) == '*' && i + 1 < n && s.charAt(i + 1) == '/')) {
            out.append(s.charAt(i)); i += 1
          }
          if (i < n) { out.append("*/"); i += 2 }
        case '(' => depth += 1; out.append(c); i += 1
        case ')' => pending -= depth; depth -= 1; out.append(c); i += 1
        case w if isWordChar(w) =>
          val start = i
          while (i < n && isWordChar(s.charAt(i))) i += 1
          val word = s.substring(start, i)
          val lower = word.toLowerCase(java.util.Locale.ROOT)
          if (lower == "asof") {
            // must be followed by JOIN (whitespace/comments between allowed
            // only as plain whitespace here)
            var k = i
            while (k < n && Character.isWhitespace(s.charAt(k))) k += 1
            val ke = {
              var e = k
              while (e < n && isWordChar(s.charAt(e))) e += 1
              e
            }
            if (ke > k && s.substring(k, ke).equalsIgnoreCase("join")) {
              if (pending.contains(depth))
                throw new IllegalArgumentException(
                  "ASOF JOIN before the previous ASOF JOIN's ON at the " +
                    "same nesting depth — parenthesize the joins")
              out.append("JOIN") // drop ASOF, keep a single JOIN token
              pending += depth
              i = ke
            } else out.append(word)
          } else if (lower == "join" && pending.contains(depth)) {
            throw new IllegalArgumentException(
              "another JOIN before the ASOF JOIN's ON at the same " +
                "nesting depth — parenthesize the joins")
          } else if (lower == "on" && pending.contains(depth)) {
            out.append(word).append(" graft_asof_marker() AND")
            pending -= depth
          } else out.append(word)
        case _ => out.append(c); i += 1
      }
    }
    if (pending.nonEmpty)
      throw new IllegalArgumentException("ASOF JOIN without an ON condition")
    out.toString
  }

  /** Delegating parser: rewrites ASOF syntax in plan-level texts, passes
    * everything else through untouched. */
  class AsofSqlParser(delegate: ParserInterface) extends ParserInterface {
    override def parsePlan(sqlText: String): LogicalPlan =
      delegate.parsePlan(rewrite(sqlText))
    override def parseQuery(sqlText: String): LogicalPlan =
      delegate.parseQuery(rewrite(sqlText))
    override def parseExpression(sqlText: String): Expression =
      delegate.parseExpression(sqlText)
    override def parseTableIdentifier(sqlText: String): TableIdentifier =
      delegate.parseTableIdentifier(sqlText)
    override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
      delegate.parseFunctionIdentifier(sqlText)
    override def parseMultipartIdentifier(sqlText: String): Seq[String] =
      delegate.parseMultipartIdentifier(sqlText)
    override def parseTableSchema(sqlText: String): StructType =
      delegate.parseTableSchema(sqlText)
    override def parseDataType(sqlText: String): DataType =
      delegate.parseDataType(sqlText)
    override def parseRoutineParam(sqlText: String): StructType =
      delegate.parseRoutineParam(sqlText)
  }
}
