package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd intersection COUNT over two VALUE-SORTED
  * `array<bigint>` columns — the hot scalar of the dedup verify joins
  * ([[graft.dedup.Dedup]]): per candidate pair, "how many shingle hashes
  * do these two documents share".
  *
  * The built-in `size(array_intersect(a, b))` computes the same number
  * but materializes the intersection ARRAY through a hash set that boxes
  * every element (`OpenHashSet[Any]`) — measured as the dominant cost of
  * the verify stage at sf10. This expression is a two-pointer merge over
  * the sorted arrays: zero allocation, zero boxing, primitive `getLong`
  * reads, and it compiles into whole-stage codegen (`doGenCode`) with an
  * interpreted `nullSafeEval` fallback.
  *
  * CONTRACT (the caller's to keep, cheap to get wrong silently): both
  * arrays must be sorted ascending and duplicate-free — exactly what the
  * dedup pipeline's per-doc DISTINCT shingle sets provide. Unsorted
  * input would undercount, so [[graft.dedup.Dedup]] sorts arrays at
  * build time (once per doc) rather than per pair. Null array → null;
  * null elements are not supported (the build step never emits them). */
case class SortedCommonCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_common_count expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_common_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedCommonCount =
    copy(left = newLeft, right = newRight)
}

object SortedCommonCount {

  /** Column API: `sortedCommonCount(col("a"), col("b"))`. */
  def sortedCommonCount(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(SortedCommonCount(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  /** Register for SQL: `sorted_common_count(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_common_count", exprs => SortedCommonCount(exprs.head, exprs(1)),
      "built-in")
}
