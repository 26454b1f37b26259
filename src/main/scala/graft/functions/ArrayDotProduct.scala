package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns — the
  * hot scalar of the similarity scoring joins. The SQL-function
  * equivalent `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,z) ->
  * acc+z)` materializes an intermediate array and evaluates two lambda
  * closures per element through HigherOrderFunction interpretation;
  * this expression compiles to a tight primitive loop inside
  * whole-stage codegen (`doGenCode`), with an interpreted `nullSafeEval`
  * fallback for non-codegen paths.
  *
  * Mismatched lengths dot the common prefix; null ELEMENTS are read as
  * primitive 0.0 (embedding arrays are dense by contract). Summation is
  * index-ascending — the same order as the SQL `aggregate` form and the
  * JVM kernels in [[graft.similarity.Similarity]], so results are
  * bit-identical across all three paths.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {

  /** Column API: `arrayDot(col("a"), col("b"))`. */
  def arrayDot(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(ArrayDotProduct(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  /** Register for SQL: `array_dot(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDotProduct(exprs.head, exprs(1)), "built-in")
}
