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
  * Null semantics MATCH the SQL form it replaces (so swapping one for
  * the other can never silently change results): a length mismatch
  * yields NULL (as `zip_with` would), and a null ELEMENT yields NULL
  * (as `aggregate`'s `acc + null` would) — a ragged or null-element
  * embedding surfaces as a null cosine instead of a plausible-but-wrong
  * prefix dot. The element-null check is compiled in only when an
  * input's array type says `containsNull`; the dense case keeps the
  * tight primitive loop. Summation is index-ascending — the same order
  * as the SQL `aggregate` form and the JVM kernels in
  * [[graft.similarity.Similarity]], so results are bit-identical across
  * all three paths.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  // Result can be null (length mismatch / null element) even when both
  // child arrays are non-null.
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

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
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val elemNullCheck =
        if (elementsNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemNullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
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
