package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class ArrayDotProductSpec extends SparkSpecBase {
  import spark.implicits._

  test("array_dot: codegen loop matches the SQL aggregate form bit-exactly") {
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.1, -0.2), Seq(0.3, 0.4)),
      (3L, Seq.empty[Double], Seq(1.0)) // ragged: null, as zip_with yields
    ).toDF("id", "a", "b")
    val out = df
      .withColumn("native", ArrayDotProduct.arrayDot(col("a"), col("b")))
      .withColumn("sql_form",
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("native") === 32.0)
    assert(out(1).getAs[Double]("native") === (0.1 * 0.3 + -0.2 * 0.4))
    assert(out(2).isNullAt(out(2).fieldIndex("native")))
    // same summation order -> bit-identical (including null), not just close
    out.foreach { r =>
      val (ni, si) = (r.fieldIndex("native"), r.fieldIndex("sql_form"))
      assert(r.isNullAt(ni) === r.isNullAt(si))
      if (!r.isNullAt(ni)) assert(r.getDouble(ni) === r.getDouble(si))
    }
  }

  test("array_dot: null ELEMENTS yield null, matching the aggregate form") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("id", "a", "b")
    val out = df
      .withColumn("native", ArrayDotProduct.arrayDot(col("a"), col("b")))
      .withColumn("sql_form",
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("native") === 11.0)
    assert(out(1).isNullAt(out(1).fieldIndex("native")))
    assert(out(1).isNullAt(out(1).fieldIndex("sql_form")))
  }

  test("array_dot: null array yields null; SQL registration works") {
    ArrayDotProduct.register(spark)
    val df = Seq((1L, Option(Seq(1.0, 2.0)), Option(Seq(3.0, 4.0))),
      (2L, None: Option[Seq[Double]], Option(Seq(1.0))))
      .toDF("id", "a", "b")
    df.createOrReplaceTempView("v_dot")
    val out = spark.sql("SELECT id, array_dot(a, b) AS d FROM v_dot ORDER BY id")
      .collect()
    assert(out(0).getAs[Double]("d") === 11.0)
    assert(out(1).isNullAt(1))
  }

  test("array_dot: survives a 10k-row scoring join (whole-stage codegen path)") {
    val vecs = spark.range(10000)
      .select(col("id"), expr("transform(sequence(0, 7), j -> cast(id % 97 + j as double))").as("v"))
    val got = vecs
      .withColumn("d", ArrayDotProduct.arrayDot(col("v"), col("v")))
      .agg(sum("d")).as[Double].head()
    val want = vecs
      .withColumn("d", expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"))
      .agg(sum("d")).as[Double].head()
    assert(got === want)
  }
}
