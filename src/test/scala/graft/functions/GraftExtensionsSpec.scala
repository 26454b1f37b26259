package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions path needs a session built with
  * `spark.sql.extensions` (fixed at session instantiation), so this spec
  * clears the default/active handles, builds its own session (reusing
  * the JVM-wide SparkContext if one exists), and restores the handles —
  * it must NOT stop() the shared context other suites run on. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injects ema and array_dot into plain SQL") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // withExtensions: spark.sql.extensions is a STATIC conf — with a
    // pre-existing SparkContext (shared test JVM) the config-string form
    // is ignored, but the builder hook injects identically. On a fresh
    // JVM / spark-submit, the config string drives the same class.
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      Seq((1L, 10.0, Seq(1.0, 2.0)), (2L, 20.0, Seq(3.0, 4.0)))
        .toDF("id", "x", "v").createOrReplaceTempView("t")
      val rows = spark.sql(
        """SELECT id,
          |  ema(x, 0.5) OVER (ORDER BY id) AS e,
          |  array_dot(v, v) AS d
          |FROM t ORDER BY id""".stripMargin).collect()
      assert(rows(0).getAs[Double]("e") === 10.0)       // seeded with first
      assert(rows(1).getAs[Double]("e") === 15.0)       // 0.5*20 + 0.5*10
      assert(rows(0).getAs[Double]("d") === 5.0)        // 1+4
      assert(rows(1).getAs[Double]("d") === 25.0)       // 9+16
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
