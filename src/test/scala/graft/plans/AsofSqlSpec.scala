package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class AsofSqlSpec extends SparkSpecBase {
  import spark.implicits._

  test("rewrite: basic ASOF JOIN gets the marker; non-ASOF text untouched") {
    val in = "SELECT * FROM a ASOF JOIN b ON a.k = b.k AND a.t >= b.t"
    val out = AsofSql.rewrite(in)
    assert(out ===
      "SELECT * FROM a JOIN b ON graft_asof_marker() AND a.k = b.k AND a.t >= b.t")
    val plain = "SELECT * FROM a JOIN b ON a.k = b.k"
    assert(AsofSql.rewrite(plain) eq plain)
  }

  test("rewrite: ON inside the right-side subquery is skipped by depth") {
    val in = "SELECT * FROM a ASOF JOIN (SELECT * FROM x JOIN y ON x.i = y.i) b " +
      "ON a.k = b.k AND a.t >= b.t"
    val out = AsofSql.rewrite(in)
    assert(out.contains("JOIN (SELECT * FROM x JOIN y ON x.i = y.i) b " +
      "ON graft_asof_marker() AND a.k"))
    assert(!out.contains("ON graft_asof_marker() AND x.i"))
  }

  test("rewrite: quoted literals and comments keep their ASOF/ON text") {
    val in = "SELECT 'asof join on', `on` FROM a ASOF JOIN b ON a.k = b.k " +
      "AND a.t >= b.t -- asof join on\n"
    val out = AsofSql.rewrite(in)
    assert(out.contains("'asof join on'"))
    assert(out.contains("-- asof join on"))
    assert(out.count(_ == '(') === 1) // exactly one marker call added
  }

  test("rewrite: ambiguous or missing ON fails loudly") {
    val e1 = intercept[IllegalArgumentException] {
      AsofSql.rewrite("SELECT * FROM a ASOF JOIN b JOIN c ON c.i = b.i ON a.k = b.k")
    }
    assert(e1.getMessage.contains("parenthesize"))
    val e2 = intercept[IllegalArgumentException] {
      AsofSql.rewrite("SELECT * FROM a ASOF JOIN b")
    }
    assert(e2.getMessage.contains("without an ON"))
  }

  private def fixtures(): Unit = {
    Seq((1L, "A", 100L), (2L, "A", 250L), (3L, "B", 150L), (4L, "C", 90L))
      .toDF("tick_id", "sym", "ts").createOrReplaceTempView("asof_spec_ticks")
    Seq(("A", 50L, 1.0), ("A", 200L, 2.0), ("A", 250L, 3.0), ("B", 150L, 4.0),
      ("B", 160L, 5.0))
      .toDF("sym", "sts", "sig").createOrReplaceTempView("asof_spec_sigs")
  }

  test("ASOF JOIN SQL equals the DataFrame-API native node result") {
    fixtures()
    val viaSql = spark.sql(
      """SELECT t.tick_id, s.sig FROM asof_spec_ticks t
        |ASOF JOIN asof_spec_sigs s ON t.sym = s.sym AND t.ts >= s.sts
        |ORDER BY t.tick_id""".stripMargin)
    val ticks = spark.table("asof_spec_ticks")
    val sigs = spark.table("asof_spec_sigs")
    val viaApi = NativeAsOf.backward(ticks, sigs, Seq("sym"), "ts", "sts",
        Seq("sig"))
      .select(col("tick_id"), col("sig")).orderBy(col("tick_id"))
    assert(viaSql.collect().toSeq === viaApi.collect().toSeq)
    // and the expected backward-as-of values directly: tick 1 sees A@50,
    // tick 2 sees A@250 (<= bound inclusive), tick 3 sees B@150 (not 160),
    // tick 4 has no C signal -> null
    val got = viaSql.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq === Seq((1L, Some(1.0)), (2L, Some(3.0)),
      (3L, Some(4.0)), (4L, None)))
  }

  test("ASOF JOIN SQL plans to AsOfMergeJoinExec (not a regular join)") {
    fixtures()
    val df = spark.sql(
      """SELECT t.tick_id, s.sig FROM asof_spec_ticks t
        |ASOF JOIN asof_spec_sigs s ON t.sym = s.sym AND t.ts >= s.sts""".stripMargin)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfMergeJoin"),
      s"expected the native as-of exec in:\n$physical")
  }

  test("unsupported ON shapes fail loudly at analysis") {
    fixtures()
    val or = intercept[Throwable] {
      spark.sql("""SELECT * FROM asof_spec_ticks t ASOF JOIN asof_spec_sigs s
        ON (t.sym = s.sym OR t.sym = 'X') AND t.ts >= s.sts""").collect()
    }
    assert(or.getMessage.contains("ASOF JOIN"))
    val noTs = intercept[Throwable] {
      spark.sql("""SELECT * FROM asof_spec_ticks t ASOF JOIN asof_spec_sigs s
        ON t.sym = s.sym""").collect()
    }
    assert(noTs.getMessage.contains("no time bound"))
    val noKey = intercept[Throwable] {
      spark.sql("""SELECT * FROM asof_spec_ticks t ASOF JOIN asof_spec_sigs s
        ON t.ts >= s.sts""").collect()
    }
    assert(noKey.getMessage.contains("no equi-key"))
  }
}
