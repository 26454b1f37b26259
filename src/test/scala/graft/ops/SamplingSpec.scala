package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Deterministic sampling/mixing: membership is a pure row function
  * (stable under repartitioning and re-runs), rates hit their targets
  * within md5-uniformity tolerance, strata rates apply independently,
  * and the corpus mix tags and orders reproducibly. */
class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = (0L until 4000L).map(i =>
    (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"))
    .toDF("id", "lang")

  test("hashSample: rate within tolerance, deterministic, partitioning-independent") {
    val a = Sampling.hashSample(docs, "id", 0.3).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(math.abs(a.size / 4000.0 - 0.3) < 0.03, s"rate off: ${a.size}")
    val b = Sampling.hashSample(docs.repartition(13), "id", 0.3).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(a === b, "membership changed under repartitioning")
    // monotone in rate: a smaller sample is a subset of a larger one
    val c = Sampling.hashSample(docs, "id", 0.1).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
    // different seed -> a different (still sized-right) sample
    val d = Sampling.hashSample(docs, "id", 0.3, seed = "other").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(d != a && math.abs(d.size / 4000.0 - 0.3) < 0.03)
  }

  test("stratifiedHashSample: per-stratum rates, default for unlisted strata") {
    val out = Sampling.stratifiedHashSample(docs, "id", "lang",
      Map("en" -> 1.0, "de" -> 0.2), defaultRate = 0.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("en") === 1000L)                   // rate 1.0 keeps all
    assert(math.abs(out("de") - 200.0) < 40)      // 0.2 of 1000
    assert(!out.contains("fr"))                   // default 0.0 drops all
  }

  test("mixCorpora: sources sampled at their rates, tagged, reproducibly ordered") {
    val src1 = (0L until 1000L).toDF("id")
    val src2 = (0L until 1000L).map(_ + 100000L).toDF("id")
    val mixed = Sampling.mixCorpora(
      Seq(("big", src1, 1.0), ("small", src2, 0.1)), "id")
      .orderBy("mix_order", "id")
    val rows = mixed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val bySrc = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySrc("big") === 1000)
    assert(math.abs(bySrc("small") - 100.0) < 30)
    // interleaved, not concatenated: both sources appear in the first 5%
    val head = rows.take(rows.length / 20).map(_._3).toSet
    assert(head === Set("big", "small"))
    // and the order is a pure function of the data
    val again = Sampling.mixCorpora(
      Seq(("big", src1, 1.0), ("small", src2, 0.1)), "id")
      .orderBy("mix_order", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq === again.toSeq)
  }

  test("the sampling gate stays codegen'd (no UDF)") {
    val plan = Sampling.hashSample(docs, "id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
  }
}
