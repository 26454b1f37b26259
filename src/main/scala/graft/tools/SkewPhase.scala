package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.{GraftSession, TaskMetricsCensus}
import graft.text.Retrieval

/** Dev-only: SAME-PHASE adjudication of the q96 (TF-IDF) stopword-skew
  * claim — "the tf ⋈ df join shuffles on term, where AQE's skew-join
  * splits stopword-grade hot keys" (`text/Retrieval.scala` scaladoc).
  * Round 12 shipped that claim asserted, not measured.
  *
  * The REGISTERED corpus can't test it: the driver documents table has a
  * 31-term corpus-wide vocabulary, so the df side is 31 rows at every SF
  * and the term join always broadcasts — no term-keyed SMJ exists in any
  * shipped q96 plan (the bench plan sidecars show BroadcastHashJoin).
  * The skew question only arises at the real-corpus shape where the
  * vocabulary itself outgrows the broadcast threshold (100M+ distinct
  * terms ≈ GBs of df rows). This tool builds that shape synthetically:
  * each doc = 5 shared stopwords + 20 doc-unique terms, so at N docs the
  * vocabulary is 20N+5 (far past broadcast — the join plans SMJ/SHJ
  * naturally, no threshold forcing) and each stopword's postings are an
  * N-row hot key in the term exchange while the median term has 1.
  *
  * Threshold scaling (documented, not silent): locally the whole tf
  * stream is a few GB, so a stopword partition is ~100–200 MB — the
  * SHAPE of the 100 TB problem at 1/1000 the bytes. The trigger
  * `max(skewedPartitionThresholdInBytes, factor × median)` is therefore
  * scaled to (32 MB, 2.0×) from the defaults (256 MB, 5×), which at real
  * scale a tens-of-GB stopword partition vs a 64 MB median clears by
  * orders of magnitude either way.
  *
  * ROUND-13 FINDING (first measurement, cells skew_on/skew_off): even
  * with the scaled trigger, `skew_marked_joins = 0` in every cell — the
  * df side's final HashAggregate sits directly on the term exchange the
  * join reuses, and `OptimizeSkewedJoin` only rewrites joins whose
  * children are plain shuffle reads. AQE never splits this shape; the
  * fix went structural (`Retrieval.tfidfTopTerms` heavy-hitter routing:
  * hot terms broadcast around the exchange, cold tail df-bounded).
  * Cells since then (interleaved, one session — the same-phase rule):
  *   - routed — heavy-hitter routing at the default hotTerms
  *   - plain  — hotTerms=0 (the old single term-join; skew-join conf
  *              left ENABLED, which the finding shows never fires)
  * Each cell reports wall, GC, shuffle bytes, and the task-duration
  * tail (max / p50), plus how many join nodes in the FINAL adaptive
  * plan carry the skew=true mark (expected 0 — kept as the tripwire
  * that would detect AQE starting to handle the shape).
  *
  * Usage: `runMain graft.tools.SkewPhase [nDocs] [topM]`;
  * `SPARK_GRAFT_PHASE_RUNS` = interleaved rounds (default 2).
  */
object SkewPhase {

  private class TaskDurations extends SparkListener {
    private val durs =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    private val names =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null) durs.add((t.stageId, t.taskInfo.duration))
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      names.put(s.stageInfo.stageId,
        s.stageInfo.name.takeWhile(_ != '\n').take(60))
    def nameOf(sid: Int): String = Option(names.get(sid)).getOrElse("?")
    def reset(): Unit = durs.clear()
    def snapshot(): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      durs.asScala.map(_._2).toSeq.sorted
    }
    /** Worst stages by max task duration: (stageId, maxTaskSec, nTasks) —
      * names the straggler STAGE, not just the straggler task. */
    def worstStages(n: Int): Seq[(Int, Double, Int)] = {
      import scala.jdk.CollectionConverters._
      durs.asScala.toSeq.groupBy(_._1).map { case (sid, xs) =>
        (sid, xs.map(_._2).max / 1e3, xs.size)
      }.toSeq.sortBy(-_._2).take(n)
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(4000000L)
    val topM = args.lift(1).map(_.toInt).getOrElse(3)
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PHASE_RUNS", "2").toInt
    val data = s"target/skewdocs_$nDocs.parquet"

    val spark = GraftSession.localFromEnv()
    if (!Files.exists(Paths.get(data))) {
      // 5 corpus-wide stopwords + 20 doc-unique terms per doc; pure
      // codegen'd expressions, 32-way spread so generation parallelizes.
      spark.range(nDocs).repartition(32).selectExpr(
        "id AS doc_id",
        "concat('the of and to in ', concat_ws(' ', " +
          "transform(sequence(0, 19), j -> concat('t', id, 'x', j)))) AS text")
        .write.mode("overwrite").parquet(data)
    }
    val docs = spark.read.parquet(data)

    // Scaled skew trigger (see scaladoc): the local hot partition is the
    // 100 TB shape at 1/1000 the bytes.
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")

    val census = new TaskMetricsCensus
    spark.sparkContext.addSparkListener(census)
    val tasks = new TaskDurations
    spark.sparkContext.addSparkListener(tasks)
    def drain(): Unit =
      org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
    def dec(v: Double, scale: Int): String =
      BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString

    // Cells: "auto" exercises the round-14 default (-1 = census-routed;
    // at 4M docs a stopword's est df × 40 B ≈ 160 MB > the 128 MB task
    // threshold, so the census must pick the hot route — the artifact's
    // route_hot field is read from the actual plan, not the intent);
    // "routed"/"plain" stay as the forced A/B cells.
    for (i <- 1 to rounds; cell <- Seq("auto", "routed", "plain")) {
      drain(); census.reset(); tasks.reset()
      val hot = cell match {
        case "auto" => -1
        case "routed" => 4096
        case _ => 0
      }
      // t0 BEFORE construction: the routed cell's bounded heavy-hitter
      // close runs a job at DataFrame build time and must be charged to
      // its own cell's wall.
      val t0 = System.nanoTime()
      val out = Retrieval.tfidfTopTerms(docs, "doc_id", "text", topM, hot)
      val qe = out.queryExecution
      // Materialize through the query's OWN execution (not a write's) so
      // the final adaptive plan — with any skew=true join marks — is
      // inspectable on `qe` afterwards.
      val n = qe.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      drain()
      val plan = qe.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val skewJoins = "skew=true".r.findAllIn(plan).length
      // The hot route's signature: the `graft_hot_terms` subquery alias
      // the router stamps on the hot broadcast frame (analyzed plan —
      // unambiguous; a bare `Union` test would false-positive on any
      // future unrelated Union) corroborated by the hot/cold Union in
      // the physical plan. This is how the "auto" cell PROVES which
      // route the census picked.
      val routeHot = qe.analyzed.toString.contains("graft_hot_terms") &&
        plan.contains("Union")
      val durs = tasks.snapshot()
      val maxTask = durs.lastOption.getOrElse(0L) / 1e3
      val p50Task = if (durs.isEmpty) 0.0 else durs(durs.size / 2) / 1e3
      val worst = tasks.worstStages(3).map { case (sid, mx, nt) =>
        s"""{"stage":"${tasks.nameOf(sid)}","max_task_s":${dec(mx, 1)},""" +
          s""""n_tasks":$nt}"""
      }.mkString("[", ",", "]")
      println(s"""{"tool":"skew_phase","n_docs":$nDocs,"round":$i,""" +
        s""""cell":"$cell","sec":${dec(dt, 1)},"rows":$n,""" +
        s""""skew_marked_joins":$skewJoins,"route_hot":$routeHot,""" +
        s""""max_task_s":${dec(maxTask, 1)},"p50_task_s":${dec(p50Task, 2)},""" +
        s""""n_tasks":${durs.length},""" +
        s""""gc_s":${dec(census.gcMs.get / 1e3, 1)},""" +
        s""""shuffle_write_gb":${dec(census.shufWrite.get / 1e9, 3)},""" +
        s""""shuffle_read_gb":${dec(census.shufRead.get / 1e9, 3)},""" +
        s""""disk_spill_gb":${dec(census.diskSpill.get / 1e9, 3)},""" +
        s""""peak_task_mem_mb":${dec(census.peakTaskMem.get / 1e6, 0)},""" +
        s""""worst_stages":$worst}""")
      if (i == 1 && sys.env.contains("SPARK_GRAFT_SKEW_PLAN_OUT"))
        java.nio.file.Files.writeString(
          Paths.get(sys.env("SPARK_GRAFT_SKEW_PLAN_OUT") + s".$cell.txt"), plan)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
