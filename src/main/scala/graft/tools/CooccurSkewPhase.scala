package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.{GraftSession, TaskMetricsCensus}
import graft.text.Cooccur

/** Dev-only: the census/router toolkit pointed at the NEXT-largest
  * term-keyed exchange (round-14 verdict stretch #8) — `Cooccur.pmiPairs`'
  * pair⋈df joins. The q96/q100 hazard was a stopword's POSTINGS run
  * (df ≈ N_docs rows behind one key, growing with the corpus); the PMI
  * shape is structurally different and the expected verdict is "no
  * hazard":
  *
  *   - the pair AGGREGATE groups on the (term_a, term_b) PAIR, so a
  *     stopword's rows spread across its distinct co-occurring partners
  *     — no single hot key exists in that exchange;
  *   - the pair⋈df joins key on term_a/term_b AFTER the aggregate +
  *     `minPairDf` filter, where a hot term's fan-out is bounded by the
  *     VOCABULARY it co-occurs with (≤ distinct partners), never by its
  *     document frequency — the quantity that grows with corpus size.
  *
  * This tool measures that claim instead of asserting it, on a corpus
  * built so stopword pairs actually SURVIVE the filter (each doc = 5
  * corpus-wide stopwords + 20 terms from a `pool`-sized mid-frequency
  * vocabulary; at the defaults a stopword×pool pair has pair_df ≈
  * 20·N/pool ≈ 200 ≫ minPairDf, so term_a = stopword carries ~pool rows
  * into the df join — the worst case the shape allows). Reported per
  * round: wall, max/p50 task, GC, shuffle, and the structural witness —
  * the largest term_a group in the surviving pair stream vs the pool
  * size (vocabulary-bounded ⇔ ratio ≤ 1) vs N_docs (the hazard that
  * does NOT materialize).
  *
  * ROUND-15 FINDING (the first run of this audit): the predicted hazard
  * is indeed absent — but the stage-attributed task tail exposed a
  * DIFFERENT one. AQE's partition coalescing sized the doc-keyed
  * exchange feeding the self-join by its INPUT bytes (~0.5 GB →
  * single-digit partition counts at the 64 MB advisory), blind to the
  * per-doc QUADRATIC inside the stage (×~25 row blow-up + a pair-sized
  * hash aggregate). `pmiPairs` now pins that exchange at the session's
  * shuffle width (`pinDocPartitions`, default true — an explicit-count
  * repartition AQE never coalesces); the cells here are the interleaved
  * A/B. Committed warm cells: coalesced 56.7 s wall / 31.0 s max task /
  * 1.5 GB peak task mem vs pinned 33.2 s / 5.5 s / 0.4 GB.
  *
  * Usage: `runMain graft.tools.CooccurSkewPhase [nDocs] [pool]`
  * (defaults 1000000, 100000).
  */
object CooccurSkewPhase {

  private class TaskDurations extends SparkListener {
    private val durs =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    private val names =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null) durs.add((t.stageId, t.taskInfo.duration))
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      names.put(s.stageInfo.stageId,
        s.stageInfo.name.takeWhile(_ != '\n').take(60))
    def nameOf(sid: Int): String = Option(names.get(sid)).getOrElse("?")
    def reset(): Unit = durs.clear()
    def snapshot(): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      durs.asScala.map(_._2).toSeq.sorted
    }
    /** Worst stages by max task duration: names the straggler STAGE. */
    def worstStages(n: Int): Seq[(Int, Double, Int)] = {
      import scala.jdk.CollectionConverters._
      durs.asScala.toSeq.groupBy(_._1).map { case (sid, xs) =>
        (sid, xs.map(_._2).max / 1e3, xs.size)
      }.toSeq.sortBy(-_._2).take(n)
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val pool = args.lift(1).map(_.toLong).getOrElse(100000L)
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PHASE_RUNS", "2").toInt
    val data = s"target/cooccurdocs_${nDocs}_$pool.parquet"
    val spark = GraftSession.localFromEnv()
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(data))) {
      spark.range(nDocs).repartition(32).selectExpr(
        "id AS doc_id",
        s"concat('the of and to in ', concat_ws(' ', " +
          s"transform(sequence(0, 19), " +
          s"j -> concat('p', pmod(xxhash64(id, j), ${pool}L))))) AS text")
        .write.mode("overwrite").parquet(data)
    }
    val docs = spark.read.parquet(data)
    val census = new TaskMetricsCensus
    spark.sparkContext.addSparkListener(census)
    val tasks = new TaskDurations
    spark.sparkContext.addSparkListener(tasks)
    def drain(): Unit =
      org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
    def dec(v: Double, s: Int): String =
      BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toString

    // Cell order alternates per round (the IndexBuildPhase lesson: a
    // fixed order reads the monotone JVM-warmup trend as a cell
    // difference). `pinned` = the shipped default (doc exchange at full
    // shuffle width); `coalesced` = the pre-fix control (AQE sizes the
    // exchange by input bytes, blind to the in-stage quadratic).
    for (i <- 1 to rounds;
         cell <- if (i % 2 == 1) Seq("pinned", "coalesced")
                 else Seq("coalesced", "pinned")) {
      drain(); census.reset(); tasks.reset()
      val t0 = System.nanoTime()
      val out = Cooccur.pmiPairs(docs, "doc_id", "text", minPairDf = 2L,
        pinDocPartitions = cell == "pinned")
      val rows = out.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      drain()
      // Snapshot the CELL's tasks/metrics BEFORE the witness query below
      // re-executes the pipeline (the first cut of this tool let the
      // witness's second execution pollute the cell's task tail and
      // double-count its shuffle — metrics must describe the timed run).
      val durs = tasks.snapshot()
      val maxTask = durs.lastOption.getOrElse(0L) / 1e3
      val p50Task = if (durs.isEmpty) 0.0 else durs(durs.size / 2) / 1e3
      val worst = tasks.worstStages(3).map { case (sid, mx, nt) =>
        s"""{"stage":"${tasks.nameOf(sid)}","max_task_s":${dec(mx, 1)},""" +
          s""""n_tasks":$nt}"""
      }.mkString("[", ",", "]")
      val gc = census.gcMs.get / 1e3
      val shufW = census.shufWrite.get / 1e9
      val spill = census.diskSpill.get / 1e9
      val peak = census.peakTaskMem.get / 1e6
      // Structural witness: the hottest term_a group in the SURVIVING
      // pair stream — the row count one task owns in the df join. The
      // claim under test: ≤ pool (vocabulary-bounded), ≪ nDocs.
      val hot = out.groupBy(col("term_a"))
        .agg(count(lit(1)).as("c")).orderBy(col("c").desc)
        .limit(1).collect()(0)
      println(s"""{"tool":"cooccur_skew_phase","n_docs":$nDocs,""" +
        s""""pool":$pool,"round":$i,"cell":"$cell",""" +
        s""""sec":${dec(dt, 1)},"rows":$rows,""" +
        s""""hot_term_a":"${hot.getString(0)}",""" +
        s""""hot_term_a_pairs":${hot.getLong(1)},""" +
        s""""max_task_s":${dec(maxTask, 1)},"p50_task_s":${dec(p50Task, 2)},""" +
        s""""n_tasks":${durs.length},"worst_stages":$worst,""" +
        s""""gc_s":${dec(gc, 1)},""" +
        s""""shuffle_write_gb":${dec(shufW, 3)},""" +
        s""""disk_spill_gb":${dec(spill, 3)},""" +
        s""""peak_task_mem_mb":${dec(peak, 0)}}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
