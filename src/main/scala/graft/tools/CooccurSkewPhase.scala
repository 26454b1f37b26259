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
  * Usage: `runMain graft.tools.CooccurSkewPhase [nDocs] [pool]`
  * (defaults 1000000, 100000).
  */
object CooccurSkewPhase {

  private class TaskDurations extends SparkListener {
    private val durs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null) durs.add(t.taskInfo.duration)
    def reset(): Unit = durs.clear()
    def snapshot(): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      durs.asScala.toSeq.sorted
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

    for (i <- 1 to rounds) {
      drain(); census.reset(); tasks.reset()
      val t0 = System.nanoTime()
      val out = Cooccur.pmiPairs(docs, "doc_id", "text", minPairDf = 2L)
      val rows = out.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      drain()
      val durs = tasks.snapshot()
      val maxTask = durs.lastOption.getOrElse(0L) / 1e3
      val p50Task = if (durs.isEmpty) 0.0 else durs(durs.size / 2) / 1e3
      // Structural witness: the hottest term_a group in the SURVIVING
      // pair stream — the row count one task owns in the df join. The
      // claim under test: ≤ pool (vocabulary-bounded), ≪ nDocs.
      val hot = out.groupBy(col("term_a"))
        .agg(count(lit(1)).as("c")).orderBy(col("c").desc)
        .limit(1).collect()(0)
      println(s"""{"tool":"cooccur_skew_phase","n_docs":$nDocs,""" +
        s""""pool":$pool,"round":$i,"sec":${dec(dt, 1)},"rows":$rows,""" +
        s""""hot_term_a":"${hot.getString(0)}",""" +
        s""""hot_term_a_pairs":${hot.getLong(1)},""" +
        s""""max_task_s":${dec(maxTask, 1)},"p50_task_s":${dec(p50Task, 2)},""" +
        s""""gc_s":${dec(census.gcMs.get / 1e3, 1)},""" +
        s""""shuffle_write_gb":${dec(census.shufWrite.get / 1e9, 3)},""" +
        s""""disk_spill_gb":${dec(census.diskSpill.get / 1e9, 3)},""" +
        s""""peak_task_mem_mb":${dec(census.peakTaskMem.get / 1e6, 0)}}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
