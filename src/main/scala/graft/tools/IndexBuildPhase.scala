package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.{GraftSession, TaskMetricsCensus}

/** Dev-only: SAME-PHASE A/B of the postings-index BUILD partitioning —
  * the round-14 fix that `repartitionByRange(term)` puts a stopword's
  * ENTIRE postings run into one build partition (equal range keys
  * cannot split), recreating at build time the very hot key the
  * query-side census router exists for. Cells, interleaved:
  *
  *   - `term`      — the pre-fix control: range on term alone; the
  *                   5 corpus-wide stopwords (df = N docs) each land in
  *                   a single task/file.
  *   - `term_doc`  — the shipped build (`Retrieval.buildPostingsIndex`
  *                   shape): range on (term, doc); hot terms split at
  *                   doc boundaries across partitions while files stay
  *                   term-clustered for the IN pushdown.
  *
  * Each cell reports wall, max/p50 task, GC, shuffle, and — the
  * structural witness — how many output files the hottest term spans
  * (1 in the control by construction; >1 in the shipped build).
  *
  * Usage: `runMain graft.tools.IndexBuildPhase [nDocs]` — reuses
  * SkewPhase's synthetic corpus generator/cache (5 stopwords + 20
  * doc-unique terms per doc).
  */
object IndexBuildPhase {

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
    val nDocs = args.headOption.map(_.toLong).getOrElse(4000000L)
    val data = s"target/skewdocs_$nDocs.parquet"
    val spark = GraftSession.localFromEnv()
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(data))) {
      spark.range(nDocs).repartition(32).selectExpr(
        "id AS doc_id",
        "concat('the of and to in ', concat_ws(' ', " +
          "transform(sequence(0, 19), j -> concat('t', id, 'x', j)))) AS text")
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

    val postings = docs
      .select(col("doc_id").as("doc"), split(col("text"), " ").as("__toks"))
      .select(col("doc"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("doc"), col("dl"))
      .agg(count(lit(1)).cast("long").as("tf"))

    // Cell order ALTERNATES per round: the first cut ran term_doc first
    // in every round and read a monotone JVM-warmup trend (gc 196 → 143
    // → 15 s across consecutive cells regardless of identity) as a cell
    // difference. Compare same-position cells across adjacent rounds.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PHASE_RUNS", "2").toInt
    for (i <- 1 to rounds;
         cell <- if (i % 2 == 1) Seq("term_doc", "term")
                 else Seq("term", "term_doc")) {
      drain(); census.reset(); tasks.reset()
      val out = s"target/idxbuild_$cell"
      val parted =
        if (cell == "term") postings.repartitionByRange(col("term"))
          .sortWithinPartitions(col("term"), col("doc"))
        else postings.repartitionByRange(col("term"), col("doc"))
          .sortWithinPartitions(col("term"), col("doc"))
      val t0 = System.nanoTime()
      parted.write.mode("overwrite").parquet(out)
      val dt = (System.nanoTime() - t0) / 1e9
      drain()
      // Structural witness: files spanned by the hottest stopword.
      val hotFiles = spark.read.parquet(out).filter(col("term") === "the")
        .select(input_file_name().as("f")).distinct().count()
      val durs = tasks.snapshot()
      val maxTask = durs.lastOption.getOrElse(0L) / 1e3
      val p50 = if (durs.isEmpty) 0.0 else durs(durs.size / 2) / 1e3
      println(s"""{"tool":"index_build_phase","n_docs":$nDocs,"round":$i,""" +
        s""""cell":"$cell","sec":${dec(dt, 1)},""" +
        s""""hot_term_files":$hotFiles,""" +
        s""""max_task_s":${dec(maxTask, 1)},"p50_task_s":${dec(p50, 2)},""" +
        s""""gc_s":${dec(census.gcMs.get / 1e3, 1)},""" +
        s""""shuffle_write_gb":${dec(census.shufWrite.get / 1e9, 3)},""" +
        s""""disk_spill_gb":${dec(census.diskSpill.get / 1e9, 3)}}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
