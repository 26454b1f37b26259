package graft.tools

import graft.{GraftSession, SparkEntry, TaskMetricsCensus}

/** Dev-only: measures a PIPELINE of registered queries run back-to-back
  * in one session WITHOUT the harness's per-query `clearCache()` — the
  * real-pipeline framing for the cross-operator pair-stream memos
  * ([[graft.dedup.Dedup.ngramJaccardCached]],
  * `Similarity.cosineNearDupPairsCached`): the first consumer pays
  * candidate generation + verify; each later consumer's marginal cost
  * is its own stages only. Bench intentionally measures every query
  * standalone (clearCache between queries); this tool measures the
  * other contract — what a user's q27→q81→q91 session actually costs.
  *
  * Prints one JSON line per query (wall + task-metrics census deltas)
  * and a total. Usage:
  * `runMain graft.tools.PipelinePhase <sfDir> <q1,q2,...> [rounds]`
  * (each round clears all caches first, so rounds are independent).
  */
object PipelinePhase {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1)
      .getOrElse("q27_ngram_jaccard,q81_dedup_clusters,q91_canonical_keep")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val rounds = args.lift(2).map(_.toInt).getOrElse(1)
    val fns = names.map(n => n -> SparkEntry.queries.getOrElse(n,
      sys.error(s"unknown query '$n'")))

    val spark = GraftSession.localFromEnv()
    val census = new TaskMetricsCensus
    spark.sparkContext.addSparkListener(census)
    def drain(): Unit =
      org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
    Seq("lineitem", "documents", "events", "embeddings")
      .find(t => java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/$t.parquet")))
      .foreach(t => spark.read.parquet(s"$dir/$t.parquet").count())
    def dec(v: Double, scale: Int): String =
      BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString

    for (i <- 1 to rounds) {
      graft.dedup.Dedup.clearJaccardCache()
      graft.similarity.Similarity.clearPairCache()
      spark.catalog.clearCache()
      var total = 0.0
      for ((name, fn) <- fns) {
        drain(); census.reset()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        drain()
        total += dt
        println(s"""{"tool":"pipeline_phase","dir":"$dir","round":$i,""" +
          s""""query":"$name","sec":${dec(dt, 1)},""" +
          s""""gc_s":${dec(census.gcMs.get / 1e3, 1)},""" +
          s""""shuffle_write_gb":${dec(census.shufWrite.get / 1e9, 3)},""" +
          s""""peak_task_mem_mb":${dec(census.peakTaskMem.get / 1e6, 0)}}""")
      }
      println(s"""{"tool":"pipeline_phase","dir":"$dir","round":$i,""" +
        s""""total_sec":${dec(total, 1)},"queries":${names.length}}""")
    }
    spark.stop()
  }
}
