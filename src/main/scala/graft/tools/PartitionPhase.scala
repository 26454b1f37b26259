package graft.tools

import graft.{GraftSession, SparkEntry, TaskMetricsCensus}

/** Dev-only: SAME-PHASE adjudication of the shuffle-partition knob for
  * any registered query — the generalization of [[SimhashRoutePhase]]
  * that round 10's q27 measurement (SPARK_GRAFT_SHUFFLE_PARTITIONS=256
  * cut the sf100 decade exponent 1.20 → 1.10) had to do with two
  * separate JVMs across host-weather phases. Here every (partitions,
  * run) cell executes INTERLEAVED in ONE session (the round-11 rule:
  * cross-phase wall times on this host carry a documented 2.9× band),
  * with `spark.sql.shuffle.partitions` set per run — a runtime SQLConf,
  * so each run plans with its own partition count while everything else
  * (heap, code cache, page cache) is held constant.
  *
  * Each run prints one JSON line (wall seconds + the task-metrics
  * census: GC, shuffle IO, spill, peak task memory) so a killed chain
  * still leaves partial evidence, and the partition count each plan
  * actually used is in the line — no sidecar needed for the local[4]
  * tell.
  *
  * Usage: `runMain graft.tools.PartitionPhase <query> <sfDir> [parts]`
  * with `parts` comma-separated (default "32,256"); the token
  * `adaptive` is a cell too — it plans with the engine-default AQE
  * byte-based coalescing (initialPartitionNum from the session build)
  * instead of a pinned count, so pinned-vs-adaptive adjudicates
  * same-phase like any pair of pinned counts.
  * `SPARK_GRAFT_PHASE_RUNS` = interleaved rounds (default 2).
  */
object PartitionPhase {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("q91_canonical_keep")
    val dir = args.lift(1).getOrElse("target/sf10full")
    val parts = args.lift(2).getOrElse("32,256")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PHASE_RUNS", "2").toInt
    val fn = SparkEntry.queries.getOrElse(query,
      sys.error(s"unknown query '$query'"))

    val spark = GraftSession.localFromEnv()
    val census = new TaskMetricsCensus
    spark.sparkContext.addSparkListener(census)
    def drain(): Unit =
      org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
    // warm the scan + codegen paths once, outside any measured cell
    Seq("lineitem", "documents", "events", "embeddings")
      .find(t => java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/$t.parquet")))
      .foreach(t => spark.read.parquet(s"$dir/$t.parquet").count())

    def dec(v: Double, scale: Int): String =
      BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString
    // Interleave so no partition setting monopolizes a weather phase.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    for (i <- 1 to rounds; p <- parts) {
      // Both confs are runtime SQLConfs, so each cell replans with its
      // own partitioning while heap/JIT/page cache stay constant.
      if (p == "adaptive") {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", cpus)
      } else {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", p)
      }
      drain(); census.reset()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      drain()
      // Drop the MEMOIZED pair streams, not just their storage: a memo
      // entry persisted in cell 1 freezes its physical plan (the
      // InMemoryRelation's cachedPlan) under cell 1's partition conf, so
      // a later cell would re-execute that sub-plan at the WRONG setting
      // and blur the A/B. (Bench/Verify don't vary conf per query, so
      // their clearCache()-only hygiene stays correct.)
      graft.dedup.Dedup.clearJaccardCache()
      graft.similarity.Similarity.clearPairCache()
      println(s"""{"tool":"partition_phase","query":"$query","dir":"$dir",""" +
        s""""round":$i,"partitions":"$p","sec":${dec(dt, 1)},""" +
        s""""gc_s":${dec(census.gcMs.get / 1e3, 1)},""" +
        s""""shuffle_write_gb":${dec(census.shufWrite.get / 1e9, 3)},""" +
        s""""shuffle_read_gb":${dec(census.shufRead.get / 1e9, 3)},""" +
        s""""disk_spill_gb":${dec(census.diskSpill.get / 1e9, 3)},""" +
        s""""mem_spill_gb":${dec(census.memSpill.get / 1e9, 3)},""" +
        s""""peak_task_mem_mb":${dec(census.peakTaskMem.get / 1e6, 0)}}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
