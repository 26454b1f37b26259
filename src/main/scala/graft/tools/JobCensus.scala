package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import graft.{GraftSession, SparkEntry}

/** Dev-only: per-JOB wall breakdown of named registry queries — the
  * round-18 measurement for queries whose sf0.1 wall is job-count-bound
  * rather than byte-bound (VERDICT r17 #5/#7): prints every Spark job a
  * query submits (duration, stage count, task count, description /
  * call site), so fixed per-action overhead is attributable to the
  * operator that pays it.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.tools.JobCensus
  * q100_tfidf_indexed [more...]` (SPARK_GRAFT_RUNS repeats, default 2 —
  * run 1 is cold, later runs show the steady state).
  */
object JobCensus {
  private final case class JobRow(id: Int, desc: String, stages: Int,
                                  var tasks: Int, start: Long,
                                  var end: Long)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val spark = GraftSession.localFromEnv()
    val jobs = mutable.LinkedHashMap.empty[Int, JobRow]
    val stages = mutable.ArrayBuffer.empty[(Int, String, Int, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .orElse(j.stageInfos.sortBy(_.stageId).lastOption.map(si =>
              si.name.take(60) + " @ " + si.details.linesIterator
                .find(l => l.contains("graft") && !l.contains("JobCensus"))
                .getOrElse("").trim.take(80)))
            .getOrElse("?")
          jobs(j.jobId) = JobRow(j.jobId, desc, j.stageInfos.length,
            j.stageInfos.map(_.numTasks).sum, j.time, 0L)
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(j.jobId).foreach(_.end = j.time)
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = s.stageInfo
          val ms = (for {t0 <- si.submissionTime; t1 <- si.completionTime}
            yield t1 - t0).getOrElse(0L)
          stages += ((si.stageId, si.name.take(60), si.numTasks, ms))
        }
    })
    // SPARK_GRAFT_PLAN=1: also print the EXECUTED (final-AQE) plan of
    // each run's noop write — the bench sidecars carry only the
    // pre-execution plan (isFinalPlan=false), which hides which shuffle
    // reads AQE actually coalesced.
    val dumpPlan = sys.env.get("SPARK_GRAFT_PLAN").contains("1")
    if (dumpPlan) spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          println(s"[jobcensus] executed plan ($funcName):\n" +
            qe.executedPlan.toString.take(12000))
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    def drain(): Unit =
      org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
    Seq("lineitem", "documents", "events", "embeddings")
      .find(t => java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$sfDir/$t.parquet")))
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())

    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      (1 to runs).foreach { r =>
        drain(); jobs.synchronized { jobs.clear(); stages.clear() }
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        drain()
        spark.catalog.clearCache()
        val rows = jobs.synchronized(jobs.values.toSeq)
        val jobWall = rows.map(j => (j.end - j.start).max(0L)).sum / 1e3
        println(f"[jobcensus] $name r$r: wall $wall%.3f s, " +
          f"${rows.length} jobs (in-job ${jobWall}%.3f s, " +
          f"gaps ${wall - jobWall}%.3f s)")
        rows.foreach { j =>
          println(f"[jobcensus]   job ${j.id}%3d ${(j.end - j.start).max(0L) / 1e3}%7.3f s " +
            f"stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(110)}")
        }
        jobs.synchronized(stages.toSeq).sortBy(_._1).foreach {
          case (sid, nm, nt, ms) =>
            println(f"[jobcensus]   stage $sid%3d ${ms / 1e3}%7.3f s tasks=$nt%4d  $nm")
        }
      }
    }
    spark.stop()
  }
}
