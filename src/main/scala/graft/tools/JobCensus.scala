package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          jobs(j.jobId) = JobRow(j.jobId, desc, j.stageInfos.length,
            j.stageInfos.map(_.numTasks).sum, j.time, 0L)
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(j.jobId).foreach(_.end = j.time)
        }
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
        drain(); jobs.synchronized(jobs.clear())
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
      }
    }
    spark.stop()
  }
}
