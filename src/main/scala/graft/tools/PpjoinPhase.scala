package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.dedup.Dedup

/** Dev-only: per-stage wall breakdown of one ngramJaccard pass at the
  * bench shape (q27: sf0.1 documents, n=3, t=0.8) — separates the doc
  * kernel, the hot/stop census, candidate generation, and verify so the
  * family's fixed overhead is attributable. Also counts Spark jobs per
  * stage (the sf0.1 floor is job-count-bound, not byte-bound). */
object PpjoinPhase {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = GraftSession.localFromEnv()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    (1 to runs).foreach { r =>
      val docs0 = Tables.documents(spark, sfDir)
      def cell[T](tag: String)(body: => T): T = {
        org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        val out = body
        org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
        println(f"[ppjphase] r$r $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s, ${jobs.get() - j0} jobs")
        out
      }
      val pairs = cell("pairs_total") {
        val p = Dedup.ngramJaccard(docs0, "doc_id", "text", n = 3,
          threshold = 0.8)
        p.write.format("noop").mode("overwrite").save()
        p
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
