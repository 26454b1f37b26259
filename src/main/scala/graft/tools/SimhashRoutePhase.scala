package graft.tools

import graft.{GraftSession, Tables}
import graft.dedup.Dedup

/** Dev-only: SAME-PHASE wall-time adjudication of the simhash pair
  * kernel's two routes (the round-10 rule: cross-phase comparisons on
  * this host carry a documented 2.9× weather band, so a route decision
  * needs both routes measured back-to-back in one session). For each
  * corpus argument, times one-level and two-level banding alternately
  * (interleaved, 2 runs each, noop-write action like the Bench
  * harness) and prints every run.
  *
  * Usage: `runMain graft.tools.SimhashRoutePhase <sfDir> [<sfDir> ...]`
  * Env knobs for decade-4 corpora where a full 2×2 grid would take
  * hours: `SPARK_GRAFT_ROUTE_RUNS` (default 2 interleaved rounds) and
  * `SPARK_GRAFT_ROUTES` (default "one,two" — set "two" to time only
  * the shipped route and let the work census speak for the other).
  */
object SimhashRoutePhase {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("target/sf10full")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUTE_RUNS", "2").toInt
    val routes = sys.env.getOrElse("SPARK_GRAFT_ROUTES", "one,two")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val spark = GraftSession.localFromEnv()
    for (dir <- dirs) {
      val docs = Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
      // warm the scan
      spark.read.parquet(s"$dir/documents.parquet").count()
      def run(tag: String, occ: Double): Double = {
        val t0 = System.nanoTime()
        Dedup.simhashPairs(docs, "doc_id", "text", bits = 60, maxDist = 3,
            maxMeanOccupancy = occ)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[route-phase] $dir $tag%-10s ${dt}%.1f s")
        spark.catalog.clearCache()
        dt
      }
      // Interleave so neither route monopolizes a weather phase.
      for (i <- 1 to rounds; r <- routes) r match {
        case "one" => run(s"one-level/$i", Double.MaxValue)
        case "two" => run(s"two-level/$i", 0.0)
        case other => sys.error(s"unknown route '$other'")
      }
    }
    spark.stop()
  }
}
