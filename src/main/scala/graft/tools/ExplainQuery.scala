package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: print the formatted physical plan of named registry
  * queries — the per-query plan audit the bench sidecar only performs
  * for its top-5 slowest. Planning only; nothing executes.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ExplainQuery
  * q90_lm_perplexity [more...]"` (no args = every registered query).
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.localFromEnv()
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
