package graft


/** Dev tool: print formatted physical plans for selected queries so scan
  * pushdown (PushedFilters/ReadSchema), join strategies (broadcast vs
  * shuffle), and Exchange counts can be audited per round.
  *
  * Usage: sbt "runMain graft.PlanAudit [sfDir] [queryName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q01_pricing_summary", "q02_filter_project", "q03_region_rollup",
        "q04_revenue_segment", "q15_ohlcv_hourly", "q18_asof_join",
        "q27_ngram_jaccard", "q28_minhash_lsh", "q31_langid",
        "q34_lsh_topk", "q71_ivf_ann", "q73_asof_salted")
    val spark = GraftSession.local("4")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
