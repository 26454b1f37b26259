package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, TaskMetricsCensus}
import graft.similarity.Similarity

/** Dev-only: SAME-PHASE A/B of the two [[Similarity.knnLabels]] neighbor
  * routes at decade scale — exact-scoring IVF (the registered q94 path)
  * vs the IVF-PQ compressed scan (`pq = true`, the round-13 verdict's
  * documented 100 TB route). Round 13 landed the CLAIM ("q78 IVF-PQ is
  * the compressed-scan route for label audits"); this tool turns it into
  * a measured point: wall/GC/shuffle per route, plus the route-agreement
  * numbers that say what the compression costs in audit quality —
  * fraction of vectors where both routes predict the same label, and
  * each route's own stored-label agreement rate (the audit's output
  * signal).
  *
  * Each route materializes its verdict ONCE to parquet (timed; same sink
  * both cells, so the comparison is internally consistent) and the
  * agreement join reads the two artifacts back — no route runs twice.
  *
  * Usage: `runMain graft.tools.KnnRoutePhase [embDir] [k] [probes]`
  * (defaults target/emb2m, 5, 4 — the q94 decade-point shape).
  */
object KnnRoutePhase {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/emb2m")
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val probes = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = GraftSession.localFromEnv()
    val census = new TaskMetricsCensus
    spark.sparkContext.addSparkListener(census)
    def drain(): Unit =
      org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
    def dec(v: Double, scale: Int): String =
      BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString

    val emb = graft.Tables.embeddings(spark, dir)
    emb.count() // warm the read path outside either cell's wall

    for (cell <- Seq("ivf_exact", "ivf_pq")) {
      drain(); census.reset()
      val out = s"target/knnroute_$cell.parquet"
      val t0 = System.nanoTime()
      Similarity.knnLabels(emb, "vec_id", "embedding", "label",
          k = k, probes = probes, pq = cell == "ivf_pq")
        .write.mode("overwrite").parquet(out)
      val dt = (System.nanoTime() - t0) / 1e9
      drain()
      println(s"""{"tool":"knn_route_phase","cell":"$cell","dir":"$dir",""" +
        s""""k":$k,"probes":$probes,"sec":${dec(dt, 1)},""" +
        s""""gc_s":${dec(census.gcMs.get / 1e3, 1)},""" +
        s""""shuffle_write_gb":${dec(census.shufWrite.get / 1e9, 3)},""" +
        s""""shuffle_read_gb":${dec(census.shufRead.get / 1e9, 3)},""" +
        s""""disk_spill_gb":${dec(census.diskSpill.get / 1e9, 3)},""" +
        s""""peak_task_mem_mb":${dec(census.peakTaskMem.get / 1e6, 0)}}""")
      spark.catalog.clearCache()
    }

    val a = spark.read.parquet("target/knnroute_ivf_exact.parquet")
      .select(col("vec_id"), col("label_pred").as("p_ivf"),
        col("agree").as("ag_ivf"))
    val b = spark.read.parquet("target/knnroute_ivf_pq.parquet")
      .select(col("vec_id"), col("label_pred").as("p_pq"),
        col("agree").as("ag_pq"))
    val j = a.join(b, Seq("vec_id"), "full_outer")
      .agg(count(lit(1)).as("n"),
        sum(when(col("p_ivf").isNull || col("p_pq").isNull, 1L)
          .otherwise(0L)).as("only_one"),
        avg((col("p_ivf") === col("p_pq")).cast("double")).as("route_agreement"),
        avg(col("ag_ivf").cast("double")).as("ivf_agree_rate"),
        avg(col("ag_pq").cast("double")).as("pq_agree_rate"))
      .collect()(0)
    println(s"""{"tool":"knn_route_phase","cell":"agreement",""" +
      s""""n":${j.getAs[Long]("n")},"only_one_route":${j.getAs[Long]("only_one")},""" +
      s""""route_agreement":${dec(j.getAs[Double]("route_agreement"), 4)},""" +
      s""""ivf_agree_rate":${dec(j.getAs[Double]("ivf_agree_rate"), 4)},""" +
      s""""pq_agree_rate":${dec(j.getAs[Double]("pq_agree_rate"), 4)}}""")
    spark.stop()
  }
}
