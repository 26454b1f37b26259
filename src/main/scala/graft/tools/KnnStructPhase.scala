package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, TaskMetricsCensus}
import graft.similarity.Similarity

/** Dev-only: the STRUCTURED-LABEL decade point for the kNN label-audit
  * routes (round-14 verdict #5). The emb2m A/B measured wall/GC honestly
  * but its labels are near-random w.r.t. geometry (ScaleUp rotations
  * decouple them), so per-vector verdicts sat on knife-edge 5-NN votes
  * and route agreement read 0.636 — a property of the corpus, not the
  * routes. This tool generates a 2M-vector corpus where labels MEAN
  * something and the audit has a ground truth:
  *
  *   - `clusters` well-separated centers in [-1,1)^64 (center component
  *     from xxhash64(cluster, dim); inter-center distance ~6.5 vs
  *     intra-cluster noise ±0.05/dim ⇒ 5-NN is same-cluster with
  *     overwhelming margin);
  *   - every vector's label = its cluster, EXCEPT a deterministic ~1%
  *     planted mislabels (label rotated to a different cluster, flagged
  *     in a `planted` column the audit never sees).
  *
  * A correct audit flags exactly the planted rows (agree=0) and passes
  * the clean ones; the cells report, per route (exact-scoring IVF vs
  * IVF-PQ compressed scan), wall/GC/shuffle plus planted-recall and
  * clean-false-flag rates, and the cross-route VERDICT agreement — the
  * number the round-14 verdict asked to see ≈ 1 on structured labels at
  * scale.
  *
  * Usage: `runMain graft.tools.KnnStructPhase [n] [clusters] [k] [probes]`
  * (defaults 2000000, 200, 5, 4 — the q94 decade-point shape).
  */
object KnnStructPhase {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val clusters = args.lift(1).map(_.toInt).getOrElse(200)
    val k = args.lift(2).map(_.toInt).getOrElse(5)
    val probes = args.lift(3).map(_.toInt).getOrElse(4)
    val dir = s"target/embstruct_$n"
    val spark = GraftSession.localFromEnv()
    val census = new TaskMetricsCensus
    spark.sparkContext.addSparkListener(census)
    def drain(): Unit =
      org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
    def dec(v: Double, scale: Int): String =
      BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir))) {
      spark.range(n).repartition(32)
        .selectExpr("id AS vec_id",
          s"cast(pmod(id, $clusters) AS int) AS cluster",
          "pmod(xxhash64(id, 17L), 100L) = 0L AS planted")
        .selectExpr("vec_id", "cluster", "planted",
          s"""cast(CASE WHEN planted
              THEN pmod(cluster + 1L + pmod(xxhash64(vec_id, 23L), ${clusters - 1}L), ${clusters}L)
              ELSE cluster END AS int) AS label""",
          """transform(sequence(0, 63), j -> cast(
              (pmod(xxhash64(cluster, j), 2000L) - 1000L) / 1000.0
              + (pmod(xxhash64(vec_id, j, 5L), 200L) - 100L) / 2000.0
              AS float)) AS embedding""")
        .write.mode("overwrite").parquet(dir)
    }
    val emb = spark.read.parquet(dir)
    emb.count() // warm the read path outside either cell's wall

    for (cell <- Seq("ivf_exact", "ivf_pq")) {
      drain(); census.reset()
      val out = s"target/knnstruct_$cell.parquet"
      val t0 = System.nanoTime()
      Similarity.knnLabels(emb, "vec_id", "embedding", "label",
          k = k, probes = probes, pq = cell == "ivf_pq")
        .write.mode("overwrite").parquet(out)
      val dt = (System.nanoTime() - t0) / 1e9
      drain()
      println(s"""{"tool":"knn_struct_phase","cell":"$cell","n":$n,""" +
        s""""clusters":$clusters,"k":$k,"probes":$probes,""" +
        s""""sec":${dec(dt, 1)},""" +
        s""""gc_s":${dec(census.gcMs.get / 1e3, 1)},""" +
        s""""shuffle_write_gb":${dec(census.shufWrite.get / 1e9, 3)},""" +
        s""""shuffle_read_gb":${dec(census.shufRead.get / 1e9, 3)},""" +
        s""""disk_spill_gb":${dec(census.diskSpill.get / 1e9, 3)},""" +
        s""""peak_task_mem_mb":${dec(census.peakTaskMem.get / 1e6, 0)}}""")
      spark.catalog.clearCache()
    }

    val planted = emb.select(col("vec_id"), col("planted"))
    def route(cell: String, tag: String) =
      spark.read.parquet(s"target/knnstruct_$cell.parquet")
        .select(col("vec_id"), col("label_pred").as(s"p_$tag"),
          col("agree").as(s"ag_$tag"))
    val j = route("ivf_exact", "ivf").join(route("ivf_pq", "pq"),
        Seq("vec_id"), "full_outer")
      .join(planted, Seq("vec_id"), "left_outer")
      .agg(count(lit(1)).as("n"),
        sum(when(col("p_ivf").isNull || col("p_pq").isNull, 1L)
          .otherwise(0L)).as("only_one"),
        avg((col("p_ivf") === col("p_pq")).cast("double"))
          .as("route_agreement"),
        avg((col("ag_ivf") === col("ag_pq")).cast("double"))
          .as("verdict_agreement"),
        // the audit's job: flag the planted mislabels, pass the rest
        avg(when(col("planted"), lit(1.0) - col("ag_ivf").cast("double")))
          .as("ivf_planted_recall"),
        avg(when(col("planted"), lit(1.0) - col("ag_pq").cast("double")))
          .as("pq_planted_recall"),
        avg(when(!col("planted"), lit(1.0) - col("ag_ivf").cast("double")))
          .as("ivf_clean_flag_rate"),
        avg(when(!col("planted"), lit(1.0) - col("ag_pq").cast("double")))
          .as("pq_clean_flag_rate"))
      .collect()(0)
    println(s"""{"tool":"knn_struct_phase","cell":"agreement",""" +
      s""""n":${j.getAs[Long]("n")},"only_one_route":${j.getAs[Long]("only_one")},""" +
      s""""route_agreement":${dec(j.getAs[Double]("route_agreement"), 4)},""" +
      s""""verdict_agreement":${dec(j.getAs[Double]("verdict_agreement"), 4)},""" +
      s""""ivf_planted_recall":${dec(j.getAs[Double]("ivf_planted_recall"), 4)},""" +
      s""""pq_planted_recall":${dec(j.getAs[Double]("pq_planted_recall"), 4)},""" +
      s""""ivf_clean_flag_rate":${dec(j.getAs[Double]("ivf_clean_flag_rate"), 4)},""" +
      s""""pq_clean_flag_rate":${dec(j.getAs[Double]("pq_clean_flag_rate"), 4)}}""")
    spark.stop()
  }
}
