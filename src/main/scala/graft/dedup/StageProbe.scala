package graft.dedup

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.{GraftSession, Tables}

/** Dev-only per-stage timing of the q27/q28 dedup pipelines — the probe
  * that localizes scale-ladder residue to a stage instead of arguing
  * about the whole query. `runMain graft.dedup.StageProbe [sfDir] [q27|q28]`.
  *
  * Each stage materializes via count()/noop so the timings compose the
  * way the real query does (caches included, same parameters as the
  * registered queries: n=3, threshold=0.8, 12 hashes / 4 bands for q28). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("q28")
    val spark = GraftSession.localFromEnv()
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docsIn = {
      val df = Tables.documents(spark, sfDir)
      val par = spark.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions * 2 >= par) df else df.repartition(par)
    }
    val (id, text, n, threshold) = ("doc_id", "text", 3, 0.8)

    val arrs = Dedup.docShingleArrays(docsIn, id, text, n)
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("arrs (shingle kernel)") { arrs.count() }

    which match {
      case "q27" =>
        val (hot, stop) = timed("hotStopFrequent") {
          val (order, stopSet, freqSet) = Dedup.hotStopFrequent(arrs, 512,
            Dedup.DefaultMaxDf, sys.env.getOrElse("PROBE_TOPK", "0").toInt)
          println(s"[probe]   frequent=${freqSet.length}")
          (order, stopSet)
        }
        println(s"[probe]   order=${hot.length} stop=${stop.length}")
        val docs = Dedup.ppjoinDocsKernel(arrs, id, threshold, hot, stop)
          .persist(StorageLevel.MEMORY_AND_DISK)
        timed("ppjoinDocsKernel") { docs.count() }
        val prefixed = docs.select(col(id).as("__id"), col("sz"),
          posexplode(col("pre")).as(Seq("pos", "shingle")))
        println(s"[probe]   prefix rows=${timed("prefix explode count") { prefixed.count() }}")
        val cand = Dedup.ppjoinCandidates(prefixed, docsIn.schema(id).dataType,
          threshold).persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[probe]   candidates=${timed("ppjoinCandidates") { cand.count() }}")
        val out = Dedup.verifyJaccardArrays(
          docs.select(col(id), col("arr"), col("sz")), id, cand, threshold)
        println(s"[probe]   pairs=${timed("verifyJaccardArrays") { out.count() }}")

      case "q28" =>
        val (_, stop) = timed("hotAndStop") {
          Dedup.hotAndStop(arrs, Dedup.DefaultMaxDf, Dedup.DefaultMaxDf)
        }
        println(s"[probe]   stop=${stop.length}")
        val mh = Dedup.minhashSignatureKernel(arrs, id, stop,
            numHashes = 12, rowsPerBand = 3)
          .persist(StorageLevel.MEMORY_AND_DISK)
        timed("minhashSignatureKernel") { mh.count() }
        val cand = Dedup.bandedCandidates(mh, id, numHashes = 12, rowsPerBand = 3)
          .persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[probe]   candidates=${timed("banded candidates kernel") { cand.count() }}")
        val out = Dedup.verifyJaccardArrays(
          mh.select(col(id), col("arr"), col("sz")), id, cand, threshold)
        println(s"[probe]   pairs=${timed("verifyJaccardArrays") { out.count() }}")

      case other => sys.error(s"unknown probe target $other")
    }
    spark.stop()
  }
}
