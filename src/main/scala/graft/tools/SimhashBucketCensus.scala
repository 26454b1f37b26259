package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.dedup.Dedup

/** Dev-only: (segment, value) bucket occupancy census for the simhash
  * pair kernel (q30) — the measurement behind the
  * [[graft.dedup.Dedup.SimhashMaxMeanOccupancy]] route boundary.
  *
  * The one-level kernel's scan work is Σ C(bucket,2) XOR+popcount probes;
  * with a FIXED segment value space (2^15 = 32,768 for the production
  * 60-bit/4-segment shape) mean bucket size grows linearly in docs, so
  * that work grows n²/2^segBits — the round-10 flag. This census prints,
  * per corpus: occupied buckets, mean/max occupancy, the top-10 bucket
  * sizes (skew vs saturation), Σ C(bucket,2) one-level scan work, the
  * same quantities for the TWO-LEVEL sub-split keying, and the true
  * output pair count — so the route threshold is chosen from measured
  * work ratios, not asserted.
  *
  * Usage: `runMain graft.tools.SimhashBucketCensus <sfDir> [bits] [maxDist]
  * [nooutput]` — the optional 4th arg skips the output-pair count (the
  * only step that runs the full pair kernel; at decade-4 corpora the
  * scan-work census is the point and the multi-billion-row output
  * materialization would dominate the run for no information).
  */
object SimhashBucketCensus {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bits = args.lift(1).map(_.toInt).getOrElse(60)
    val maxDist = args.lift(2).map(_.toInt).getOrElse(3)
    val skipOutput = args.lift(3).contains("nooutput")
    val nSeg = maxDist + 1
    val segBits = bits / nSeg
    val spark = GraftSession.localFromEnv()
    import spark.implicits._

    val docs = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
    val n = docs.count()
    val sh = Dedup.simhash(docs, "doc_id", "text", bits)
      .select(col("simhash")).as[Long]
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    println(s"[census] corpus=$dir docs=$n bits=$bits maxDist=$maxDist " +
      s"segBits=$segBits segSpace=${1L << segBits} " +
      s"meanOccupancy=${n.toDouble / (1L << segBits)}")

    def report(tag: String, keyed: org.apache.spark.sql.Dataset[Long]): Unit = {
      val sizes = keyed.groupByKey(identity).count()
        .toDF("bucket", "sz").persist()
      val stats = sizes.agg(count(lit(1)), avg("sz"), max("sz"),
        sum(expr("sz * (sz - 1) div 2"))).head()
      val top = sizes.orderBy(col("sz").desc).limit(10).collect()
        .map(_.getLong(1))
      println(s"[census] $tag buckets=${stats.getLong(0)} " +
        s"mean=${stats.getDouble(1)} max=${stats.getLong(2)} " +
        s"scan_pairs=${stats.getLong(3)} top10=${top.mkString(",")}")
      sizes.unpersist()
    }

    val segMask = (1L << segBits) - 1
    report("one-level", sh.flatMap { fp =>
      (0 until nSeg).map(s =>
        (s.toLong << segBits) | ((fp >>> (s * segBits)) & segMask))
    })

    val (subPos, _) = Dedup.simhashSubLayout(bits, maxDist)
    val maxSubBits = subPos.map(_.map(_.length).max).max
    report("two-level", sh.flatMap { fp =>
      for { s <- 0 until nSeg; j <- 0 until nSeg } yield {
        val ps = subPos(s)(j)
        var v = 0L; var i = 0
        while (i < ps.length) { v |= ((fp >>> ps(i)) & 1L) << i; i += 1 }
        ((((s * nSeg + j).toLong << segBits) |
          ((fp >>> (s * segBits)) & segMask)) << maxSubBits) | v
      }
    })

    if (!skipOutput) {
      val out = Dedup.simhashPairs(docs, "doc_id", "text", bits, maxDist).count()
      println(s"[census] output_pairs=$out")
    }
    spark.stop()
  }
}
