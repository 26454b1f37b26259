package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Dev-only stage probe for the dedup family: times each pipeline stage
  * of q27/q28 in isolation (materialized through noop) so optimization
  * targets measurement, not guesses. Not part of the driver contract.
  *
  * Round-6 finding #1 (sf10, local[32], round-5 pipeline): the verify
  * joins and candidate kernel were NOT the bottleneck anymore — 75% of
  * q27 end-to-end was MAKING the shingle stream (27.7 of 36.7 s):
  * `distinct()` shuffling 10⁸ string rows, the interpreted `transform`
  * lambda, and the md5→hex→conv round-trip per shingle. Fix:
  * [[Dedup.docShingleArrays]] (per-doc kernel, zero shuffles) + the
  * [[Dedup.hotAndStop]] broadcast sets replacing both full-stream
  * grouping exchanges. Earlier findings (r5, kept for history): verify
  * dominated via sort-merge + `array_intersect` boxing → SHUFFLE_HASH +
  * `sorted_common_count`; candidate Row boxing → primitive tuple kernel. */
object DedupStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val spark = GraftSession.localFromEnv()

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }

    val docsTbl = Tables.documents(spark, sfDir)
    docsTbl.count() // warmup

    val idType = org.apache.spark.sql.types.LongType
    val arrs0 = Dedup.docShingleArrays(docsTbl, "doc_id", "text", 3)
    time("q27/1 per-doc shingle arrays (no shuffle)")(arrs0)
    val arrs = arrs0.cache(); arrs.count()
    val t0 = System.nanoTime()
    val (hot, stop) = Dedup.hotAndStop(arrs, 512, 10000)
    println(f"[probe] q27/2 hot+stop df count: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
      s" (hot=${hot.length}, stop=${stop.length})")
    val docs = Dedup.ppjoinDocsKernel(arrs, "doc_id", 0.8, hot, stop)
    time("q27/3 ppjoin doc build (map over cached arrays)")(docs)
    val docsC = docs.cache(); docsC.count()
    val prefixed = docsC.select(col("doc_id").as("__id"), col("sz"),
      posexplode(col("pre")).as(Seq("pos", "shingle")))
    val cand = Dedup.ppjoinCandidates(prefixed, idType, 0.8)
    time("q27/4 ppjoin candidates (docs cached)")(cand)
    val candC = cand.cache(); candC.count()
    time("q27/5 verify (docs+cand cached)") {
      Dedup.verifyJaccardArrays(
        docsC.select(col("doc_id"), col("arr"), col("sz")),
        "doc_id", candC, 0.8)
    }
    spark.catalog.clearCache()
    time("q27 end-to-end")(
      Dedup.ngramJaccard(docsTbl, "doc_id", "text", 3, 0.8))
    time("q28 end-to-end")(
      Dedup.minhashLsh(docsTbl, "doc_id", "text", 3, 12, 3, 0.8))
    // q30 stages: fingerprints alone, then pairs with fingerprints cached
    val fp = Dedup.simhash(docsTbl, "doc_id", "text", 60)
    time("q30/1 fingerprints (kernel)")(fp)
    // bucket-size histogram: the pair stage is quadratic WITHIN a
    // (segment, value) bucket, so the top sizes are the skew story
    val top = fp.select(col("simhash"))
      .flatMap { r =>
        val v = r.getLong(0)
        (0 until 4).map(s => (s.toLong << 15) | ((v >>> (s * 15)) & 0x7fff))
      }(org.apache.spark.sql.Encoders.scalaLong)
      .groupByKey(identity)(org.apache.spark.sql.Encoders.scalaLong)
      .count().orderBy(col("count(1)").desc).limit(8).collect()
    println(s"[probe] q30/2 top bucket sizes: ${top.map(_.toString).mkString(" ")}")
    time("q30 end-to-end")(
      Dedup.simhashPairs(docsTbl, "doc_id", "text", 60, 3))
    spark.stop()
  }
}
