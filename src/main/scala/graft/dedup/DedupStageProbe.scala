package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Dev-only stage probe for the dedup family: times each pipeline stage
  * of q27/q28 in isolation (materialized through noop) so optimization
  * targets measurement, not guesses. Not part of the driver contract.
  *
  * Findings that shaped the round-6 rewrite (sf10, local[4]):
  * the verify joins dominated (180 s: sort-merge joins sorting/spilling
  * the fat array payloads + `array_intersect` boxing every element),
  * then the candidate kernel (94 s, Row boxing), then the doc-array
  * build (interpreted struct array_sort) and the df-attach join
  * (computing the shingle stream twice). Each has a dedicated fix:
  * SHUFFLE_HASH + `sorted_common_count`, the primitive tuple kernel,
  * the JVM-sorted [[Dedup.ppjoinDocs]], and [[Dedup.cappedPostings]]. */
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
    val shAll = Dedup.shingles(docsTbl, "doc_id", "text", 3)
      .select(col("doc_id"), Dedup.shingleHash.as("shingle"))
    time("q27/1 shingle stream")(shAll)
    val postings = Dedup.cappedPostings(shAll, "doc_id", idType, 10000)
    time("q27/2 capped postings (one shuffle)")(postings)
    val docs = Dedup.ppjoinDocs(postings, "doc_id", idType, 0.8)
    time("q27/3 ppjoin doc arrays")(docs)
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
    spark.stop()
  }
}
