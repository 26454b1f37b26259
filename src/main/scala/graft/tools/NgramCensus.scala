package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.{GraftSession, Tables}
import graft.dedup.Dedup

/** Dev tool: attribute the n-gram-Jaccard family's scale exponent
  * (q27/q81, decade-3 measured 1.26) to DATA GROWTH vs OPERATOR GROWTH
  * by censusing the PPJoin CANDIDATE pair stream at each ladder point —
  * the [[PairCount]] method applied to the text-dedup family. The
  * verify stage's cost is proportional to the candidate count, and
  * candidate volume at a fixed threshold is a property of the corpus's
  * near-dup density: if candidates grow superlinearly with docs, ANY
  * filter-verify join algorithm pays superlinear verify work, and the
  * operator is exonerated.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.NgramCensus
  * <dir> [n] [threshold]"` — prints one JSON line with the doc count,
  * enumerated (pre-prune) pair count, surviving candidate pair count,
  * verified (jaccard ≥ t) pair count, and the max per-doc candidate
  * degree (skew witness).
  */
object NgramCensus {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf10full")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.8) // q27/q81's cut
    val spark = GraftSession.localFromEnv()
    val docsIn = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
    val nDocs = docsIn.count()

    val (docs, cand) = Dedup.ppjoinDocsAndCandidates(
      docsIn, "doc_id", "text", n, threshold)
    // Enumerated (pre-prune) pair work: the candidate kernel scans
    // C(len, 2) ordered pairs per prefix posting list regardless of how
    // many survive the length/positional bounds — the quantity the
    // generation stage's time is actually proportional to.
    val enumerated = docs
      .select(posexplode(col("pre")).as(Seq("pos", "shingle")))
      .groupBy(col("shingle")).agg(count(lit(1)).as("len"))
      // `div`, not `/`: Spark's `/` on integer columns is double
      // division, which loses exactness above 2^53 pairs. len*(len-1)
      // is even, so integer division is exact; the aggregate stays Long.
      .agg(sum(expr("len * (len - 1) div 2")).as("pairs"))
      .collect()(0).getAs[Any](0) match {
        case null => 0L
        case l: java.lang.Long => l.longValue
        case x => sys.error(s"unexpected pairs aggregate type: $x")
      }
    // The candidate stream feeds three consumers (count, degree census,
    // verify); persist so the expensive generation pass runs once.
    cand.persist(StorageLevel.DISK_ONLY)
    val nCand = cand.count()
    val deg = if (nCand == 0L) 0L
      else cand.select(col("id_a").as("id"))
        .unionAll(cand.select(col("id_b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
        .agg(max(col("deg")).as("max_deg")).collect()(0).getLong(0)
    val nVerified = Dedup.verifyJaccardArrays(
      docs.select(col("doc_id"), col("arr"), col("sz")),
      "doc_id", cand, threshold).count()

    println(s"""{"dir":"$dir","n":$n,"threshold":$threshold,""" +
      s""""docs":$nDocs,"enumerated":$enumerated,"candidates":$nCand,""" +
      s""""verified":$nVerified,"max_cand_degree":$deg}""")
    spark.stop()
  }
}
