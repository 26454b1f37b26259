package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.similarity.Similarity

/** Dev tool: attribute an embedding-ladder exponent to DATA GROWTH vs
  * OPERATOR GROWTH by censusing the near-dup pair stream at each ladder
  * point. An exponent >1 for q84 (pairs → connected components → purge)
  * is only an operator finding if the pair/edge volume itself grew
  * sublinearly — near-dup EDGES are a property of the corpus, and a
  * corpus whose threshold-neighborhood density rises with scale yields
  * superlinear edges no algorithm can avoid reading.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.PairCount
  * <dir> [threshold]"` — prints one JSON line with the vector count,
  * pair count, distinct-vectors-in-pairs, and the max per-id pair
  * degree (skew witness).
  */
object PairCount {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/emb2m")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.4) // q70/q84's cut
    val spark = GraftSession.localFromEnv()
    val vecs = graft.Tables.embeddings(spark, dir)
    val n = vecs.count()
    val pairs = Similarity.cosineNearDupPairs(
      vecs.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
      threshold)
    val agg = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .agg(count(lit(1)).as("touched"), max(col("deg")).as("max_deg"),
        sum(col("deg")).as("deg_sum"))
      .collect()(0)
    println(s"""{"dir":"$dir","vectors":$n,"pairs":${agg.getLong(2) / 2},""" +
      s""""touched":${agg.getLong(0)},"max_degree":${agg.getLong(1)}}""")
    spark.stop()
  }
}
