package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Dev-only: bucket-size distribution of the near-dup LSH signature
  * stream for an embeddings table — prints the candidate-pair total and
  * the top bucket sizes, to tell skew (one straggler bucket) from bulk
  * (uniformly heavy candidate volume). */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val spark = GraftSession.localFromEnv()
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val nPlanes = math.max(4, math.ceil(
      math.log(n / 32.0) / math.log(2.0)).toInt)
    println(s"[probe] n=$n planes=$nPlanes tables=8")
    val sizes = graft.similarity.Similarity
      .debugBucketSizes(emb, "vec_id", "embedding", nPlanes, 8)
      .cache()
    val pairs = sizes.agg(sum((col("sz") * (col("sz") - 1) / 2)
      .cast("long"))).head().getLong(0)
    val top = sizes.orderBy(col("sz").desc).limit(10).collect()
      .map(_.getLong(1))
    val stats = sizes.agg(count(lit(1)), avg("sz"), max("sz")).head()
    println(s"[probe] buckets=${stats.getLong(0)} avg=${stats.getDouble(1)} " +
      s"max=${stats.getLong(2)} candidate_pairs=$pairs top10=${top.mkString(",")}")
    spark.stop()
  }
}
