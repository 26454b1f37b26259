package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSession
import graft.streaming.StreamingIndex
import graft.text.Retrieval

/** Dev-only: the streaming-index lifecycle witness — a live feed driving
  * [[graft.streaming.StreamingIndex.indexingSink]] for many micro-batches
  * must show a FLAT per-batch wall (cost ∝ batch, never corpus): each
  * batch lands as one file and takes the index APPEND path; batches past
  * the segment cap additionally pay a small-tier merge (the logarithmic
  * policy), never a rebuild. Every batch is probed with a query for a
  * term planted ONLY in that batch — freshness through the manifest
  * union, measured, not assumed.
  *
  * One JSON line per batch (wall, build mode, segments, files tokenized,
  * probe wall/hits) + a summary line with the wall distribution.
  *
  * Usage: `runMain graft.tools.StreamingIndexSoak [nBatches]
  * [docsPerBatch] [maxSegments]` (defaults 20, 20000, 8).
  */
object StreamingIndexSoak {

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(20)
    val docsPerBatch = args.lift(1).map(_.toLong).getOrElse(20000L)
    val maxSegments = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = GraftSession.localFromEnv()
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def dec(v: Double, s: Int): String =
      BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toString

    val base = "target/streamidx_soak"
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val corpusDir = s"$base/corpus"
    val idxDir = s"$base/idx"

    val stream = MemoryStream[(Long, String)]
    val q = stream.toDS().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch(StreamingIndex.indexingSink(
        corpusDir, idxDir, "doc_id", "text", maxSegments = maxSegments))
      .start()

    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    try {
      for (b <- 0 until nBatches) {
        // marker term zqb<b> exists ONLY in this batch — the probe
        // proves the batch is served the moment processAllAvailable
        // returns
        val docs = (0L until docsPerBatch).map { j =>
          val id = b * docsPerBatch + j
          (id, s"the of and to in zqb$b " +
            (0 until 20).map(k => s"t${id}x$k").mkString(" "))
        }
        val t0 = System.nanoTime()
        stream.addData(docs: _*)
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        walls += dt
        val info = Retrieval.lastBuildInfo
        val tq0 = System.nanoTime()
        val hits = Retrieval.bm25FromIndex(spark, idxDir,
          Seq(s"zqb$b"), 10).count()
        val qdt = (System.nanoTime() - tq0) / 1e9
        println(s"""{"tool":"streaming_index_soak","batch":$b,""" +
          s""""docs":$docsPerBatch,"sec":${dec(dt, 2)},""" +
          s""""mode":"${info.mode}","segments":${info.segments},""" +
          s""""files_tokenized":${info.filesTokenized},""" +
          s""""probe_sec":${dec(qdt, 2)},"probe_hits":$hits}""")
        spark.catalog.clearCache()
      }
    } finally q.stop()

    val sorted = walls.sorted
    val status = Retrieval.indexStatus(spark, idxDir)
      .orderBy(org.apache.spark.sql.functions.col("n_tokens").desc)
      .collect()
    println(s"""{"tool":"streaming_index_soak","summary":true,""" +
      s""""batches":$nBatches,"docs_total":${nBatches * docsPerBatch},""" +
      s""""batch_min_sec":${dec(sorted.head, 2)},""" +
      s""""batch_p50_sec":${dec(sorted(sorted.size / 2), 2)},""" +
      s""""batch_max_sec":${dec(sorted.last, 2)},""" +
      s""""first_batch_sec":${dec(walls.head, 2)},""" +
      s""""segments":${status.length},""" +
      s""""seg_tokens":[${status.map(_.getAs[Long]("n_tokens")).mkString(",")}]}""")
    spark.stop()
  }
}
