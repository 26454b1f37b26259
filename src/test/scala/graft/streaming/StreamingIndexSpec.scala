package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpecBase
import graft.text.Retrieval

/** Live index maintenance: each micro-batch lands as files and the
  * postings index extends INCREMENTALLY (append, not rebuild), queries
  * are fresh immediately after each batch, tiering compacts when the
  * batch count crosses the cap, and a replayed batch id is idempotent. */
object StreamingIndexSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingIndexSpec extends SparkSpecBase {
  import spark.implicits._
  import StreamingIndexSpec.Doc

  test("micro-batches append to the index; queries fresh; tiering compacts") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_sidx").toString
    val corpusDir = s"$base/corpus"
    val idxDir = s"$base/idx"
    val docs = MemoryStream[Doc]
    val q = docs.toDS().toDF().writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch(StreamingIndex.indexingSink(
        corpusDir, idxDir, "doc_id", "text", maxSegments = 2))
      .start()
    try {
      def hits(term: String): Set[Long] =
        Retrieval.bm25FromIndex(spark, idxDir, Seq(term), 10)
          .collect().map(_.getLong(0)).toSet

      docs.addData(Doc(1L, "apple banana"), Doc(2L, "banana cherry"))
      q.processAllAvailable()
      assert(StreamingIndex.lastBatch.mode === "full") // first batch builds
      assert(hits("apple") === Set(1L))

      docs.addData(Doc(3L, "fig apple"))
      q.processAllAvailable()
      // the second batch must take the APPEND path: only the new batch's
      // file is tokenized, and the new doc serves immediately
      assert(StreamingIndex.lastBatch.mode === "append")
      assert(Retrieval.lastBuildInfo.filesTokenized === 1)
      assert(hits("fig") === Set(3L))
      assert(hits("apple") === Set(1L, 3L))

      docs.addData(Doc(4L, "grape fig"))
      q.processAllAvailable()
      // a third segment would cross maxSegments=2 → tiered compaction,
      // still tokenizing only the newest batch. The two existing
      // segments are the same size tier (within TierRatio), so the r17
      // victim extension merges BOTH with the new docs — one segment
      // out, and the next appends land without re-compacting.
      assert(StreamingIndex.lastBatch.mode === "compact")
      assert(StreamingIndex.lastBatch.segments === 1)
      assert(Retrieval.lastBuildInfo.filesTokenized === 1)
      assert(hits("fig") === Set(3L, 4L))

      // the accumulated index equals a from-scratch batch build
      val direct = Retrieval.bm25TopK(
          spark.read.option("recursiveFileLookup", "true").parquet(corpusDir),
          "doc_id", "text", Seq("apple", "fig", "banana"), 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val served = Retrieval.bm25FromIndex(spark, idxDir,
          Seq("apple", "fig", "banana"), 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(served === direct)
    } finally q.stop()

    // replay idempotence: re-running batch 0's function with the SAME
    // batch id must not duplicate documents or perturb file identity
    val replay = StreamingIndex.indexingSink(
      corpusDir, idxDir, "doc_id", "text", maxSegments = 2)
    replay(Seq((1L, "apple banana"), (2L, "banana cherry"))
      .toDF("doc_id", "text"), 0L)
    assert(Retrieval.lastBuildInfo.mode === "noop",
      "a replayed batch must not re-land files (len/mtime identity)")
    assert(Retrieval.bm25FromIndex(spark, idxDir, Seq("banana"), 10)
      .count() === 2L)

    // crash-mid-write recovery: a batch directory WITHOUT its _SUCCESS
    // commit marker is a failed attempt, not a landed batch — treating
    // bare existence as landed would drop the batch's documents forever
    // on the streaming retry
    val partial = new java.io.File(s"$corpusDir/batch_9")
    partial.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$corpusDir/batch_9/.part-junk.tmp"), "junk")
    replay(Seq((9L, "quince")).toDF("doc_id", "text"), 9L)
    assert(new java.io.File(s"$corpusDir/batch_9/_SUCCESS").exists(),
      "a markerless directory must be cleared and re-landed")
    assert(Retrieval.bm25FromIndex(spark, idxDir, Seq("quince"), 10)
      .collect().map(_.getLong(0)).toSeq === Seq(9L),
      "the re-landed batch's documents must be served")
  }
}
