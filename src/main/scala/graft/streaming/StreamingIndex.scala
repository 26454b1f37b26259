package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.text.Retrieval

/** Streaming maintenance of the segmented postings index — the natural
  * completion of the amortized-search contract: [[graft.text.Retrieval
  * .buildPostingsIndex]] already makes an APPEND cost ∝ the appended
  * fraction, so a live document feed can keep a search index fresh by
  * landing each micro-batch as files and invoking the append path — the
  * index tokenizes only the new files, tiers segments, and queries stay
  * servable through every commit (the deferred-sweep guarantee).
  *
  * Exactly-once: each micro-batch lands under `corpusDir/batch_<id>/`
  * and a batch directory carrying its `_SUCCESS` commit marker is NOT
  * rewritten — Structured Streaming re-delivers a batch id after a
  * crash-restart, and the replay must neither duplicate documents nor
  * perturb the covered files' (len, mtime) identity (which would demote
  * the next build to a full rebuild). A directory WITHOUT the marker is
  * a crashed write's leftover and is cleared and re-landed (bare
  * existence would silently drop the batch forever). The corpus read
  * uses `recursiveFileLookup`, which the relocatable-scan check
  * preserves, so incremental appends stay on the fast path.
  *
  * Ref: the reference's live collector appends ticks to daily files
  * (`collector/` EA semantics); this is the same land-then-index loop
  * for documents.
  */
object StreamingIndex {

  /** One row of the sink's accounting, per non-empty micro-batch. */
  case class BatchResult(batchId: Long, docs: Long, mode: String,
                         segments: Int)

  @volatile private[streaming] var lastBatch: BatchResult =
    BatchResult(-1L, 0L, "none", 0)

  /** A `foreachBatch` function maintaining the index at `indexPath` over
    * the accumulated corpus at `corpusDir`. Use as:
    * {{{
    * docs.writeStream.foreachBatch(
    *   StreamingIndex.indexingSink(corpusDir, indexPath, "doc_id", "text"))
    * }}}
    * Each batch is coalesced to one file (micro-batches are small; one
    * manifest entry per batch keeps the listing compact — tiering merges
    * them logarithmically as they accumulate). */
  def indexingSink(corpusDir: String, indexPath: String, id: String,
      text: String, maxSegments: Int = 8): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val batchDir = new org.apache.hadoop.fs.Path(
        s"$corpusDir/batch_$batchId")
      val fs = batchDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val docs = batch.select(id, text).persist()
      try {
        val n = docs.count()
        if (n > 0L) {
          // Replay detection keys on the COMMIT marker, not bare
          // directory existence: a crash mid-write leaves batch_<id>/
          // with no _SUCCESS (the committer creates the directory at job
          // setup), and treating that as landed would drop the batch's
          // documents forever on Structured Streaming's retry. A
          // markerless directory is a failed attempt: clear and re-land.
          val success = new org.apache.hadoop.fs.Path(batchDir, "_SUCCESS")
          if (!fs.exists(success)) {
            if (fs.exists(batchDir)) fs.delete(batchDir, true)
            docs.coalesce(1).write.parquet(batchDir.toString)
          }
          val corpus = spark.read
            .option("recursiveFileLookup", "true").parquet(corpusDir)
          Retrieval.buildPostingsIndex(corpus, id, text, indexPath,
            sourceTag = corpusDir, maxSegments = maxSegments)
          val info = Retrieval.lastBuildInfo
          lastBatch = BatchResult(batchId, n, info.mode, info.segments)
        }
      } finally docs.unpersist()
    }
}
