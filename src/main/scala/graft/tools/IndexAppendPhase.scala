package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, TaskMetricsCensus}
import graft.text.Retrieval

/** Dev-only: the round-15 incremental-maintenance witness — append cost
  * must be proportional to the APPENDED fraction, not the corpus (the
  * round-14 contract re-tokenized 100% of the corpus to absorb a 0.1%
  * append; the v3 segmented index tokenizes only the new files). Cells,
  * in order, one corpus lifecycle:
  *
  *   - `full`     — cold build of the whole N-doc corpus (the baseline
  *                  every append must beat by ~1/fraction);
  *   - `noop`     — rebuild with nothing changed (manifest hit: no jobs);
  *   - `append`   — fraction·N new docs written as new parquet files
  *                  into the corpus dir, then rebuild: must tokenize
  *                  ONLY the new files (mode/filesTokenized read from
  *                  the build accounting, not inferred from wall);
  *   - `query`    — a bm25FromIndex hit on a term that exists only in
  *                  the appended docs (merge-on-read serves fresh rows);
  *   - `compact`  — one more append with maxSegments forcing compaction:
  *                  a TIERED postings-only merge (tokenizes only the
  *                  newest files; merges only the SMALLEST segments —
  *                  here the two 1%-appends — while the 4M-doc base
  *                  segment is never rewritten, so the wall is the
  *                  merged-tier cost, not the corpus).
  *
  * Each cell reports wall, mode, files_tokenized, segments, GC, and
  * shuffle bytes. The SkewPhase synthetic corpus shape (5 corpus-wide
  * stopwords + 20 doc-unique terms) is reused so the build shuffles the
  * same hot-term profile the IndexBuildPhase A/B measured.
  *
  * Usage: `runMain graft.tools.IndexAppendPhase [nDocs] [fraction]`
  * (defaults 4000000, 0.01).
  */
object IndexAppendPhase {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(4000000L)
    val frac = args.lift(1).map(_.toDouble).getOrElse(0.01)
    val nNew = math.max(1L, (nDocs * frac).toLong)
    val spark = GraftSession.localFromEnv()
    val census = new TaskMetricsCensus
    spark.sparkContext.addSparkListener(census)
    def drain(): Unit =
      org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
    def dec(v: Double, s: Int): String =
      BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toString

    // Fresh corpus dir per run: the lifecycle IS the measurement.
    val data = s"target/idxappend_docs_$nDocs.parquet"
    val idx = s"target/idxappend_idx_$nDocs"
    val fs = new org.apache.hadoop.fs.Path(data).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(data), true)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    // Appends land in fraction-proportional file counts (a 1% append is
    // a couple of files, not 32 re-split slivers) so the manifest's
    // files_tokenized accounting reads like a real ingest.
    def gen(from: Long, until: Long, marker: String, files: Int = 32) =
      spark.range(from, until).repartition(files).selectExpr(
        "id AS doc_id",
        s"concat('the of and to in ', '$marker', concat_ws(' ', " +
          "transform(sequence(0, 19), j -> concat('t', id, 'x', j)))) AS text")
    val newFiles = math.max(1, (32 * frac).toInt)
    gen(0L, nDocs, "").write.mode("overwrite").parquet(data)

    def cell(name: String, tokenized: Long)(work: => Long): Unit = {
      drain(); census.reset()
      val t0 = System.nanoTime()
      val rows = work
      val dt = (System.nanoTime() - t0) / 1e9
      drain()
      val info = Retrieval.lastBuildInfo
      println(s"""{"tool":"index_append_phase","n_docs":$nDocs,""" +
        s""""fraction":$frac,"cell":"$name","sec":${dec(dt, 1)},""" +
        s""""mode":"${info.mode}","files_tokenized":${info.filesTokenized},""" +
        s""""segments":${info.segments},"docs_tokenized_expected":$tokenized,""" +
        s""""rows":$rows,""" +
        s""""gc_s":${dec(census.gcMs.get / 1e3, 1)},""" +
        s""""shuffle_write_gb":${dec(census.shufWrite.get / 1e9, 3)},""" +
        s""""disk_spill_gb":${dec(census.diskSpill.get / 1e9, 3)},""" +
        s""""peak_task_mem_mb":${dec(census.peakTaskMem.get / 1e6, 0)}}""")
      spark.catalog.clearCache()
    }

    def build(maxSegments: Int = 8): Long = {
      Retrieval.buildPostingsIndex(spark.read.parquet(data), "doc_id",
        "text", idx, sourceTag = data, maxSegments = maxSegments)
      0L
    }

    cell("full", nDocs)(build())
    cell("noop", 0L)(build())

    // APPEND fraction·N docs carrying a marker stopword ('zq') that the
    // base corpus never emits — the query cell proves merge-on-read.
    gen(nDocs, nDocs + nNew, "zq ", newFiles)
      .write.mode("append").parquet(data)
    cell("append", nNew)(build())

    cell("query_appended_term", 0L) {
      Retrieval.bm25FromIndex(spark, idx, Seq("zq"), 10).count()
    }

    // Force compaction on the next append: maxSegments = current count.
    gen(nDocs + nNew, nDocs + 2 * nNew, "zq ", newFiles)
      .write.mode("append").parquet(data)
    cell("compact", nNew)(build(maxSegments = 2))

    cell("query_after_compact", 0L) {
      Retrieval.bm25FromIndex(spark, idx, Seq("zq"), 10).count()
    }

    // Optional AMORTIZED ladder (third arg = number of further appends,
    // default 0 = off): sequential 1%-appends against the DEFAULT
    // maxSegments=8 policy on a fresh index. Appends below the segment
    // cap are pure (tokenize one file, write one segment); each one past
    // it additionally pays a small-tier merge — the artifact shows the
    // per-append wall staying flat and never approaching the full-build
    // cost, the logarithmic-merge contract over a whole lifecycle.
    val steps = args.lift(2).map(_.toInt).getOrElse(0)
    if (steps > 0) {
      val idx2 = s"${idx}_ladder"
      fs.delete(new org.apache.hadoop.fs.Path(idx2), true)
      def build2(): Long = {
        Retrieval.buildPostingsIndex(spark.read.parquet(data), "doc_id",
          "text", idx2, sourceTag = s"$data#ladder")
        0L
      }
      cell("ladder_full", nDocs + 2 * nNew)(build2())
      var from = nDocs + 2 * nNew
      for (stp <- 1 to steps) {
        gen(from, from + nNew, "zq ", newFiles)
          .write.mode("append").parquet(data)
        from += nNew
        cell(s"ladder_append_$stp", nNew)(build2())
      }
      cell("ladder_query", 0L) {
        Retrieval.bm25FromIndex(spark, idx2, Seq("zq"), 10).count()
      }
    }
    spark.stop()
  }
}
