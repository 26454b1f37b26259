package graft.text

import org.apache.spark.sql.{DataFrame, Column, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DSIR-style importance weighting for data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw-pool document by how much more likely its hashed
  * n-gram bag is under the TARGET corpus' feature distribution than
  * under the RAW pool's own —
  *
  *   log w(doc) = Σ_features c_f · ( ln p̂_target(f) − ln p̂_raw(f) )
  *
  * with features = unigrams + bigrams hashed into [[NumBuckets]] buckets
  * (the paper's hashed n-gram generative model) and add-one smoothing on
  * both multinomials. Resampling is then a one-line consumer: rank by
  * `logw` (descending, doc id tiebreak) and keep the top fraction — at
  * cluster scale the cut threshold comes from distributed selection
  * ([[graft.ops.OrderStats]]-style) rather than a global sort, so the
  * operator deliberately returns the SCORE TABLE, not a selection flag.
  *
  * Plan shape (the 100 TB contract): pass 1 reads every document once
  * and partial-aggregates per-bucket counts map-side — the only exchange
  * in the whole operator moves ≤ [[NumBuckets]] rows per task; the
  * bucket totals (≤ 4096 rows, two longs each) collect to the driver (a
  * bounded probe, the family convention) and the per-bucket log-ratio
  * array broadcasts back. Pass 2 re-reads the raw pool and scores each
  * document in a pure map — zero shuffles, nothing cached. Two scans are
  * inherent: the global statistics must close before any document can be
  * scored (same two-pass structure as the IVF trainer).
  *
  * Determinism: the md5→60-bit fold is the family kernel
  * ([[graft.dedup.Dedup.shingleHashesOf]] — the DuckDB oracle reproduces
  * it exactly, collisions included); each document's buckets are sorted
  * before the dot product so JVM summation order is fixed, and the final
  * `round(logw, 6)` absorbs cross-engine ULP drift the way the cosine
  * family's oracles do. */
object Dsir {

  /** Hashed n-gram vocabulary size. 2^12 keeps the bucket-total probe
    * trivially bounded while leaving hash collisions rare enough to
    * preserve score ordering (the paper uses 10k). */
  val NumBuckets = 4096

  /** Sorted feature buckets of one text: one entry per unigram and
    * bigram occurrence (so `length = 2·tokens − 1`), each the family
    * 60-bit md5 fold mod [[NumBuckets]]. Sorted so downstream run-length
    * and dot-product loops are deterministic and cache-friendly. */
  private[graft] def bucketsOf(text: String,
      md: java.security.MessageDigest): Array[Int] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def h(s: String): Int = {
      val d = md.digest(s.getBytes(utf8))
      var v = 0L; var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v = (v << 4) | ((d(7) >> 4) & 0xfL)
      (v % NumBuckets).toInt
    }
    val toks = text.split(" ", -1)
    val n = toks.length
    val out = new Array[Int](n + math.max(0, n - 1))
    var i = 0
    while (i < n) { out(i) = h(toks(i)); i += 1 }
    var j = 0
    while (j < n - 1) { out(n + j) = h(toks(j) + " " + toks(j + 1)); j += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** (b, c, tgt): per-document run-length feature counts, tagged with
    * the document's corpus side. Input of the bucket-total aggregation
    * (pass 1). */
  private def featureRows(df: DataFrame, id: String, text: String,
      isTarget: Column): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("b", IntegerType, nullable = false),
      StructField("c", LongType, nullable = false),
      StructField("tgt", BooleanType, nullable = false)))
    df.select(col(text), isTarget.as("tgt")).mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) Iterator.empty
        else {
          val bs = bucketsOf(r.getString(0), md)
          val tgt = r.getBoolean(1)
          runLengths(bs).map { case (b, c) => Row(b, c, tgt) }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Run-length encode a SORTED bucket array. */
  private[graft] def runLengths(bs: Array[Int]): Iterator[(Int, Long)] =
    new Iterator[(Int, Long)] {
      private var i = 0
      def hasNext: Boolean = i < bs.length
      def next(): (Int, Long) = {
        val b = bs(i); var c = 0L
        while (i < bs.length && bs(i) == b) { c += 1; i += 1 }
        (b, c)
      }
    }

  /** Per-bucket log-ratio array ln p̂_target − ln p̂_raw with add-one
    * smoothing, fit on the full corpus in one aggregation pass. */
  private[graft] def logRatios(df: DataFrame, id: String, text: String,
      isTarget: Column): Array[Double] = {
    val totals = featureRows(df, id, text, isTarget)
      .groupBy(col("b"))
      .agg(sum(when(col("tgt"), col("c")).otherwise(0L)).as("ct"),
        sum(when(!col("tgt"), col("c")).otherwise(0L)).as("cr"))
      .collect()
    val ct = new Array[Long](NumBuckets)
    val cr = new Array[Long](NumBuckets)
    totals.foreach { r =>
      ct(r.getInt(0)) = r.getLong(1); cr(r.getInt(0)) = r.getLong(2)
    }
    val st = ct.sum.toDouble + NumBuckets
    val sr = cr.sum.toDouble + NumBuckets
    Array.tabulate(NumBuckets)(b =>
      math.log((ct(b) + 1.0) / st) - math.log((cr(b) + 1.0) / sr))
  }

  /** DSIR importance weights for every RAW-pool document (`isTarget`
    * rows fit the target distribution and are excluded from the
    * output). Columns: id, n_features (unigram+bigram occurrences),
    * logw (rounded to 6 dp). */
  def importanceWeights(df: DataFrame, id: String, text: String,
      isTarget: Column): DataFrame = {
    val lr = logRatios(df, id, text, isTarget)
    val bc = df.sparkSession.sparkContext.broadcast(lr)
    val idType = df.schema(id).dataType
    val outSchema = StructType(Seq(StructField(id, idType),
      StructField("n_features", LongType, nullable = false),
      StructField("logw_raw", DoubleType, nullable = false)))
    val scored = df.filter(!isTarget).select(col(id), col(text))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val ratios = bc.value
        rows.flatMap { r =>
          if (r.isNullAt(0) || r.isNullAt(1)) Iterator.empty
          else {
            val bs = bucketsOf(r.getString(1), md)
            var w = 0.0
            var i = 0
            while (i < bs.length) { w += ratios(bs(i)); i += 1 }
            Iterator.single(Row(r.get(0), bs.length.toLong, w))
          }
        }
      }(Encoders.row(outSchema))
    scored.select(col(id), col("n_features"),
      round(col("logw_raw"), 6).as("logw"))
  }
}
