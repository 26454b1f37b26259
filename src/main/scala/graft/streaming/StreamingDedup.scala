package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.dedup.Dedup

/** Streaming deduplication — the continuous-ingestion form of the batch
  * dedup family, for pipelines where documents arrive forever and every
  * new document must be checked against EVERYTHING seen so far. Batch
  * re-runs over a growing corpus are quadratic in wall-clock across the
  * corpus lifetime; the streaming form pays each document once.
  *
  * Two operators, both `transformWithState` (RocksDB-backed, checkpoint-
  * restored — the state IS the dedup index):
  *
  *   - [[exact]]: md5-digest-keyed first-seen-wins. State per distinct
  *     text is O(1) (canonical id + count). The canonical is the FIRST
  *     arrival (min id inside a micro-batch for determinism) — the
  *     live-ingest semantic, vs batch [[Dedup.exact]]'s global min id;
  *     the two agree whenever ids arrive in order.
  *   - [[nearDup]]: MinHash+LSH banded candidates with in-bucket EXACT
  *     Jaccard verification — pair-for-pair the batch [[Dedup.minhashLsh]]
  *     contract (same md5 shingle hashes, same signature params, same
  *     lowest-agreeing-band uniqueness, same `jaccard >= threshold`
  *     gate), so splitting a corpus across any number of micro-batches
  *     emits exactly the batch pair set, each pair exactly once, at the
  *     moment its second member arrives. State per bucket is the member
  *     list (id, slots, shingle array) capped at `maxBucket` — the
  *     streaming analogue of the batch degenerate-bucket cap.
  *
  * No document-frequency cap in-stream: df is unknowable mid-stream by
  * definition. Parity with batch therefore holds below the batch
  * `maxDf` (its default is a no-op under 10k docs); a production
  * deployment would ship a stop-shingle broadcast from the previous
  * batch epoch instead.
  */
object StreamingDedup {

  case class Doc(id: Long, text: String)

  /** One event per ingested doc: its digest, whether it duplicates an
    * earlier doc, the canonical (first-seen) id, and how many docs with
    * this digest have been seen INCLUDING this one. */
  case class ExactEvent(id: Long, digest: String, isDuplicate: Boolean,
                        canonicalId: Long, seen: Long)

  /** Exact-dedup state: public so the state-store encoder's generated
    * projection can reach the accessors (a private case class forces
    * interpreter fallback on every state round-trip). */
  case class Canon(canonicalId: Long, seen: Long)

  class ExactProcessor extends StatefulProcessor[String, Doc, ExactEvent] {
    @transient private var canon: ValueState[Canon] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      canon = getHandle.getValueState("canon", Encoders.product[Canon],
        TTLConfig.NONE)

    override def handleInputRows(digest: String, rows: Iterator[Doc],
                                 timers: TimerValues): Iterator[ExactEvent] = {
      // id order inside the batch: deterministic canonical under same-batch
      // ties, independent of shuffle arrival order.
      val batch = rows.toArray.sortBy(_.id)
      var st = if (canon.exists()) canon.get() else Canon(-1L, 0L)
      val out = batch.map { d =>
        st =
          if (st.seen == 0L) Canon(d.id, 1L)
          else st.copy(seen = st.seen + 1)
        ExactEvent(d.id, digest, st.canonicalId != d.id, st.canonicalId, st.seen)
      }
      canon.update(st)
      out.iterator
    }
  }

  /** Exact streaming dedup keyed by text digest (md5, matching batch
    * [[Dedup.exact]] and its oracle). Digests compute once per row in a
    * partition pass (one MessageDigest per partition, not per row); the
    * grouping key is then a plain field read. */
  def exact(docs: Dataset[Doc]): Dataset[ExactEvent] = {
    import docs.sparkSession.implicits._
    val hex = "0123456789abcdef".toCharArray
    docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { d =>
        val dig = md.digest(d.text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val sb = new java.lang.StringBuilder(32)
        dig.foreach { b => sb.append(hex((b >> 4) & 0xf)).append(hex(b & 0xf)) }
        (sb.toString, d)
      }
    }.groupByKey(_._1)
      .mapValues(_._2)
      .transformWithState(new ExactProcessor, TimeMode.None, OutputMode.Append)
  }

  // ---- near-dup ----

  /** One LSH band event: the doc's full slot vector and shingle array
    * ride into the bucket (the batch in-kernel-scoring idiom — no
    * join-back, the verify happens where the candidate is found). */
  case class BandEvent(bucket: String, id: Long, slots: Array[Int],
                       arr: Array[Long])

  case class Member(id: Long, slots: Array[Int], arr: Array[Long])

  /** A verified near-duplicate pair, `idA < idB`, exact Jaccard. */
  case class NearDupPair(idA: Long, idB: Long, jaccard: Double)

  class BucketProcessor(rowsPerBand: Int, threshold: Double, maxBucket: Int,
                        skipped: org.apache.spark.util.LongAccumulator)
      extends StatefulProcessor[String, BandEvent, NearDupPair] {
    @transient private var members: ListState[Member] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState("members", Encoders.product[Member],
        TTLConfig.NONE)

    override def handleInputRows(bucket: String, rows: Iterator[BandEvent],
                                 timers: TimerValues): Iterator[NearDupPair] = {
      val band = bucket.substring(0, bucket.indexOf('|')).toInt

      def agreeOnLowerBand(x: Array[Int], y: Array[Int]): Boolean = {
        var b = 0
        while (b < band) {
          var s = b * rowsPerBand
          var all = true
          while (all && s < (b + 1) * rowsPerBand) {
            if (x(s) != y(s)) all = false
            s += 1
          }
          if (all) return true
          b += 1
        }
        false
      }
      // exact Jaccard via two-pointer merge of the sorted-distinct
      // shingle-hash arrays — the batch verify stage's arithmetic
      def jaccard(a: Array[Long], b: Array[Long]): Double = {
        var i = 0; var j = 0; var common = 0
        while (i < a.length && j < b.length) {
          if (a(i) == b(j)) { common += 1; i += 1; j += 1 }
          else if (a(i) < b(j)) i += 1
          else j += 1
        }
        common.toDouble / (a.length + b.length - common)
      }

      val existing = scala.collection.mutable.ArrayBuffer.empty[Member]
      existing ++= members.get()
      val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
      var appended = 0
      rows.toArray.sortBy(_.id).foreach { ev =>
        if (existing.length < maxBucket) {
          existing.foreach { m =>
            if (m.id != ev.id && !agreeOnLowerBand(m.slots, ev.slots)) {
              val j = jaccard(m.arr, ev.arr)
              if (j >= threshold)
                out += (if (m.id < ev.id) NearDupPair(m.id, ev.id, j)
                        else NearDupPair(ev.id, m.id, j))
            }
          }
          existing += Member(ev.id, ev.slots, ev.arr)
          appended += 1
        } else {
          // beyond maxBucket the bucket is degenerate (exact-duplicate
          // cluster); drop the member like the batch cap — but COUNT it
          // (repo "no silent caps" convention), so operators can alert
          // on lost coverage
          skipped.add(1L)
        }
      }
      if (appended > 0) members.put(existing.toArray)
      out.iterator
    }
  }

  /** Streaming MinHash+LSH near-dup: every emitted pair is exact-Jaccard
    * verified at or above `threshold`; each qualifying pair is emitted
    * exactly once (lowest agreeing band, at second-member arrival). */
  def nearDup(docs: Dataset[Doc], n: Int = 3, numHashes: Int = 12,
              rowsPerBand: Int = 3, threshold: Double = 0.5,
              maxBucket: Int = 4096): Dataset[NearDupPair] = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    import docs.sparkSession.implicits._
    val skipped = docs.sparkSession.sparkContext
      .longAccumulator("streamingDedup.nearDup.skippedMembers")
    val nBands = numHashes / rowsPerBand
    val params = Dedup.minhashParams(numHashes).toArray
    val events = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { d =>
        val arr = Dedup.shingleHashesOf(d.text, n, md)
        if (arr.isEmpty) Iterator.empty
        else {
          val slots = Dedup.minhashSlotsOf(arr, arr.length, params)
          (0 until nBands).iterator.map { b =>
            val sb = new java.lang.StringBuilder
            sb.append(b)
            var s = b * rowsPerBand
            while (s < (b + 1) * rowsPerBand) {
              sb.append('|').append(slots(s)); s += 1
            }
            BandEvent(sb.toString, d.id, slots, arr)
          }
        }
      }
    }
    events.groupByKey(_.bucket)
      .transformWithState(
        new BucketProcessor(rowsPerBand, threshold, maxBucket, skipped),
        TimeMode.None, OutputMode.Append)
  }
}
