package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.similarity.{Similarity, Vec}

/** Streaming embedding near-dup — the continuous-ingestion form of the
  * batch LSH route ([[Similarity.cosineNearDupPairsLsh]]): every arriving
  * embedding checks against EVERYTHING seen so far, paying each vector
  * once instead of re-running a growing batch job.
  *
  * Same machinery as [[StreamingDedup.nearDup]], transposed to vectors:
  * each vector lands in one bucket per hash table (md5-seeded
  * hyperplane sign signatures — the batch kernels, so bucketing is
  * IDENTICAL to batch), the bucket's `transformWithState` processor
  * keeps its members, and a new arrival scores exact cosine against
  * them. A pair sharing buckets in several tables emits ONCE: only the
  * lowest table whose signatures agree emits (both vectors are in hand,
  * signatures recompute deterministically — the streaming replacement
  * for the batch route's `distinct()`).
  *
  * The cut matches batch bit-for-bit: cheap double prefilter, then the
  * BigDecimal HALF_UP 6-dp rounding that defines the threshold. State
  * per bucket is its member vectors; exact-duplicate clusters grow the
  * answer quadratically by definition (same no-cap contract as the
  * batch route — feed exact dedup first if that is unacceptable).
  */
object StreamingSimilarity {

  case class EmbeddingRow(id: Long, v: Array[Double])

  case class BucketEvent(bucket: String, id: Long, v: Array[Double])

  case class VecMember(id: Long, v: Array[Double])

  case class NearDupPair(idA: Long, idB: Long, cosine: Double)

  class BucketProcessor(planes: Int, tables: Int, threshold: Double)
      extends StatefulProcessor[String, BucketEvent, NearDupPair] {
    @transient private var members: ListState[VecMember] = _
    @transient private var mat: Array[Array[Double]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState("members", Encoders.product[VecMember],
        TTLConfig.NONE)

    override def handleInputRows(bucket: String, rows: Iterator[BucketEvent],
                                 timers: TimerValues): Iterator[NearDupPair] = {
      val table = bucket.substring(0, bucket.indexOf(':')).toInt

      def agreeOnLowerTable(x: Array[Double], y: Array[Double]): Boolean = {
        var t = 0
        while (t < table) {
          if (Similarity.signature(x, t, planes, mat) ==
              Similarity.signature(y, t, planes, mat)) return true
          t += 1
        }
        false
      }

      val pre = threshold - 5e-7
      val existing = scala.collection.mutable.ArrayBuffer.empty[VecMember]
      existing ++= members.get()
      val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
      var appended = 0
      rows.toArray.sortBy(_.id).foreach { ev =>
        if (mat == null || mat(0).length < ev.v.length)
          mat = Similarity.planeMatrix(tables * planes, ev.v.length)
        val a = vecOf(ev.id, ev.v)
        existing.foreach { m =>
          if (m.id != ev.id && !agreeOnLowerTable(m.v, ev.v)) {
            val c = Similarity.cosine(vecOf(m.id, m.v), a)
            if (c >= pre &&
              BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble >= threshold) {
              val cr = BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble
              out += (if (m.id < ev.id) NearDupPair(m.id, ev.id, cr)
                      else NearDupPair(ev.id, m.id, cr))
            }
          }
        }
        existing += VecMember(ev.id, ev.v)
        appended += 1
      }
      if (appended > 0) members.put(existing.toArray)
      out.iterator
    }

    private def vecOf(id: Long, v: Array[Double]): Vec = {
      var sq = 0.0; var j = 0
      while (j < v.length) { sq += v(j) * v(j); j += 1 }
      Vec(id, v, math.sqrt(sq))
    }
  }

  /** Stream near-dup pairs (`idA < idB`, 6-dp rounded cosine >=
    * `threshold`), each pair exactly once, at second-member arrival.
    * `planes` is explicit (a stream has no count() to adapt to — size
    * it for the EXPECTED corpus, as any streaming LSH must). */
  def nearDup(embs: Dataset[EmbeddingRow], threshold: Double,
              planes: Int = 8, tables: Int = 8): Dataset[NearDupPair] = {
    require(planes > 0 && tables > 0, "planes and tables must be positive")
    import embs.sparkSession.implicits._
    val events = embs.mapPartitions { it =>
      var mat: Array[Array[Double]] = null
      it.flatMap { e =>
        if (mat == null || mat(0).length < e.v.length)
          mat = Similarity.planeMatrix(tables * planes, e.v.length)
        (0 until tables).iterator.map { t =>
          BucketEvent(Similarity.signature(e.v, t, planes, mat), e.id, e.v)
        }
      }
    }
    events.groupByKey(_.bucket)
      .transformWithState(new BucketProcessor(planes, tables, threshold),
        TimeMode.None, OutputMode.Append)
  }
}
