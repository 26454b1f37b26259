package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Media items are opaque `binary` payloads plus typed metadata — the
  * payload never round-trips through the driver and is processed
  * per-partition in bounded batches. The actual codec step (JPEG/PNG/
  * audio decode) is a STUB in this environment (no image/audio libraries
  * in the container): [[MediaCodec.decodeStub]] parses a deterministic
  * fake header instead of calling a real decoder. Everything around it —
  * schema, partitioning, the mapPartitions batch shape, feature
  * extraction over decoded bytes, and the downstream similarity plumbing —
  * is real and tested.
  *
  * Scale: payload-carrying stages are narrow (mapPartitions, no shuffle
  * of binaries); only extracted features/metadata shuffle. At 100 TB,
  * partition sizing is governed by payload bytes
  * (`spark.sql.files.maxPartitionBytes`), not row counts.
  */
object Multimodal {

  /** One decoded/derived media row. */
  case class MediaItem(media_id: Long, kind: String, payload: Array[Byte])

  case class DecodedMeta(media_id: Long, kind: String, width: Int, height: Int,
                         channels: Int, n_bytes: Long, valid: Boolean)

  case class MediaFeatures(media_id: Long, features: Array[Float])

  /** Fake media header: [kind(1)][width(2)][height(2)][channels(1)] then
    * payload bytes. Stands in for a container format so the decode STUB
    * has something deterministic to parse. */
  object MediaCodec {

    def encodeFakeHeader(width: Int, height: Int, channels: Int,
                         body: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](6 + body.length)
      out(0) = 1
      out(1) = (width >> 8).toByte; out(2) = width.toByte
      out(3) = (height >> 8).toByte; out(4) = height.toByte
      out(5) = channels.toByte
      System.arraycopy(body, 0, out, 6, body.length)
      out
    }

    /** STUB decode — a real implementation would call an image/audio
      * codec here (javax.imageio / ffmpeg bindings); this environment has
      * none, so we parse the fake header. The signature and batch shape
      * are what a real codec plug-in would use. */
    def decodeStub(item: MediaItem): DecodedMeta = {
      val p = item.payload
      if (p == null || p.length < 6 || p(0) != 1)
        DecodedMeta(item.media_id, item.kind, 0, 0, 0,
          if (p == null) 0L else p.length.toLong, valid = false)
      else {
        val w = ((p(1) & 0xff) << 8) | (p(2) & 0xff)
        val h = ((p(3) & 0xff) << 8) | (p(4) & 0xff)
        DecodedMeta(item.media_id, item.kind, w, h, p(5) & 0xff,
          p.length.toLong, valid = true)
      }
    }
  }

  /** Deterministic synthetic media table for tests/benchmarks: seeded
    * payloads with parseable fake headers. */
  def syntheticMedia(spark: SparkSession, n: Int, bodyBytes: Int = 256): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n).as[Long].map { i =>
      val rnd = new scala.util.Random(i)
      val body = new Array[Byte](bodyBytes)
      rnd.nextBytes(body)
      val w = 16 + (i % 64).toInt * 4
      val h = 16 + (i % 48).toInt * 4
      MediaItem(i, if (i % 3 == 0) "image" else if (i % 3 == 1) "audio" else "video",
        MediaCodec.encodeFakeHeader(w, h, 3, body))
    }
  }

  /** Decode metadata for every item — per-partition, payloads never
    * shuffle. */
  def decode(media: Dataset[MediaItem]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(MediaCodec.decodeStub))
  }

  /** Byte-histogram features (16 bins, L1-normalized) over the payload
    * body — a real, deterministic feature extractor that stands in for an
    * embedding model and feeds [[graft.similarity.Similarity]]. */
  def extractFeatures(media: Dataset[MediaItem], bins: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { item =>
      val hist = new Array[Float](bins)
      val body = item.payload.drop(6)
      var i = 0
      while (i < body.length) {
        hist((body(i) & 0xff) * bins / 256) += 1f
        i += 1
      }
      if (body.length > 0) {
        var b = 0
        while (b < bins) { hist(b) /= body.length; b += 1 }
      }
      MediaFeatures(item.media_id, hist)
    })
  }

  /** One sampled frame: the f-th frameBytes-sized slice of a media body. */
  case class FrameItem(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Frame-sample STUB: treats the payload body as a dense sequence of
    * `frameBytes`-sized frames and keeps every `everyNth` (a real codec
    * plug-in would seek keyframes instead of slicing; the slicing, the
    * row explosion, and the batch shape are the real pipeline). Trailing
    * partial frames are dropped (codec convention). Per-partition
    * flatMap — output payload ≤ input payload / everyNth, frames never
    * shuffle. */
  def sampleFrames(media: Dataset[MediaItem], frameBytes: Int,
                   everyNth: Int): Dataset[FrameItem] = {
    require(frameBytes > 0 && everyNth > 0,
      s"frameBytes/everyNth must be positive, got $frameBytes/$everyNth")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { item =>
      val body = item.payload.drop(6)
      val nFrames = body.length / frameBytes
      (0 until nFrames by everyNth).iterator.map { f =>
        FrameItem(item.media_id, f, java.util.Arrays.copyOfRange(
          body, f * frameBytes, (f + 1) * frameBytes))
      }
    })
  }

  /** Resize STUB: halves the declared dimensions (metadata math is real;
    * the pixel resample would live in the codec plug-in). Payload is
    * re-headered, body carried unchanged. */
  def resizeHalf(media: Dataset[MediaItem]): Dataset[MediaItem] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { item =>
      val m = MediaCodec.decodeStub(item)
      if (!m.valid) item
      else item.copy(payload = MediaCodec.encodeFakeHeader(
        math.max(1, m.width / 2), math.max(1, m.height / 2), m.channels,
        item.payload.drop(6)))
    })
  }
}
