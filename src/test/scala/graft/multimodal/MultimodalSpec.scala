package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.similarity.Similarity

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("decode stub recovers header metadata; corrupt payloads flagged invalid") {
    val media = Multimodal.syntheticMedia(spark, 50)
    val meta = Multimodal.decode(media).collect().map(m => m.media_id -> m).toMap
    assert(meta.size === 50)
    assert(meta(0L).width === 16 && meta(0L).height === 16 && meta(0L).channels === 3)
    assert(meta(5L).width === 16 + 5 * 4)
    assert(meta.values.forall(_.valid))
    val corrupt = Seq(Multimodal.MediaItem(99L, "image", Array[Byte](9, 9))).toDS()
    assert(!Multimodal.decode(corrupt).collect().head.valid)
  }

  test("resize stub halves declared dims, preserves body") {
    val media = Multimodal.syntheticMedia(spark, 10)
    val before = Multimodal.decode(media).collect().map(m => m.media_id -> m).toMap
    val after = Multimodal.decode(Multimodal.resizeHalf(media))
      .collect().map(m => m.media_id -> m).toMap
    after.foreach { case (id, m) =>
      assert(m.width === math.max(1, before(id).width / 2))
      assert(m.n_bytes === before(id).n_bytes)
    }
  }

  test("byte-histogram features are unit-L1 and feed cosine top-k end-to-end") {
    val media = Multimodal.syntheticMedia(spark, 60)
    val feats = Multimodal.extractFeatures(media)
    val sums = feats.collect().map(_.features.sum)
    sums.foreach(s => assert(math.abs(s - 1.0f) < 1e-3))
    val topk = Similarity.cosineTopK(
      feats.toDF().withColumnRenamed("media_id", "vec_id")
        .withColumnRenamed("features", "embedding"),
      "vec_id", "embedding", k = 2)
    assert(topk.count() === 120L) // 60 items x top-2
  }

  test("frame sampling keeps every Nth fixed-size slice and drops the tail") {
    val body = Array.tabulate[Byte](100)(_.toByte) // 3 full 32-byte frames + tail
    val item = Multimodal.MediaItem(7L, "video",
      Multimodal.MediaCodec.encodeFakeHeader(4, 4, 3, body))
    val out = Multimodal.sampleFrames(Seq(item).toDS(), frameBytes = 32, everyNth = 2)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq === Seq(0, 2)) // frames 0,1,2 -> keep 0, 2
    assert(out(0).payload.toSeq === body.slice(0, 32).toSeq)
    assert(out(1).payload.toSeq === body.slice(64, 96).toSeq)
    // a body shorter than one frame emits nothing
    val tiny = Multimodal.MediaItem(8L, "video",
      Multimodal.MediaCodec.encodeFakeHeader(4, 4, 3, new Array[Byte](10)))
    assert(Multimodal.sampleFrames(Seq(tiny).toDS(), 32, 1).count() === 0L)
  }
}
