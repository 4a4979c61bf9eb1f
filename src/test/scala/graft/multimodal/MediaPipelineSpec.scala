package graft.multimodal

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class MediaPipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("binary payload -> batched decode -> typed features") {
    val media = MediaPipeline.toMediaTable(Tables.documents(spark, sf).limit(50))
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = MediaPipeline.decodeFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.features.length == MediaPipeline.FeatureDim))
    assert(rows.forall(r => Set("png", "jpeg", "webp")(r.format)))
    // deterministic stub: same input → same features
    val again = MediaPipeline.decodeFeatures(media).collect()
    assert(rows.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
    // n_bytes matches the payload length the engine sees
    val expected = media.select(col("media_id"), octet_length(col("payload")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.forall(r => expected(r.media_id) == r.n_bytes))
  }

  test("resize preserves aspect ratio within the target box") {
    val media = MediaPipeline.toMediaTable(Tables.documents(spark, sf).limit(20))
    val resized = MediaPipeline.resize(MediaPipeline.decodeFeatures(media), maxDim = 128)
    resized.select("width", "height", "out_width", "out_height").collect().foreach { r =>
      val (w, h, ow, oh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(ow <= 128 && oh <= 128 && ow >= 1 && oh >= 1)
      if (math.max(w, h) <= 128) assert(ow == w && oh == h) // no upscale
    }
  }

  test("frame sampling keeps every stride-th fixed-size chunk") {
    val media = MediaPipeline.toMediaTable(Tables.documents(spark, sf).limit(5))
    val frames = MediaPipeline.frameSample(media, frameBytes = 32, stride = 2)
    val perDoc = frames.groupBy("media_id").count().collect()
    assert(perDoc.nonEmpty && perDoc.forall(_.getLong(1) >= 1))
    assert(frames.select("frame_no").distinct().collect()
      .forall(_.getInt(0) % 2 == 0))
  }
}
