package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing contract: typed round-trip through the encoder,
  * payload opacity (16 raw bytes), decode determinism, frame/resize
  * semantics. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.mediaTable(graft.Tables.documents(spark, sf)).cache()

  test("media table: payload is a real PGM file (11-byte header + 16 pixels)") {
    val bad = media.where(length(col("payload")) =!= 27).count()
    assert(bad == 0)
    // payload parses as P5 with 4x4 dims
    val payload = media.select("payload").head().getAs[Array[Byte]](0)
    val (pixels, w, h) = Multimodal.decodePgm(payload)
    assert(w == 4 && h == 4 && pixels.length == 16)
    val schema = media.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fieldNames.toSeq ==
      Seq("media_type", "format", "width_px", "height_px", "duration_ms", "sample_rate_hz"))
  }

  test("typed records round-trip through the encoder") {
    val recs = Multimodal.asRecords(media)
    val r = recs.head()
    assert(r.payload.length == 27)
    assert(Set("image", "audio", "video").contains(r.meta.media_type))
  }

  test("decodePgm rejects malformed payloads loudly") {
    intercept[IllegalArgumentException](
      Multimodal.decodePgm("P6\n4 4\n255\nxxxx".getBytes))
    intercept[IllegalArgumentException](
      Multimodal.decodePgm("P5\n4 4\n255\nxx".getBytes)) // truncated pixels
  }

  test("decode is deterministic and bounded") {
    val f1 = Multimodal.decodeImageFeatures(Multimodal.asRecords(media))
      .collect().map(f => f.media_id -> f).toMap
    val f2 = Multimodal.decodeImageFeatures(Multimodal.asRecords(media.repartition(7)))
      .collect().map(f => f.media_id -> f).toMap
    assert(f1 == f2, "decode must not depend on partitioning")
    f1.values.foreach { f =>
      assert(f.n_bytes == 16)
      assert(f.mean_byte >= 0 && f.mean_byte <= 255)
      assert(f.phash16 >= 0 && f.phash16 < (1 << 16))
    }
  }

  test("frame sampling: 1 fps capped, only videos, deterministic keys") {
    val frames = Multimodal.sampleFrames(media, 8)
    val counts = frames.groupBy("media_id").count()
    assert(counts.where(col("count") > 8).count() == 0)
    val videoIds = media.where(col("meta.media_type") === "video")
      .select("media_id").as[Long].collect().toSet
    val frameIds = frames.select("media_id").distinct().as[Long].collect().toSet
    assert(frameIds.subsetOf(videoIds))
  }

  test("resize preserves aspect ratio with floor-div, min height 1") {
    val r = Multimodal.resizeMeta(media, 64)
    val bad = r.where(
      col("new_height_px") =!= greatest(lit(1L),
        floor(col("height_px") * 64 / col("width_px")).cast("long"))).count()
    assert(bad == 0)
    assert(r.where(col("new_width_px") =!= 64).count() == 0)
  }
}
