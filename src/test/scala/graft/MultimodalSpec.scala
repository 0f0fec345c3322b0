package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Multimodal

/** Multimodal plumbing: binary schema, partition-batched feature
  * extraction around the stubbed decoder, frame sampling.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, sfDir)

  test("synthetic media conforms to the multimodal schema") {
    assert(media.schema("content").dataType == BinaryType)
    assert(media.schema("meta").dataType.isInstanceOf[StructType])
    assert(media.count() == 500)
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic, normalized, and complete") {
    val f1 = Multimodal.extractFeatures(media, batchSize = 7)
    val f2 = Multimodal.extractFeatures(media.repartition(5), batchSize = 64)
    val a = f1.collect().map(m => m.media_id -> m.features.toSeq).toMap
    val b = f2.collect().map(m => m.media_id -> m.features.toSeq).toMap
    assert(a == b, "features depend on partitioning/batch size")
    assert(a.size == 500)
    a.values.foreach { h =>
      assert(h.length == 16)
      assert(math.abs(h.sum - 1.0f) < 1e-3, s"histogram not normalized: $h")
    }
  }

  test("decode stub is deterministic and shape-correct") {
    val px = Multimodal.decodeStub("abc".getBytes, 4, 3)
    assert(px.length == 12)
    assert(px.toSeq == Multimodal.decodeStub("abc".getBytes, 4, 3).toSeq)
  }

  test("audio energy windows are exact sums of squared payload bytes, " +
    "audio rows only") {
    val out = Multimodal.audioEnergy(media, window = 256).collect()
    assert(out.nonEmpty)
    val payloads = media.filter(col("kind") === "audio")
      .select("media_id", "content")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // no non-audio rows leak through
    assert(out.forall(w => payloads.contains(w.media_id)))
    out.groupBy(_.media_id).foreach { case (id, ws) =>
      val bytes = payloads(id)
      val expected = bytes.grouped(256).zipWithIndex.map { case (c, i) =>
        (i, c.length, c.map(b => { val v = b & 0xff; v.toLong * v }).sum)
      }.toSeq
      val got = ws.sortBy(_.win_idx)
        .map(w => (w.win_idx, w.n_samples, w.energy)).toSeq
      assert(got == expected, s"media $id windows differ")
    }
  }

  test("frame sampling emits every k-th frame for video rows only") {
    val frames = Multimodal.sampleFrames(media, everyK = 5)
    assert(frames.schema("frame").dataType == BinaryType)
    val withMeta = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .join(media.select(col("media_id"), col("meta.n_frames").as("nf"),
        col("kind")), "media_id")
    assert(withMeta.filter(col("kind") =!= "video").count() == 0)
    val bad = withMeta
      .filter(col("n") =!= (floor((col("nf") - 1) / 5) + 1))
    assert(bad.count() == 0, "frame count != ceil(n_frames / k)")
  }
}
