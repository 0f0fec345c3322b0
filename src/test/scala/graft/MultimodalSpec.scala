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

  test("imageio decode round-trips the planted PNG pixels exactly") {
    import spark.implicits._
    // direct single-image check against the formula, independent of
    // the closed-form oracle: decode must return the exact planted sum
    val (id, w, h) = (37L, 20, 10)
    val png = Multimodal.pngBytes(id, w, h)
    assert(png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P', 'N', 'G'),
      "payload is a real PNG")
    val expected = (0 until w * h).map(j => ((id + j) % 256)).sum
    val dec = Multimodal.decodeImages(
        Seq((id, png)).toDF("media_id", "content"))
      .collect().head
    assert(dec.ok && dec.width == w && dec.height == h &&
      dec.n_px == w.toLong * h && dec.px_sum == expected, dec.toString)
  }

  test("corrupt payloads are tolerated as ok=false rows and leave " +
       "valid rows untouched") {
    import spark.implicits._
    val good = Multimodal.pngBytes(5L, 18, 12)
    val rows = Seq(
      (1L, good),
      (2L, Array[Byte](1, 2, 3, 4)),          // not an image at all
      (3L, good.take(good.length / 2)),        // truncated mid-stream
      (4L, Array.empty[Byte]))
    val dec = Multimodal.decodeImages(rows.toDF("media_id", "content"))
      .collect().map(r => r.media_id -> r).toMap
    assert(dec(1L).ok && dec(1L).width == 18 && dec(1L).height == 12)
    assert(Seq(2L, 3L, 4L).forall(i => !dec(i).ok && dec(i).n_px == 0L),
      dec.toString)
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
