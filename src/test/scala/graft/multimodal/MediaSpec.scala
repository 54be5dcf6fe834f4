package graft.multimodal

import graft.SparkSpec

/** Multimodal plumbing: schema/batch shape are real; decode is the
  * documented deterministic stub.
  */
class MediaSpec extends SparkSpec {
  import spark.implicits._
  import Media._

  private def img(id: Long, w: Int, h: Int, fill: Int): MediaRow =
    MediaRow(id, "image", Array.fill[Byte](w * h)(fill.toByte), w, h, 0)

  test("imageFeatures computes per-image stats partition-locally") {
    val ds = Seq(img(1, 4, 2, 10), img(2, 2, 2, 200)).toDS().repartition(2)
    val f = imageFeatures(ds).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).n_bytes == 8 && f(1L).mean_px == 10.0 && f(1L).aspect == 2.0)
    assert(f(2L).mean_px == 200.0 && f(2L).max_px == 200)
  }

  test("resize produces the target geometry and preserves constant fill") {
    val out = resize(Seq(img(1, 8, 8, 42)).toDS(), 4, 4).collect().head
    assert(out.width == 4 && out.height == 4 && out.bytes.length == 16)
    assert(out.bytes.forall(_ == 42.toByte))
  }

  test("sampleFrames explodes strided fixed-size frames") {
    val media = Seq((1L, Array.tabulate[Byte](40)(_.toByte))).toDF("media_id", "bytes")
    val frames = sampleFrames(media, frameBytes = 10, stride = 2)
      .select("media_id", "frame_no").as[(Long, Int)].collect().toSet
    assert(frames == Set((1L, 0), (1L, 2))) // frames 0..3, stride 2
    val bytes = sampleFrames(media, 10, 2)
      .filter($"frame_no" === 2).select("bytes").as[Array[Byte]].head()
    assert(bytes.toSeq == (20 until 30).map(_.toByte))
  }
}
