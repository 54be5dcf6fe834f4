package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata (the brief's multimodal requirement; in the reference the
  * binary modality is the ROI image stream, SURVEY.md §1.1 "Images").
  *
  * The Spark-side plumbing — schema, batch shape, partition-friendly
  * kernels — is real and tested; the actual codec calls are STUBBED
  * behind [[MediaKernels]] with deterministic fakes, clearly marked,
  * because no image/audio library ships in this container. Swapping in a
  * real decoder changes one function body, not the plan shape.
  *
  * Kernels run via `mapPartitions` over a typed Dataset: one JVM-side
  * batch per partition (the Scala analog of `mapInPandas`), no per-row
  * UDF serialization, safe to scale by repartitioning on the id.
  */
object Media {

  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class ImageFeatures(
      media_id: Long, n_bytes: Long, mean_px: Double, max_px: Int,
      aspect: Double)

  final case class Frame(media_id: Long, frame_no: Int, bytes: Array[Byte])

  /** STUB decode: a real implementation would call an image codec here
    * (???-equivalent marked per the brief). The deterministic fake
    * treats the payload as raw 8-bit pixels — which is exactly correct
    * for IFCB ROI images, and a placeholder for everything else.
    */
  private[multimodal] def decodeStub(bytes: Array[Byte]): Array[Int] =
    bytes.map(b => b & 0xff)

  /** Per-image feature extraction — the §2.10 heavy-compute kernel shape:
    * partition-local, no shuffle, emits a narrow typed row per image.
    */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val px = decodeStub(m.bytes)
        val mean = if (px.isEmpty) 0.0 else px.map(_.toLong).sum.toDouble / px.length
        ImageFeatures(
          m.media_id, m.bytes.length.toLong, mean,
          if (px.isEmpty) 0 else px.max,
          if (m.height == 0) 0.0 else m.width.toDouble / m.height)
      }
    }
  }

  /** STUB resize: nearest-neighbor over the raw-pixel fake decode; the
    * plan shape (binary→binary, partition-local) is what a real resize
    * kernel keeps.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (m.width <= 0 || m.height <= 0) m.copy(width = 0, height = 0, bytes = Array.empty)
        else {
          val out = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val sx = x * m.width / w
              val sy = y * m.height / h
              val idx = sy * m.width + sx
              out(y * w + x) = if (idx < m.bytes.length) m.bytes(idx) else 0
              x += 1
            }
            y += 1
          }
          m.copy(bytes = out, width = w, height = h)
        }
      }
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size
    * frame slice becomes a row (generator/UDTF shape, §2.10) — pure
    * relational explode over computed offsets, no kernel needed.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames", (length(col("bytes")) / frameBytes).cast("int"))
      .withColumn("frame_no",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))))
      .filter(col("n_frames") > 0)
      .select(
        col("media_id"), col("frame_no"),
        expr(s"substring(bytes, frame_no * $frameBytes + 1, $frameBytes)").as("bytes"))
}
