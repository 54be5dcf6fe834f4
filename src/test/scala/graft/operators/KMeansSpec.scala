package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed integer-exact Lloyd k-means (the full-corpus complement
  * of Similarity.trainKmeansCentroids; oracle parity is the q99 gate).
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def quantized(pts: Seq[(Long, Seq[Float])]) =
    pts.toDF("id", "v").select($"id", KMeans.quantize($"v").as("xq"))

  test("quantize floors at 2^13 exactly, negative values toward -inf") {
    val q = quantized(Seq((1L, Seq(1.0f, -1.0f, 0.5f, -0.50006104f))))
      .select($"xq").as[Seq[Long]].head()
    // -0.50006104f * 8192 = -4096.5000...f exactly -> floor -4097
    assert(q == Seq(8192L, -8192L, 4096L, -4097L))
  }

  test("lloyd separates two clean clusters with exact integer centroids") {
    // cluster A around 0, cluster B around 100; seeds one in each
    val pts = Seq(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(100f, 100f),
      3L -> Seq(1.0f, 0.0f), 4L -> Seq(0.0f, 1.0f),
      5L -> Seq(101f, 100f), 6L -> Seq(100f, 101f))
    val q = quantized(pts)
    val init = Seq(Seq(0L, 0L), Seq(100L * 8192, 100L * 8192))
    val cents = KMeans.lloyd(q, "xq", init, iters = 2)
    // exact means: A = (0+8192+0)/3, (0+0+8192)/3 floored
    val third = Math.floorDiv(8192L, 3L)
    assert(cents == Seq(
      Seq(third, third),
      Seq(100L * 8192 + third, 100L * 8192 + third)))
    val summary = KMeans.cellSummary(q, "id", "xq", cents)
      .select($"cell", $"n", $"first_member").as[(Int, Long, Long)].collect()
    assert(summary.toSeq == Seq((0, 3L, 1L), (1, 3L, 2L)))
    // deterministic across re-runs
    assert(cents == KMeans.lloyd(q, "xq", init, iters = 2))
  }

  test("duplicate seeds: ties assign to the smallest cell, empty cell reindexes away") {
    val q = quantized(Seq(1L -> Seq(1.0f, 2.0f), 2L -> Seq(3.0f, 4.0f)))
    val cents = KMeans.lloyd(q, "xq", Seq(Seq(0L, 0L), Seq(0L, 0L)), iters = 1)
    // every point ties between the two identical centroids -> cell 0;
    // cell 1 empties and the survivor repacks to a single centroid
    assert(cents.length == 1)
    assert(cents.head == Seq(2L * 8192, 3L * 8192))
  }
}
