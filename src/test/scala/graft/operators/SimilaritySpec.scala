package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f), 1),
    (3L, Array(0.0f, 0.9f, 0.1f), 1),
    (4L, Array(0.5f, 0.5f, 0.0f), 0)
  ).toDF("vec_id", "embedding", "cell")

  test("brute-force top-k ranks by cosine, excludes self") {
    val q = corpus.filter($"vec_id" === 0L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val r = Similarity.bruteForceTopK(q, corpus, "q_id", "q_vec", "vec_id", "embedding", 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(r(1L) == 1) // 0.994 cosine
    assert(r(4L) == 2) // 0.707
  }

  test("ivf top-k only scans the query's cell") {
    val q = corpus.filter($"vec_id" === 0L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"), $"cell".as("q_cell"))
    val r = Similarity.ivfTopK(q, corpus, "q_id", "q_vec", "q_cell",
      "vec_id", "embedding", "cell", 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert(r == Set(1L, 4L)) // cell 0 only
  }

  test("hyperplane bucket groups identical vectors and is deterministic") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, -1.0f, 0.5f)),
      (2L, Array(1.0f, 2.0f, -1.0f, 0.5f)),
      (3L, Array(-1.0f, -2.0f, 1.0f, -0.5f))).toDF("id", "v")
    val b = df.select($"id", Similarity.hyperplaneBucket($"v", 8, 4).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b(1L) == b(2L))
    assert(b(1L) != b(3L)) // negated vector flips every nonzero projection
    assert(b.values.forall(v => v >= 0 && v < 256))
  }
}
