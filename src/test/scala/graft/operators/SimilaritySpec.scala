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

  test("zero-norm vectors are excluded from both sides, never ranked as NaN neighbors") {
    // round-11 review: a zero corpus vector scored cosine 0/0 = NaN and
    // surfaced as a ranked "neighbor" whenever a query had fewer than k
    // finite candidates
    val withZero = corpus.unionByName(
      Seq((9L, Array(0.0f, 0.0f, 0.0f), 0)).toDF("vec_id", "embedding", "cell"))
    val q = withZero.filter($"vec_id" === 0L || $"vec_id" === 9L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val r = Similarity.bruteForceTopK(q, withZero, "q_id", "q_vec",
      "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(r.forall(!_._3.isNaN), s"NaN cosine ranked: ${r.mkString(",")}")
    assert(!r.exists(_._2 == 9L), "zero vector ranked as a neighbor")
    assert(!r.exists(_._1 == 9L), "zero-vector query produced rows")
  }

  test("a dimension-mismatched corpus vector is excluded, not a job-killing NULL cosine") {
    // round-14 review: a truncated embedding passes its OWN norm gate,
    // but its cross-pair dot is NULL (FloatArrayDot's length contract)
    // and the ranking aggregate's non-nullable Double input killed the
    // whole job on it
    val withShort = corpus.unionByName(
      Seq((9L, Array(1.0f, 2.0f), 0)).toDF("vec_id", "embedding", "cell"))
    val q = withShort.filter($"vec_id" === 0L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val r = Similarity.bruteForceTopK(q, withShort, "q_id", "q_vec",
      "vec_id", "embedding", 10)
      .select("neighbor_id").as[Long].collect()
    assert(!r.contains(9L), "mismatched vector ranked as a neighbor")
    assert(r.nonEmpty)
  }

  test("hyperplane bucket sets the bit on NaN projections, like its SQL twin") {
    // round-14 review: the DuckDB twin renders CASE WHEN proj > 0.0 and
    // SQL orders NaN GREATEST, so the native kernel's Java NaN > 0.0 =
    // false silently broke the bit-exact contract for NaN components
    val df = Seq((1L, Array(Float.NaN, 1.0f, 1.0f, 1.0f)))
      .toDF("id", "v")
      .select(Similarity.hyperplaneBucket($"v", 8, 4).as("b"))
    // every plane's projection is NaN (the NaN component participates
    // in all of them), so all 8 bits must be set
    assert(df.as[Long].head() == 255L)
  }

  test("cellAssign stays linear-sized in k and agrees with the driver kernel") {
    // round-11 review: the old when/otherwise fold doubled the Catalyst
    // tree per centroid (~2^k nodes) — k = 64 would never finish
    // analysis; the array_min form must both run fast and agree with
    // the sequential argmin (ties -> lowest cell id)
    val rnd = new scala.util.Random(5L)
    val cents = Array.fill(64)(Array.fill(3)(rnd.nextDouble() * 2 - 1))
    val rows = (0L until 40L).map(i =>
      (i, Array.fill(3)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("vec_id", "embedding")
    val got = df.select($"vec_id",
        Similarity.cellAssign($"embedding", cents).as("cell"))
      .as[(Long, Int)].collect().toMap
    def seqArgmin(v: Array[Float]): Int = {
      var best = 0; var bestD = Double.MaxValue
      for (c <- cents.indices) {
        // mirror centroidScore's float-cast arithmetic: cc - 2*v.c
        var cc = 0.0; var vc = 0.0
        for (d <- cents(c).indices) {
          val cf = cents(c)(d).toFloat.toDouble
          cc += cf * cf; vc += v(d).toDouble * cf
        }
        val dist = cc - vc * 2.0
        if (dist < bestD) { bestD = dist; best = c }
      }
      best
    }
    rows.foreach { case (i, v) =>
      assert(got(i) == seqArgmin(v), s"vec $i")
    }
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

  test("native hyperplane bucket matches the column-composition it replaced") {
    import org.apache.spark.sql.functions.{element_at, lit, when}
    // the original planes x dims element_at tree, for regression only
    def hofBucket(vec: org.apache.spark.sql.Column, planes: Int, dims: Int) = {
      def coef(p: Int, d: Int): Double =
        (((p.toLong * 64 + d) * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5
      (0 until planes).map { p =>
        val proj = (0 until dims).map { d =>
          element_at(vec, d + 1).cast("double") * lit(coef(p, d))
        }.reduce(_ + _)
        when(proj > 0.0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cmp = e.select(
      Similarity.hyperplaneBucket($"embedding", 4, 64).as("native"),
      hofBucket($"embedding", 4, 64).as("hof"))
    assert(cmp.filter($"native" =!= $"hof").count() == 0)
  }

  test("quantizeInt8 maps non-finite-component vectors to all zeros, like zero vectors") {
    // round-12 ADVICE: a NaN component makes maxabs NaN (NaN-greatest
    // array_max) and an Inf component makes Inf/Inf = NaN for itself;
    // without the non-finite route Spark floor()s NaN to 0 while the
    // DuckDB oracle's CAST(floor(NaN) AS INTEGER) aborts the query —
    // the quantizer must be total and engine-identical instead
    val rows = Seq(
      (0L, Array(1.0f, -2.0f, 0.5f)),          // normal
      (1L, Array(0.0f, 0.0f, 0.0f)),           // zero vector
      (2L, Array(1.0f, Float.NaN, 0.0f)),      // NaN component
      (3L, Array(Float.PositiveInfinity, 1.0f, 0.0f)), // +Inf component
      (4L, Array(Float.NegativeInfinity, 1.0f, 0.0f))  // -Inf component
    ).toDF("vec_id", "embedding")
    val q = rows.select($"vec_id",
      Similarity.quantizeInt8($"embedding").as("q8"))
      .as[(Long, Array[Int])].collect().toMap
    assert(q(0L).toSeq == Seq(64, -127, 32), q(0L).toSeq)
    assert(q(1L).toSeq == Seq(0, 0, 0))
    assert(q(2L).toSeq == Seq(0, 0, 0), s"NaN component: ${q(2L).toSeq}")
    assert(q(3L).toSeq == Seq(0, 0, 0), s"+Inf component: ${q(3L).toSeq}")
    assert(q(4L).toSeq == Seq(0, 0, 0), s"-Inf component: ${q(4L).toSeq}")
  }

  test("NaN-component vectors are excluded like zero vectors, and k=0 rejects loudly") {
    // round-12 review: NaN > 0.0 is TRUE under Spark's NaN-greatest
    // comparison, so a NaN norm sailed through the zero-norm gate and
    // its NaN cosine satisfied every ranking threshold
    val withNaN = corpus.unionByName(
      Seq((8L, Array(1.0f, Float.NaN, 0.0f), 0)).toDF("vec_id", "embedding", "cell"))
    val q = withNaN.filter($"vec_id" === 0L || $"vec_id" === 8L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val r = Similarity.bruteForceTopK(q, withNaN, "q_id", "q_vec",
      "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(r.forall(!_._3.isNaN), s"NaN cosine ranked: ${r.mkString(",")}")
    assert(!r.exists(_._2 == 8L), "NaN vector ranked as a neighbor")
    assert(!r.exists(_._1 == 8L), "NaN-vector query produced rows")
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(q, withNaN, "q_id", "q_vec", "vec_id", "embedding", 0)
    }
    assert(e.getMessage.contains("k >= 1"), e.getMessage)
  }

  test("full trainer's seed pool keeps distinct-vector diversity on a duplicated corpus") {
    // round-12 review: the pool used to sort by xxhash64 of the vector
    // VALUE, so on a value-replicated corpus (the sf1 fixtures copy each
    // embedding with fresh vec_ids) copies of the few smallest-hash
    // values filled the 64-row pool; with replication >= poolN/k the
    // pool held fewer than k distinct vectors, max-min seeding emitted
    // duplicate seeds, and Lloyd merged cells. 16 well-separated
    // distinct vectors x 16 copies, k = 8: the id-keyed pool must still
    // seed 8 distinct cells.
    val distinct = (0 until 16).map(i => Array.tabulate(4)(d => (i * 100 + d).toFloat))
    val rows = for (i <- 0 until 16; r <- 0 until 16)
      yield ((i * 16 + r).toLong, distinct(i))
    val df = rows.toDF("vec_id", "embedding")
    val byId = Similarity.trainKmeansCentroidsFull(
      df, "embedding", k = 8, iters = 2, idCol = Some("vec_id"))
    assert(byId.length == 8,
      s"id-keyed pool trained ${byId.length} cells, expected 8")
    assert(byId.map(_.toSeq).toSet.size == 8, "duplicate centroids")
    // the value-hash default demonstrably collapses here (documents the
    // bias the idCol path exists to avoid — 64-row pool / 16 copies
    // leaves at most 5 distinct values in the pool)
    val byValue = Similarity.trainKmeansCentroidsFull(df, "embedding", k = 8, iters = 2)
    assert(byValue.length < 8,
      s"expected the value-hash pool to collapse on this corpus, got ${byValue.length}")
  }
}
