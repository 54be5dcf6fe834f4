package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-level IVF codebook (round-15): training determinism, assignment
  * exactness against a driver-side recompute, the incremental-upsert
  * identity q102's oracle relies on, corrupt-input NULL contracts, and
  * the drift trigger.
  */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated clusters in 8 dims, deterministic LCG jitter. */
  private def corpus(n: Int, seed: Long = 7L): DataFrame = {
    var s = seed
    def rnd(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val centers = Array(
      Array.fill(8)(0.0f), Array.fill(8)(5.0f), Array.fill(8)(-5.0f))
    (0 until n).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + rnd().toFloat * 0.8f))
    }.toDF("vec_id", "embedding")
  }

  private def cb(df: DataFrame): Ivf.Codebook =
    Ivf.train(df, "embedding", "vec_id", k = 9,
      itersCoarse = 3, itersFine = 2, perCellSampleMax = 64)

  test("assignment equals a driver-side argmin over the coarse cell's candidates") {
    val df = corpus(240)
    val book = cb(df)
    val byCoarse = Ivf.collectFine(book).groupBy(_._1)
    val rows = Ivf.assign(
        df.withColumn("__coarse",
          Similarity.cellAssign($"embedding", book.coarse)),
        "embedding", book)
      .select($"vec_id", $"__coarse", $"cell",
        KMeans.quantize($"embedding").as("xq"))
      .collect()
    assert(rows.length == 240)
    rows.foreach { r =>
      val coarse = r.getInt(1)
      val xq = r.getSeq[Long](3).toArray
      val cands = byCoarse(coarse)
      val best = cands.map { case (_, cell, c) =>
        val d = c.toArray.zip(xq).map { case (a, b) =>
          val t = a - b; t * t
        }.sum
        (d, cell)
      }.min // (distance, cell) lexicographic — the kernel's tie-break
      assert(!r.isNullAt(2) && r.getInt(2) == best._2,
        s"vec ${r.getLong(0)}: kernel ${r.get(2)} vs recompute ${best._2}")
    }
    // the codebook really is two-level: >1 coarse cell, fine ids spread
    assert(byCoarse.size > 1)
    assert(Ivf.collectFine(book).map(_._2).distinct.size > byCoarse.size)
  }

  test("incremental upsert identity: assign(base) ∪ assign(delta) == assign(base ∪ delta)") {
    val df = corpus(210)
    val base = df.filter($"vec_id" % 7 =!= 0)
    val delta = df.filter($"vec_id" % 7 === 0)
    val book = cb(base) // frozen pre-delta, the q102 posture
    def m(d: DataFrame): Map[Long, Int] =
      Ivf.assign(d, "embedding", book).select($"vec_id", $"cell")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val incremental = m(base) ++ m(delta)
    val full = m(df)
    assert(incremental == full)
    assert(incremental.size == 210)
  }

  test("training is partitioning-independent (the determinism contract)") {
    val df = corpus(180)
    val a = Ivf.collectFine(cb(df.repartition(1)))
    val b = Ivf.collectFine(cb(df.repartition(13, $"vec_id")))
    assert(a == b)
  }

  test("corrupt inputs get NULL cells, never a plausible bin") {
    val df = corpus(60)
    val book = cb(df)
    // a vector whose length differs from the codebook dims
    val ragged = Seq((999L, Array.fill(5)(1.0f))).toDF("vec_id", "embedding")
    val r = Ivf.assign(ragged, "embedding", book).select($"cell").collect()
    assert(r.length == 1 && r(0).isNullAt(0))
    // kernel-level: a candidate list with a ragged centroid nulls the row
    val bad = Seq((Array(1L, 2L), Seq((0, Seq(1L, 2L)), (1, Seq(1L)))))
      .toDF("xq", "cands")
    val k = bad.select(Ivf.nearestCandidate($"xq", $"cands")).collect()
    assert(k(0).isNullAt(0))
    // and an empty candidate list
    val empty = Seq((Array(1L, 2L), Seq.empty[(Int, Seq[Long])]))
      .toDF("xq", "cands")
    assert(empty.select(Ivf.nearestCandidate($"xq", $"cands"))
      .collect()(0).isNullAt(0))
  }

  // --- three-level codebook (round-18) --------------------------------------

  private def cb3(df: DataFrame): Ivf.Codebook3 =
    Ivf.train3(df, "embedding", "vec_id", k = 27,
      itersCoarse = 3, itersLevel = 2, perCellSampleMax = 64)

  test("three-level assignment equals a driver-side two-step argmin (round-18)") {
    val df = corpus(240)
    val book = cb3(df)
    try {
      val byTop = Ivf.collectLevel(book.mid).groupBy(_._1)
      val byMid = Ivf.collectLevel(book.fine).groupBy(_._1)
      def argmin(cands: Seq[(Int, Int, Seq[Long])], xq: Array[Long]): Int =
        cands.map { case (_, cell, c) =>
          (c.toArray.zip(xq).map { case (a, b) => val t = a - b; t * t }.sum,
            cell)
        }.min._2 // (distance, cell) lexicographic — the kernel's tie-break
      val rows = Ivf.assign3(
          df.withColumn("__top",
            Similarity.cellAssign($"embedding", book.coarse)),
          "embedding", book)
        .select($"vec_id", $"__top", $"cell",
          KMeans.quantize($"embedding").as("xq"))
        .collect()
      assert(rows.length == 240)
      rows.foreach { r =>
        val xq = r.getSeq[Long](3).toArray
        val mid = argmin(byTop(r.getInt(1)), xq)
        val want = argmin(byMid(mid), xq)
        assert(!r.isNullAt(2) && r.getInt(2) == want,
          s"vec ${r.getLong(0)}: kernel ${r.get(2)} vs recompute $want")
      }
      // genuinely three levels: >1 top cell, mids spread, fines spread
      assert(byTop.size > 1)
      assert(Ivf.collectLevel(book.mid).map(_._2).distinct.size > byTop.size)
      assert(Ivf.collectLevel(book.fine).map(_._2).distinct.size >
        Ivf.collectLevel(book.mid).map(_._2).distinct.size)
    } finally book.release()
  }

  test("three-level training is partitioning-independent; corrupt rows get NULL (round-18)") {
    val df = corpus(180)
    val a = cb3(df.repartition(1))
    val b = cb3(df.repartition(13, $"vec_id"))
    try {
      assert(Ivf.collectLevel(a.mid) == Ivf.collectLevel(b.mid))
      assert(Ivf.collectLevel(a.fine) == Ivf.collectLevel(b.fine))
      val ragged = Seq((999L, Array.fill(5)(1.0f))).toDF("vec_id", "embedding")
      val r = Ivf.assign3(ragged, "embedding", a).select($"cell").collect()
      assert(r.length == 1 && r(0).isNullAt(0))
      // incremental identity carries over: fixed-codebook assignment is
      // a pure per-row function at every level
      val base = df.filter($"vec_id" % 7 =!= 0)
      val delta = df.filter($"vec_id" % 7 === 0)
      def m(d: DataFrame): Map[Long, Int] =
        Ivf.assign3(d, "embedding", a).select($"vec_id", $"cell")
          .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
      assert(m(base) ++ m(delta) == m(df))
    } finally { a.release(); b.release() }
  }

  test("probeCells equals a driver-side recompute over the probed coarse cells' candidates") {
    val df = corpus(240)
    val book = cb(df)
    val npc = math.min(2, book.coarse.length)
    val queries = df.filter($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val got = Ivf.probeCells(queries, "q_id", "q_vec", book, npc, nProbeFine = 3)
      .select($"q_id", $"probes",
        Similarity.probeCells($"q_vec", book.coarse, npc).as("cps"),
        KMeans.quantize($"q_vec").as("xq"))
      .collect()
    assert(got.length == 20)
    val byCoarse = Ivf.collectFine(book).groupBy(_._1)
    got.foreach { r =>
      val cps = r.getSeq[Int](2)
      val xq = r.getSeq[Long](3).toArray
      val expected = cps.flatMap(c => byCoarse.getOrElse(c, Nil))
        .map { case (_, cell, cvec) =>
          (cvec.toArray.zip(xq).map { case (a, b) => val t = a - b; t * t }.sum,
            cell)
        }
        .sorted.take(3).map(_._2)
      assert(r.getSeq[Int](1) == expected,
        s"q ${r.getLong(0)}: ${r.getSeq[Int](1)} vs $expected")
    }
    // a ragged query gets an empty probe list, not a crash or a bin
    val ragged = Seq((99L, Array.fill(5)(1.0f))).toDF("q_id", "q_vec")
    val rp = Ivf.probeCells(ragged, "q_id", "q_vec", book, npc, nProbeFine = 3)
      .select($"probes").collect()
    assert(rp.length == 1 && rp(0).getSeq[Int](0).isEmpty)
  }

  test("save3/load3 round-trip: reloaded codebook assigns identically (round-18)") {
    val df = corpus(180)
    val book = cb3(df)
    val dir = java.nio.file.Files.createTempDirectory("ivf3state").toString
    try {
      Ivf.save3(book, dir)
      val reloaded = Ivf.load3(spark, dir)
      try {
        assert(reloaded.midK == book.midK && reloaded.fineK == book.fineK)
        assert(reloaded.coarse.map(_.toSeq).toSeq == book.coarse.map(_.toSeq).toSeq)
        assert(Ivf.collectLevel(reloaded.mid) == Ivf.collectLevel(book.mid))
        assert(Ivf.collectLevel(reloaded.fine) == Ivf.collectLevel(book.fine))
        def m(b: Ivf.Codebook3): Map[Long, Int] =
          Ivf.assign3(df, "embedding", b).select($"vec_id", $"cell")
            .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(m(reloaded) == m(book))
      } finally reloaded.release()
    } finally book.release()
  }

  test("tier dispatch: trainTiered switches depth at deepMinK; saveAny/loadAny sniff it back (round-19)") {
    val df = corpus(180)
    // below the threshold: two-level; at/above: three-level
    val shallow = Ivf.trainTiered(df, "embedding", "vec_id", k = 9,
      deepMinK = 10)
    val deep = Ivf.trainTiered(df, "embedding", "vec_id", k = 9,
      deepMinK = 9)
    try {
      assert(shallow.isInstanceOf[Ivf.Codebook], shallow.getClass.toString)
      assert(deep.isInstanceOf[Ivf.Codebook3], deep.getClass.toString)
      // assignAny routes to the depth-specific kernel: same cells as
      // the direct call, for both depths
      def cells(a: DataFrame): Map[Long, Option[Int]] =
        a.select($"vec_id", $"cell").collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
      assert(cells(Ivf.assignAny(df, "embedding", shallow)) ==
        cells(Ivf.assign(df, "embedding",
          shallow.asInstanceOf[Ivf.Codebook])))
      assert(cells(Ivf.assignAny(df, "embedding", deep)) ==
        cells(Ivf.assign3(df, "embedding",
          deep.asInstanceOf[Ivf.Codebook3])))
      // loadAny discriminates by the on-disk layout (mid level present)
      // — a pre-round-19 two-level state dir loads unchanged
      val d2 = java.nio.file.Files.createTempDirectory("ivfany2").toString
      val d3 = java.nio.file.Files.createTempDirectory("ivfany3").toString
      Ivf.saveAny(shallow, d2)
      Ivf.saveAny(deep, d3)
      val r2 = Ivf.loadAny(spark, d2)
      val r3 = Ivf.loadAny(spark, d3)
      try {
        assert(r2.isInstanceOf[Ivf.Codebook], r2.getClass.toString)
        assert(r3.isInstanceOf[Ivf.Codebook3], r3.getClass.toString)
        assert(cells(Ivf.assignAny(df, "embedding", r2)) ==
          cells(Ivf.assignAny(df, "embedding", shallow)))
        assert(cells(Ivf.assignAny(df, "embedding", r3)) ==
          cells(Ivf.assignAny(df, "embedding", deep)))
      } finally { r2.release(); r3.release() }
    } finally { shallow.release(); deep.release() }
  }

  test("probeCells3 equals a driver-side two-hop recompute (round-18)") {
    val df = corpus(240)
    val book = cb3(df)
    try {
      val npt = math.min(2, book.coarse.length)
      val (npm, npf) = (4, 3)
      val queries = df.filter($"vec_id" < 20)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      val got = Ivf.probeCells3(queries, "q_id", "q_vec", book, npt, npm, npf)
        .select($"q_id", $"probes",
          Similarity.probeCells($"q_vec", book.coarse, npt).as("tps"),
          KMeans.quantize($"q_vec").as("xq"))
        .collect()
      assert(got.length == 20)
      val byTop = Ivf.collectLevel(book.mid).groupBy(_._1)
      val byMid = Ivf.collectLevel(book.fine).groupBy(_._1)
      def hop(parents: Seq[Int], lvl: Map[Int, Seq[(Int, Int, Seq[Long])]],
          xq: Array[Long], n: Int): Seq[Int] =
        parents.flatMap(p => lvl.getOrElse(p, Nil))
          .map { case (_, cell, cvec) =>
            (cvec.toArray.zip(xq).map { case (a, b) =>
              val t = a - b; t * t
            }.sum, cell)
          }
          .sorted.take(n).map(_._2)
      got.foreach { r =>
        val xq = r.getSeq[Long](3).toArray
        val expected = hop(hop(r.getSeq[Int](2), byTop, xq, npm), byMid, xq, npf)
        assert(r.getSeq[Int](1) == expected,
          s"q ${r.getLong(0)}: ${r.getSeq[Int](1)} vs $expected")
      }
      // a ragged query gets an empty probe list, not a crash or a bin
      val ragged = Seq((99L, Array.fill(5)(1.0f))).toDF("q_id", "q_vec")
      val rp = Ivf.probeCells3(ragged, "q_id", "q_vec", book, npt, npm, npf)
        .select($"probes").collect()
      assert(rp.length == 1 && rp(0).getSeq[Int](0).isEmpty)
    } finally book.release()
  }

  test("train and probeCells reject non-integral ids loudly (round-16)") {
    // the id contract was documented but unenforced: every consumer
    // keys ledgers/search by long, where a string id casts to all-NULL
    // silently — the compactNearDups reject class
    val df = corpus(90)
    val strIds = df.select(concat(lit("d"), $"vec_id").as("vec_id"),
      $"embedding")
    val e1 = intercept[IllegalArgumentException](cb(strIds))
    assert(e1.getMessage.contains("integral"), e1.getMessage)
    val book = cb(df)
    val strQ = df.filter($"vec_id" < 5)
      .select(concat(lit("q"), $"vec_id").as("q_id"), $"embedding")
    val e2 = intercept[IllegalArgumentException] {
      Ivf.probeCells(strQ, "q_id", "embedding", book, 1, nProbeFine = 3)
    }
    assert(e2.getMessage.contains("integral"), e2.getMessage)
  }

  test("probeCells duplicate query ids: both rows get the union-merged probe list (the documented contract)") {
    // row-uniqueness is the caller's contract — this pins what happens
    // when it's broken so the behavior is DEFINED, not accidental: the
    // id-keyed regroup unions the duplicates' scored candidates and
    // every duplicate row receives that one merged list
    val df = corpus(240)
    val book = cb(df)
    val npc = math.min(2, book.coarse.length)
    // two rows sharing id 7: one from each far-apart cluster
    val a = df.filter($"vec_id" === 0L).select(lit(7L).as("q_id"),
      $"embedding")
    val b = df.filter($"vec_id" === 1L).select(lit(7L).as("q_id"),
      $"embedding")
    val dup = a.unionByName(b)
    val got = Ivf.probeCells(dup, "q_id", "embedding", book, npc,
      nProbeFine = 3).select($"probes").collect()
    assert(got.length == 2, "each duplicate row rides back through the join")
    assert(got(0).getSeq[Int](0) == got(1).getSeq[Int](0),
      "duplicates share one merged probe list")
    // the merged list is the global top-3 over BOTH rows' scored
    // candidates — recompute it driver-side
    val byCoarse = Ivf.collectFine(book).groupBy(_._1)
    val merged = dup.select($"embedding",
        Similarity.probeCells($"embedding", book.coarse, npc).as("cps"),
        KMeans.quantize($"embedding").as("xq")).collect()
      .flatMap { r =>
        val xq = r.getSeq[Long](2).toArray
        r.getSeq[Int](1).flatMap(c => byCoarse.getOrElse(c, Nil))
          .map { case (_, cell, cvec) =>
            (cvec.toArray.zip(xq).map { case (x, y) =>
              val t = x - y; t * t }.sum, cell)
          }
      }.sorted.take(3).map(_._2).toSeq
    assert(got(0).getSeq[Int](0) == merged, s"${got(0).getSeq[Int](0)} vs $merged")
  }

  test("driftFraction: in-distribution delta ~0, shifted delta ~1, ragged delta counts far") {
    val df = corpus(240)
    val book = cb(df)
    val typical = Ivf.typicalCoarseD2(df, "embedding", "vec_id", book)
    val inDist = corpus(60, seed = 99L)
    assert(Ivf.driftFraction(inDist, "embedding", book, typical,
      tolerance = 4.0) < 0.2)
    val shifted = inDist.select($"vec_id",
      transform($"embedding", x => x + lit(40.0f)).as("embedding"))
    assert(Ivf.driftFraction(shifted, "embedding", book, typical,
      tolerance = 4.0) > 0.8)
    // an embedder regression changing dims IS drift: ragged rows can
    // never assign under the frozen codebook — they must count FAR,
    // not null out of the numerator (round-15 review)
    val ragged = inDist.select($"vec_id",
      slice($"embedding", 1, 5).as("embedding"))
    assert(Ivf.driftFraction(ragged, "embedding", book, typical,
      tolerance = 4.0) == 1.0)
  }
}
