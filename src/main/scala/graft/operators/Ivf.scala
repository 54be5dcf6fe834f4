package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level (hierarchical) IVF codebook — the round-15 scale fix for
  * the flat trainers' two O(k·d) driver/plan terms (round-14 verdict's
  * named residual): at SemDeDup's corpus-scaled k = n/250, a FLAT
  * codebook costs O(pool·k·d) driver work to seed
  * ([[Similarity.trainKmeansCentroidsFull]]) and ships every fine
  * centroid into the plan (a multi-GB literal at ~1e9 docs).
  *
  * Structure: √k coarse centroids trained DISTRIBUTED
  * ([[KMeans.lloyd]] via [[Similarity.trainKmeansCentroidsFull]] —
  * driver seeding cost O(pool·√k·d)), then ~√k fine centroids per
  * coarse cell trained distributed over per-cell bounded samples. The
  * fine codebook lives as a DataFrame keyed by coarse cell — it never
  * reaches the driver and never enters a plan literal:
  *
  *   - TRAIN: one corpus pass assigns coarse cells (√k plan literals,
  *     the [[graft.plans.NearestCentroid]] kernel), one window pass
  *     takes a deterministic hash-ordered sample per coarse cell, and
  *     each fine Lloyd round is a bounded-sample join + ONE
  *     (coarse, fine, dim) partial-aggregated shuffle. Driver state per
  *     round: zero rows (the codebook stays distributed).
  *   - ASSIGN: corpus rows get their coarse cell map-side, then join
  *     the (coarse → fine candidates) codebook — AQE broadcasts it
  *     while it fits, and falls back to an equi-shuffle keyed by coarse
  *     cell at extreme k — and the per-row fine argmin is the codegen'd
  *     [[graft.plans.NearestCandidate]] kernel over the joined
  *     candidate array: O(√k·d) work per row, O(√k·d) plan bytes.
  *
  * Everything downstream of the coarse training runs in
  * [[KMeans.quantize]]'s integer domain, so cells are bit-reproducible
  * across engines/partitionings/retries and a DuckDB oracle can
  * hash-match the assignment exactly (q101/q102; the codebook renders
  * as literal BIGINT rows at oracle time — collecting it is an
  * oracle-/test-scale affordance, [[collectFine]], never part of the
  * operator's own data path).
  *
  * Incremental maintenance (round-14 verdict task 4): because
  * assignment is a pure per-row function of (vector, codebook), a
  * frozen codebook assigns a NEW delta of embeddings independently of
  * the already-indexed corpus — `assign(delta) ∪ storedIndex` is
  * row-identical to `assign(corpus ∪ delta)` (pinned by q102's oracle
  * and IvfSpec). [[driftFraction]] is the retrain trigger: the share of
  * delta rows whose nearest-coarse distance exceeds a tolerance times
  * the training-time typical distance.
  *
  * THREE-level extension (round-18): at SemDeDup's corpus-scaled
  * k ∝ n even the two-level per-row Θ(√k·d) assign term makes total
  * work n^1.5 (measured — see [[Codebook3]]); [[train3]]/[[assign3]]/
  * [[probeCells3]] bound per-row work at Θ(k^⅓·d) per hop, the
  * complete deeper index (build q109 / search q110; BenchIvf crossover
  * in BENCH_SCALING.md round-18: assign 2.2× faster at k=8000, 2.5×
  * at k=32000 over the 2M-row corpus).
  */
object Ivf {

  /** Common surface of the two- and three-level codebooks — what a
    * TIER-AGNOSTIC consumer (the durable compaction path,
    * [[graft.jobs.CorpusPrep.compactNearDups]]) needs: the coarse/top
    * centroids every drift probe scores against, the dims contract,
    * and the cache-release lifecycle. Dispatch to the depth-specific
    * machinery goes through [[assignAny]]/[[saveAny]]/[[loadAny]]/
    * [[trainTiered]] so the tier choice lives in ONE switch instead of
    * leaking a `match` into every caller.
    */
  sealed trait AnyCodebook {
    def coarse: Array[Array[Double]]
    def dims: Int = coarse(0).length
    def release(): Unit
  }

  /** A trained two-level codebook.
    *
    * @param coarse coarse centroids (float domain — the
    *               [[Similarity.cellAssign]] literals), √k of them
    * @param fine   DISTRIBUTED fine codebook: (coarse: int, cell: int,
    *               c: array<long> in the quantized domain). `cell` is
    *               the global id `coarse * fineK + fineRank` — sparse
    *               but bounded by coarse.length * fineK.
    * @param fineK  fine cells per coarse cell (the id stride)
    */
  final case class Codebook(coarse: Array[Array[Double]], fine: DataFrame,
      fineK: Int) extends AnyCodebook {
    /** Releases the persisted fine codebook — the owner calls this when
      * the index is retired (e.g. replaced after a drift retrain).
      * Safe even if blocks were already evicted: lineage is intact.
      */
    def release(): Unit = { fine.unpersist(); () }
  }

  /** The codegen'd fine argmin over a joined candidate column (exact
    * integer distances, ties to the smaller cell id; NULL on empty or
    * corrupt candidates — see [[graft.plans.NearestCandidateExpr]]).
    */
  def nearestCandidate(xq: Column, cands: Column): Column =
    GraftBridge.column(graft.plans.NearestCandidate(
      GraftBridge.expression(xq), GraftBridge.expression(cands)))

  /** Exact integer squared distance between two `array<long>` columns
    * (NULL when lengths differ — zip_with's null-pad propagates). ONE
    * Column-side implementation, mirrored exactly by [[sqDistSql]]
    * (round-15 review: the repo's finiteNorm history shows hand-copies
    * of exactness-critical snippets drift).
    */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** DuckDB twin of [[sqDist]]: exact BIGINT arithmetic, NULL on a
    * length mismatch (list_zip null-pads, the reduce propagates).
    */
  def sqDistSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |               list_transform(list_zip($a, $b),
       |                 p -> (p[1] - p[2]) * (p[1] - p[2]))),
       |               (acc, v) -> acc + v)""".stripMargin

  /** The (parent → sorted candidates) aggregation every level join
    * reads — single-sourced so the struct shape feeding
    * [[graft.plans.NearestCandidate]] and the probe scorer cannot
    * drift apart. `level` is any (coarse, cell, c) codebook frame
    * (the two-level fine codebook, or either deep level of a
    * [[Codebook3]] — both use the same layout).
    */
  private def candsOf(level: DataFrame, candsCol: String,
      parentCol: String): DataFrame =
    level.groupBy("coarse")
      .agg(sort_array(collect_list(struct(col("cell"), col("c"))))
        .as(candsCol))
      .withColumnRenamed("coarse", parentCol)

  private def fineCands(cb: Codebook, candsCol: String,
      coarseCol: String): DataFrame =
    candsOf(cb.fine, candsCol, coarseCol)

  /** Trains the two-level codebook. Deterministic end-to-end: the
    * coarse half inherits [[Similarity.trainKmeansCentroidsFull]]'s
    * seeded determinism; the fine half samples by (xxhash64(id), id)
    * rank — a data-only total order — seeds each coarse cell with its
    * first `fineK` sample rows, and iterates integer-exact Lloyd
    * (Long sums, floored division) with (distance, cell) tie-breaks.
    *
    * Rows whose vector length differs from the coarse dims do not
    * influence fine training (their kernel result is NULL); empty fine
    * cells drop and survivors re-rank densely per coarse cell, exactly
    * like [[KMeans.lloyd]].
    *
    * @param idCol row-unique integral id (sampling diversity under
    *              duplicate-heavy corpora — the flat trainers' rule).
    *              Integrality is ENFORCED (round-16 verdict: the
    *              documented contract was never checked) — every
    *              consumer of a trained codebook keys its ledger by
    *              long, and a string id would cast to all-NULL there
    *              silently; pre-assign a dense long id for other types.
    */
  def train(corpus: DataFrame, vec: String, idCol: String, k: Int,
      itersCoarse: Int = 4, itersFine: Int = 3,
      perCellSampleMax: Int = 2000): Codebook = {
    Similarity.integralIdType(corpus, idCol)
    require(k >= 1, s"ivf train requires k >= 1, got $k")
    // perCellSampleMax bounds per-(coarse,fine) Long sums well inside
    // double-exact floored division (s <= m·2^24 < 2^53)
    require(perCellSampleMax >= 1 && perCellSampleMax <= (1 << 26),
      s"perCellSampleMax out of range: $perCellSampleMax")
    val kc = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val coarse = Similarity.trainKmeansCentroidsFull(
      corpus, vec, kc, itersCoarse, idCol = Some(idCol))
    val kf = math.max(1, math.ceil(k.toDouble / coarse.length).toInt)

    val sampled = corpus
      // a vector whose length differs from the coarse dims must not
      // become a fine SEED: one ragged candidate in a cell's list nulls
      // the kernel for every row of that cell (the corrupt-to-NULL
      // contract), killing the whole cell's training
      .filter(size(col(vec)) === coarse(0).length)
      .select(col(idCol).as("__id"),
        Similarity.cellAssign(col(vec), coarse).as("__coarse"),
        KMeans.quantize(col(vec)).as("__xq"))
      .withColumn("__rank", row_number().over(
        Window.partitionBy("__coarse")
          .orderBy(xxhash64(col("__id")), col("__id"))))
      .filter(col("__rank") <= perCellSampleMax)
      .persist()
    try {
      // materialize the (k-row) codebook ONCE while the sample cache is
      // live, as a PERSIST with intact lineage — not localCheckpoint:
      // a truncated-lineage block evicted between a build and a later
      // oracle render dies with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND,
      // while a persisted frame recomputes (every stage here is
      // deterministic, so the recompute is bit-identical)
      val withGlobal = lloydPerParent(
          sampled.select(col("__coarse").as("__parent"), col("__rank"),
            col("__xq")), kf, itersFine)
        .select(
          col("__parent").cast("int").as("coarse"),
          (col("__parent") * kf + col("__sub")).cast("int").as("cell"),
          col("c"))
        .persist()
      withGlobal.count()
      Codebook(coarse, withGlobal, kf)
    } finally {
      sampled.unpersist()
      ()
    }
  }

  /** The bounded-sample integer Lloyd loop every distributed level of a
    * codebook trains with — extracted from [[train]] (round-18, so
    * [[train3]]'s two deep levels run the IDENTICAL update). Input:
    * (__parent, __rank, __xq) rows, `__rank` the per-parent
    * deterministic hash order. Output: (__parent, __sub: int, c) —
    * up to `kPer` centroids per parent, densely re-ranked; empty cells
    * absent. Deterministic end-to-end (seeds = each parent's first
    * `kPer` sample rows, integer-exact Lloyd with (distance, cell)
    * tie-breaks, floored-division updates).
    */
  private def lloydPerParent(
      sampled: DataFrame, kPer: Int, iters: Int): DataFrame = {
    var cents = sampled.filter(col("__rank") <= kPer)
      .select(col("__parent"),
        (col("__rank") - 1).cast("int").as("__sub"), col("__xq").as("c"))
    for (_ <- 0 until iters) {
      val cands = cents.groupBy("__parent")
        .agg(sort_array(collect_list(struct(col("__sub"), col("c"))))
          .as("__cands"))
      // assignment in its OWN projection below the explode — fused,
      // ExtractGenerator hoists the kernel above the Generate and it
      // re-runs once per exploded dimension (the q99/KMeans.lloyd
      // 64× trap)
      val assigned = sampled.join(cands, Seq("__parent"))
        .select(col("__parent"),
          nearestCandidate(col("__xq"), col("__cands")).as("__sub"),
          col("__xq"))
        .filter(col("__sub").isNotNull)
      val upd = assigned
        .select(col("__parent"), col("__sub"),
          posexplode(col("__xq")).as(Seq("dim", "v")))
        .groupBy("__parent", "__sub", "dim")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
      // exact floored division (the KMeans.lloyd update in Column
      // form): s − pmod(s, n) is an exact multiple of n and both fit
      // double exactly under the sample bound, so `/` is exact
      cents = upd
        .groupBy("__parent", "__sub")
        .agg(sort_array(collect_list(struct(col("dim"), col("s"), col("n"))))
          .as("__dims"))
        .select(col("__parent"), col("__sub"),
          transform(col("__dims"), x =>
            ((x.getField("s") - pmod(x.getField("s"), x.getField("n")))
              / x.getField("n")).cast("long")).as("c"))
        // empty cells are absent; survivors re-rank densely per
        // parent cell in old-id order (the lloyd/lloydSql dense_rank)
        .withColumn("__sub",
          (row_number().over(
            Window.partitionBy("__parent").orderBy("__sub")) - 1).cast("int"))
    }
    cents
  }

  /** Assigns every row its global fine cell: map-side coarse assignment
    * (√k literals), a coarse-keyed codebook join, and the codegen'd
    * candidate argmin. Rows that cannot assign (vector length differs
    * from the codebook's, or a coarse cell with no fine entries — only
    * possible for data outside the training distribution) get a NULL
    * cell, visible to the caller rather than silently binned.
    */
  def assign(df: DataFrame, vec: String, cb: Codebook,
      outCol: String = "cell"): DataFrame = {
    Seq("__ivf_coarse", "__ivf_xq", "__ivf_cands", "__ivf_cb_coarse")
      .foreach { c =>
        require(!df.columns.contains(c), s"input already carries $c")
      }
    val cands = fineCands(cb, "__ivf_cands", "__ivf_cb_coarse")
    df.withColumn("__ivf_coarse", Similarity.cellAssign(col(vec), cb.coarse))
      .withColumn("__ivf_xq", KMeans.quantize(col(vec)))
      .join(cands, col("__ivf_coarse") === col("__ivf_cb_coarse"), "left")
      .withColumn(outCol, nearestCandidate(col("__ivf_xq"), col("__ivf_cands")))
      .drop("__ivf_coarse", "__ivf_xq", "__ivf_cands", "__ivf_cb_coarse")
  }

  // --- three-level codebook (round-18, r17 verdict task 2) -------------------

  /** A trained THREE-level codebook — the corpus-scaled-k mitigation
    * the two-level module's own long-run note names (BENCH_SCALING
    * round-17): with SemDeDup's k ∝ n, [[assign]]'s per-row cost is
    * Θ(√k·d) (√k coarse plan literals + ~√k joined fine candidates),
    * so TOTAL assignment work is n^1.5 — measured 3.20 s → 36.9 s for
    * 10× data at k = 800 → 8000 (sf10 → sf100), the next decade's
    * super-linear row. Adding a level bounds the per-row term at
    * Θ(3·k^⅓·d): k^⅓ top-level plan literals, then two candidate
    * joins of ~k^⅓ entries each — at k = 8000 that is 20+20+20
    * centroid distances per row instead of ~90+90, and the gap widens
    * as √k/k^⅓ = k^(1/6) with every further decade. Plan bytes and
    * trainer driver state shrink the same way (O(k^⅓·d)).
    *
    * Layout mirrors [[Codebook]] one level deeper: `mid` and `fine`
    * are both (coarse, cell, c) frames in [[KMeans.quantize]]'s
    * integer domain — `mid.coarse` is the top cell, `mid.cell` the
    * global mid id (top·midK + rank); `fine.coarse` is that global mid
    * id, `fine.cell` the global fine id (mid·fineK + rank). Both
    * levels train with the SAME integer Lloyd ([[lloydPerParent]]) the
    * two-level fine half uses, so assignment is bit-reproducible and a
    * DuckDB oracle hash-matches it end-to-end (q109: two chained
    * [[assignCteSql]] steps over two rendered codebook CTEs).
    */
  final case class Codebook3(coarse: Array[Array[Double]], mid: DataFrame,
      fine: DataFrame, midK: Int, fineK: Int) extends AnyCodebook {
    def release(): Unit = { mid.unpersist(); fine.unpersist(); () }
  }

  /** Trains the three-level codebook: k^⅓ top centroids distributed
    * ([[Similarity.trainKmeansCentroidsFull]]), then a bounded
    * hash-ordered sample per top cell trains ~√(k/k^⅓) mid centroids
    * per top cell, the sample re-keys by its assigned mid cell
    * (re-ranked per mid cell), and the same loop trains the fine level
    * — total fine cells ≈ k. Deterministic end-to-end like [[train]];
    * rows whose vector length differs from the top dims influence
    * neither deep level.
    */
  def train3(corpus: DataFrame, vec: String, idCol: String, k: Int,
      itersCoarse: Int = 4, itersLevel: Int = 3,
      perCellSampleMax: Int = 2000): Codebook3 = {
    Similarity.integralIdType(corpus, idCol)
    require(k >= 1, s"ivf train3 requires k >= 1, got $k")
    require(perCellSampleMax >= 1 && perCellSampleMax <= (1 << 26),
      s"perCellSampleMax out of range: $perCellSampleMax")
    val kc = math.max(1, math.ceil(math.cbrt(k.toDouble)).toInt)
    val coarse = Similarity.trainKmeansCentroidsFull(
      corpus, vec, kc, itersCoarse, idCol = Some(idCol))
    // per-level branching so kc · per · per ≈ k
    val per = math.max(1,
      math.ceil(math.sqrt(k.toDouble / coarse.length)).toInt)

    def ranked(keyed: DataFrame, key: String): DataFrame =
      keyed.withColumn("__rank", row_number().over(
        Window.partitionBy(key).orderBy(xxhash64(col("__id")), col("__id"))))
        .filter(col("__rank") <= perCellSampleMax)

    val sampled = ranked(
      corpus
        .filter(size(col(vec)) === coarse(0).length)
        .select(col(idCol).as("__id"),
          Similarity.cellAssign(col(vec), coarse).as("__top"),
          KMeans.quantize(col(vec)).as("__xq")),
      "__top").persist()
    try {
      val mid = lloydPerParent(
          sampled.select(col("__top").as("__parent"), col("__rank"),
            col("__xq")), per, itersLevel)
        .select(col("__parent").cast("int").as("coarse"),
          (col("__parent") * per + col("__sub")).cast("int").as("cell"),
          col("c"))
        .persist()
      mid.count()
      // re-key the sample by its assigned mid cell; the re-rank gives
      // each mid cell its own deterministic seed order (a top-cell rank
      // would seed every mid child from the same leading rows)
      val midCands = candsOf(mid, "__cands3", "__parent")
      val sampledMid = ranked(
        sampled.join(midCands, col("__top") === col("__parent"))
          .select(col("__id"),
            nearestCandidate(col("__xq"), col("__cands3")).as("__mid"),
            col("__xq"))
          .filter(col("__mid").isNotNull),
        "__mid").persist()
      try {
        val fine = lloydPerParent(
            sampledMid.select(col("__mid").as("__parent"), col("__rank"),
              col("__xq")), per, itersLevel)
          .select(col("__parent").cast("int").as("coarse"),
            (col("__parent") * per + col("__sub")).cast("int").as("cell"),
            col("c"))
          .persist()
        fine.count()
        Codebook3(coarse, mid, fine, per, per)
      } finally {
        sampledMid.unpersist()
        ()
      }
    } finally {
      sampled.unpersist()
      ()
    }
  }

  /** Assigns every row its global fine cell through the three-level
    * codebook: map-side top assignment (k^⅓ literals), then TWO
    * candidate joins (top → mid entries, mid → fine entries) each
    * resolved by the codegen'd [[graft.plans.NearestCandidate]] argmin
    * — O(k^⅓·d) work and plan bytes per row at every step. AQE
    * broadcasts both codebook sides while they fit (each is ≤ k rows
    * of narrow integers). Rows that cannot assign (ragged vector, or a
    * cell with no deeper entries) carry a NULL through both joins —
    * visible, never silently binned, exactly [[assign]]'s contract.
    */
  def assign3(df: DataFrame, vec: String, cb: Codebook3,
      outCol: String = "cell"): DataFrame = {
    Seq("__ivf3_top", "__ivf3_xq", "__ivf3_mid",
      "__ivf3_mc", "__ivf3_mc_top", "__ivf3_fc", "__ivf3_fc_mid")
      .foreach { c =>
        require(!df.columns.contains(c), s"input already carries $c")
      }
    val midCands = candsOf(cb.mid, "__ivf3_mc", "__ivf3_mc_top")
    val fineCands3 = candsOf(cb.fine, "__ivf3_fc", "__ivf3_fc_mid")
    df.withColumn("__ivf3_top", Similarity.cellAssign(col(vec), cb.coarse))
      .withColumn("__ivf3_xq", KMeans.quantize(col(vec)))
      .join(midCands, col("__ivf3_top") === col("__ivf3_mc_top"), "left")
      .withColumn("__ivf3_mid",
        nearestCandidate(col("__ivf3_xq"), col("__ivf3_mc")))
      .join(fineCands3, col("__ivf3_mid") === col("__ivf3_fc_mid"), "left")
      .withColumn(outCol, nearestCandidate(col("__ivf3_xq"), col("__ivf3_fc")))
      .drop("__ivf3_top", "__ivf3_xq", "__ivf3_mid",
        "__ivf3_mc", "__ivf3_mc_top", "__ivf3_fc", "__ivf3_fc_mid")
  }

  // --- tier-agnostic dispatch (round-19, r18 verdict task 1) -----------------

  /** Trains the right codebook depth for `k` — the [[Dedup.semDedupScaled]]
    * threshold applied at the TRAIN call so durable consumers
    * ([[graft.jobs.CorpusPrep.compactNearDups]]) pick up the deep tier
    * at exactly the measured crossover instead of riding the two-level
    * n^1.5 assign term past it (BENCH_SCALING r17: 3.20 s → 36.9 s per
    * 10× of data at k = 800 → 8000; r18: three-level assign 2.2× faster
    * at k = 8000). `deepMinK` defaults to that measured point.
    */
  def trainTiered(corpus: DataFrame, vec: String, idCol: String, k: Int,
      deepMinK: Int = 8000): AnyCodebook =
    if (k >= deepMinK) train3(corpus, vec, idCol, k)
    else train(corpus, vec, idCol, k)

  /** [[assign]]/[[assign3]] behind the depth switch. */
  def assignAny(df: DataFrame, vec: String, cb: AnyCodebook,
      outCol: String = "cell"): DataFrame = cb match {
    case c: Codebook => assign(df, vec, c, outCol)
    case c: Codebook3 => assign3(df, vec, c, outCol)
  }

  /** [[save]]/[[save3]] behind the depth switch — both layouts share
    * `coarse`/`fine`/`meta`; the three-level state adds `mid`, which is
    * also how [[loadAny]] tells them apart.
    */
  def saveAny(cb: AnyCodebook, dir: String): Unit = cb match {
    case c: Codebook => save(c, dir)
    case c: Codebook3 => save3(c, dir)
  }

  /** Loads whichever depth was saved under `dir`: the presence of the
    * `mid` level is the (backward-compatible) discriminator — every
    * pre-round-19 durable state is two-level and loads unchanged.
    */
  def loadAny(spark: org.apache.spark.sql.SparkSession,
      dir: String): AnyCodebook = {
    val mid = new org.apache.hadoop.fs.Path(s"$dir/mid")
    val fs = mid.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(mid)) load3(spark, dir) else load(spark, dir)
  }

  /** The coarse centroids re-quantized into [[KMeans.quantize]]'s
    * integer domain — ONE implementation of the clamp-before-floor rule
    * (the round-12 divergence class), shared by [[driftFraction]] and
    * [[typicalCoarseD2]] (round-15 review: two hand-rolled copies).
    */
  private def coarseQuantized(
      coarse: Array[Array[Double]]): Seq[(Int, Seq[Long])] =
    coarse.zipWithIndex.map { case (c, i) =>
      (i, c.map(x => math.floor(
        math.min(math.max(x * KMeans.Scale, -KMeans.QBound.toDouble),
          KMeans.QBound.toDouble)).toLong).toSeq)
    }.toSeq

  /** Squared distance (quantized domain) from `__xq` to the row's
    * `__c`-indexed coarse centroid. NULL when the vector's length
    * differs from the centroid's (zip_with null-pads).
    */
  private def coarseD2(cb: AnyCodebook): Column =
    sqDist(col("__xq"),
      element_at(map_from_entries(typedLit(coarseQuantized(cb.coarse))),
        col("__c")))

  /** Query-side probe over the two-level codebook — the SEARCH half of
    * the hierarchical index (assignment alone only builds it): each
    * query row gets the `nProbeFine` nearest FINE cells drawn from its
    * `nProbeCoarse` nearest COARSE cells' codebook entries, as an
    * `array<int>` ready for [[Similarity.ivfTopKProbed]]. Per-query
    * work is O(nProbeCoarse·√k·d) against joined codebook rows — the
    * flat probe ([[Similarity.probeCells]]) scans all k centroid
    * literals, which is exactly the O(k·d) plan/driver term this module
    * removes. Integer-exact scoring with (distance, cell) tie-breaks,
    * so a DuckDB oracle reproduces the probe lists bit-for-bit
    * ([[probeSelectSql]]). Queries whose vector cannot score (ragged
    * length) get an EMPTY probe list. `idCol` must be a row-unique
    * INTEGRAL id — integrality is enforced (round-16 verdict; the
    * downstream search keys by long, where a string id casts to
    * all-NULL silently). Row-uniqueness stays the caller's contract:
    * the per-query regroup keys on `idCol` alone (grouping on every
    * input column broke on unorderable incidental columns and merged
    * rows differing only in float normalization, round-15 review), so
    * rows SHARING an id get one probe list computed over the UNION of
    * their scored candidates — each duplicate row receives that merged
    * list through the id-keyed join back (pinned by IvfSpec; a
    * distributed uniqueness assert would cost an extra full aggregation
    * per call, so the defined-merge behavior is documented instead).
    */
  def probeCells(queries: DataFrame, idCol: String, vec: String,
      cb: Codebook, nProbeCoarse: Int, nProbeFine: Int,
      outCol: String = "probes"): DataFrame = {
    Similarity.integralIdType(queries, idCol)
    require(nProbeCoarse >= 1 && nProbeCoarse <= cb.coarse.length,
      s"nProbeCoarse must be in [1, ${cb.coarse.length}], got $nProbeCoarse")
    require(nProbeFine >= 1, s"nProbeFine must be >= 1, got $nProbeFine")
    Seq("__ivf_q_parent", "__ivf_q_xq", "__ivf_q_cands", "__ivf_q_scored",
      "__ivf_q_cb_parent", "__ivf_q_all", outCol)
      .foreach { c =>
        require(!queries.columns.contains(c), s"input already carries $c")
      }
    // coarse probes are the float-domain struct sort over the √k
    // literals (the Similarity machinery, oracle twin probeCellsSql);
    // quantization in a SEPARATE projection below the explode (the
    // ExtractGenerator hoist trap)
    val probed = queries.select(col(idCol), col(vec))
      .withColumn("__ivf_q_xq", KMeans.quantize(col(vec)))
      .withColumn("__ivf_q_parent",
        explode(Similarity.probeCells(col(vec), cb.coarse, nProbeCoarse)))
    val probes = probeHop(probed, idCol, cb.fine, nProbeFine, outCol)
    queries.join(probes, Seq(idCol), "left")
      .withColumn(outCol,
        coalesce(col(outCol), array().cast("array<int>")))
  }

  /** One probe hop — the exactness-critical scoring shared by
    * [[probeCells]] and both stages of [[probeCells3]] (single-sourced
    * so the integer scoring, NULL exclusion, and (d, cell) total order
    * cannot drift between the two-level and three-level paths; the
    * DuckDB twin is [[probeSelectSql]], reused per hop the same way).
    * Input rows carry (idCol, __ivf_q_xq, __ivf_q_parent) — one row
    * per (query, probed parent cell); output is one (idCol, outCol)
    * row per query whose probes scored, outCol = the `nProbe` nearest
    * `level` cells drawn from the probed parents' union. The probe
    * list is GLOBAL over that union — flatten, one total-order sort,
    * slice (collect_list order is nondeterministic; array_sort over
    * (d, cell) structs restores a data-only order).
    */
  private def probeHop(probed: DataFrame, idCol: String, level: DataFrame,
      nProbe: Int, outCol: String): DataFrame = {
    val cands = candsOf(level, "__ivf_q_cands", "__ivf_q_cb_parent")
    val scored = probed
      .join(cands, col("__ivf_q_parent") === col("__ivf_q_cb_parent"), "left")
      .withColumn("__ivf_q_scored",
        filter(
          transform(coalesce(col("__ivf_q_cands"),
            array().cast("array<struct<cell:int,c:array<bigint>>>")),
            cand => struct(
              sqDist(col("__ivf_q_xq"), cand.getField("c")).as("d"),
              cand.getField("cell").as("cell"))),
          s => s.getField("d").isNotNull))
    scored
      .groupBy(col(idCol))
      .agg(flatten(collect_list(col("__ivf_q_scored"))).as("__ivf_q_all"))
      .select(col(idCol),
        transform(slice(array_sort(col("__ivf_q_all")), 1, nProbe),
          s => s.getField("cell")).as(outCol))
  }

  /** Query-side probe over the THREE-level codebook — [[probeCells]]
    * one level deeper, completing [[Codebook3]] as a full index
    * (build [[train3]], maintain [[assign3]], search here): each query
    * row probes its `nProbeTop` nearest top cells (k^⅓ plan literals),
    * scores those cells' mid entries for the `nProbeMid` nearest mid
    * cells, then scores THOSE cells' fine entries for the `nProbeFine`
    * nearest fine cells — O(nProbe·k^⅓·d) work per query per hop
    * against the two-level probe's O(nProbe·√k·d). Same integer-exact
    * scoring and (distance, cell) tie-breaks per hop ([[probeHop]]),
    * so the DuckDB twin is two chained [[probeSelectSql]] steps
    * (q110). Ragged queries get an EMPTY probe list, like
    * [[probeCells]]; rows sharing an id get the union-merged list
    * (the documented probeCells contract).
    */
  def probeCells3(queries: DataFrame, idCol: String, vec: String,
      cb: Codebook3, nProbeTop: Int, nProbeMid: Int, nProbeFine: Int,
      outCol: String = "probes"): DataFrame = {
    Similarity.integralIdType(queries, idCol)
    require(nProbeTop >= 1 && nProbeTop <= cb.coarse.length,
      s"nProbeTop must be in [1, ${cb.coarse.length}], got $nProbeTop")
    require(nProbeMid >= 1, s"nProbeMid must be >= 1, got $nProbeMid")
    require(nProbeFine >= 1, s"nProbeFine must be >= 1, got $nProbeFine")
    Seq("__ivf_q_xq", "__ivf_q_parent", "__ivf_q_cands", "__ivf_q_scored",
      "__ivf_q_cb_parent", "__ivf_q_all", "__ivf_q_mids", outCol)
      .foreach { c =>
        require(!queries.columns.contains(c), s"input already carries $c")
      }
    val base = queries.select(col(idCol), col(vec))
      .withColumn("__ivf_q_xq", KMeans.quantize(col(vec)))
    val topProbed = base.withColumn("__ivf_q_parent",
      explode(Similarity.probeCells(col(vec), cb.coarse, nProbeTop)))
    val mids = probeHop(topProbed, idCol, cb.mid, nProbeMid, "__ivf_q_mids")
    // explode drops queries whose mid list is empty (ragged vectors) —
    // the final left join + coalesce restores their empty probe list
    val midProbed = base.join(mids, Seq(idCol))
      .withColumn("__ivf_q_parent", explode(col("__ivf_q_mids")))
      .drop("__ivf_q_mids")
    val probes = probeHop(midProbed, idCol, cb.fine, nProbeFine, outCol)
    queries.join(probes, Seq(idCol), "left")
      .withColumn(outCol,
        coalesce(col(outCol), array().cast("array<int>")))
  }

  /** SQL twin of [[probeCells]] as a SELECT body over `qName` (must
    * expose q_id, xq and `coarseListExpr` — the rendered
    * [[Similarity.probeCellsSql]] list): emits (q_id, probes). Sort
    * keys stay BIGINT end-to-end — a DOUBLE-cast distance would
    * tie-collapse past 2^53 on this side only — and NULL distances
    * (ragged vectors) are excluded like the Spark side's filter (a
    * fully-ragged query then has no row here ≡ an empty probe list
    * there: both contribute zero search candidates).
    */
  def probeSelectSql(qName: String, cbName: String, coarseListExpr: String,
      nProbeFine: Int): String =
    s"""SELECT q_id, list_transform(
       |    list_slice(list_sort(list([d, cellb])), 1, $nProbeFine),
       |    x -> CAST(x[2] AS INTEGER)) AS probes
       |  FROM (
       |    SELECT qq.q_id,
       |           ${sqDistSql("qq.xq", s"$cbName.c")} AS d,
       |           CAST($cbName.cell AS BIGINT) AS cellb
       |    FROM (SELECT q_id, xq, unnest($coarseListExpr) AS probe_coarse
       |          FROM $qName) qq
       |    JOIN $cbName ON $cbName.coarse = qq.probe_coarse) s
       |  WHERE d IS NOT NULL
       |  GROUP BY q_id""".stripMargin

  /** Retrain trigger for incremental maintenance: the fraction of delta
    * rows whose nearest-COARSE squared distance (quantized domain)
    * exceeds `tolerance²` times the codebook's per-cell typical
    * (training-time mean) squared distance. Distribution drift pushes
    * new points far from every trained centroid; assignment stays
    * well-defined (nearest cell always exists) but recall decays — this
    * quantifies it as one scan of the (small) delta. Rows that cannot
    * be scored against the codebook at all — a ragged vector length,
    * exactly what an upstream embedder regression produces — count as
    * FAR, like rows landing in a coarse cell the typical map has never
    * seen (round-15 review: they previously nulled out of the
    * numerator while staying in the denominator).
    */
  def driftFraction(delta: DataFrame, vec: String, cb: AnyCodebook,
      typicalD2: Map[Int, Double], tolerance: Double): Double = {
    require(tolerance > 0.0, s"tolerance must be positive: $tolerance")
    val spark = delta.sparkSession
    import spark.implicits._
    val typ = typicalD2.toSeq.toDF("__c", "__d2")
    val d = delta
      .select(Similarity.cellAssign(col(vec), cb.coarse).as("__c"),
        KMeans.quantize(col(vec)).as("__xq"))
      .join(broadcast(typ), Seq("__c"), "left")
      // a delta row landing in a coarse cell the typical map has never
      // seen IS drift — count it far (0.0 baseline), don't null it away
      .withColumn("__d2", coalesce(col("__d2"), lit(0.0)))
    val scored = d.withColumn("__d", coarseD2(cb))
    val row = scored.select(
      count(lit(1)).as("n"),
      count(when(col("__d").isNull ||
        col("__d").cast("double") > col("__d2") * tolerance * tolerance,
        lit(1))).as("far"))
      .collect()(0)
    val n = row.getLong(0)
    if (n == 0) 0.0 else row.getLong(1).toDouble / n
  }

  /** Per-coarse-cell mean squared distance AT TRAINING TIME — the
    * frozen baseline [[driftFraction]] compares against (compute it
    * once per retrain and carry it forward across incremental passes:
    * recomputing it over drifted data ratchets the baseline toward the
    * drift and the trigger never fires — round-15 review). One
    * bounded-sample scan, keyed by a row-unique id like every sampler
    * here (hashing the vector VALUE lets one duplicated embedding flood
    * the sample and starve most cells from the map).
    */
  def typicalCoarseD2(corpus: DataFrame, vec: String, idCol: String,
      cb: AnyCodebook, sampleMax: Int = 10000): Map[Int, Double] = {
    val d = corpus
      .select(KMeans.quantize(col(vec)).as("__xq"),
        Similarity.cellAssign(col(vec), cb.coarse).as("__c"),
        xxhash64(col(idCol)).as("__h"), col(idCol).as("__id"))
      .sort(col("__h"), col("__id")).limit(sampleMax)
      .withColumn("__d", coarseD2(cb))
    d.filter(col("__d").isNotNull)
      .groupBy("__c").agg(avg(col("__d").cast("double")).as("__m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
  }

  // --- durable index state (incremental maintenance across restarts) --------

  /** Persists the codebook under `dir` (parquet: `coarse` as
    * (i, c double[]), `fine` as-is, `meta` as one (fineK) row) — the
    * index state a daily-ingest compaction reloads instead of
    * retraining ([[graft.jobs.CorpusPrep.compactNearDups]]). The coarse
    * half is √k rows and the fine half k rows: writing is O(k·d) DATA,
    * never driver memory.
    */
  def save(cb: Codebook, dir: String): Unit = {
    val spark = cb.fine.sparkSession
    import spark.implicits._
    cb.coarse.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("i", "c")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/coarse")
    cb.fine.write.mode("overwrite").parquet(s"$dir/fine")
    Seq(Tuple1(cb.fineK)).toDF("fineK")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Codebook = {
    val coarse = spark.read.parquet(s"$dir/coarse")
      .collect().sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
    require(coarse.nonEmpty, s"no coarse centroids under $dir/coarse")
    val fineK = spark.read.parquet(s"$dir/meta").collect()(0).getInt(0)
    Codebook(coarse, spark.read.parquet(s"$dir/fine").persist(), fineK)
  }

  /** [[save]]/[[load]] for the three-level codebook — same layout one
    * level deeper (`coarse`, `mid`, `fine`, `meta` = one (midK, fineK)
    * row). Both deep levels are ≤ k rows of narrow integers: writing
    * is O(k·d) DATA, never driver memory.
    */
  def save3(cb: Codebook3, dir: String): Unit = {
    val spark = cb.fine.sparkSession
    import spark.implicits._
    cb.coarse.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("i", "c")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/coarse")
    cb.mid.write.mode("overwrite").parquet(s"$dir/mid")
    cb.fine.write.mode("overwrite").parquet(s"$dir/fine")
    Seq((cb.midK, cb.fineK)).toDF("midK", "fineK")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load3(spark: org.apache.spark.sql.SparkSession, dir: String): Codebook3 = {
    val coarse = spark.read.parquet(s"$dir/coarse")
      .collect().sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
    require(coarse.nonEmpty, s"no coarse centroids under $dir/coarse")
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    Codebook3(coarse,
      spark.read.parquet(s"$dir/mid").persist(),
      spark.read.parquet(s"$dir/fine").persist(),
      meta.getInt(0), meta.getInt(1))
  }

  // --- oracle-scale affordances ---------------------------------------------

  /** Collects a distributed codebook level — ORACLE/TEST SCALE ONLY
    * (the operator itself never collects it; at production k this is
    * the O(k·d) pull the design exists to avoid). Works for the
    * two-level fine frame and either deep level of a [[Codebook3]]
    * (same (coarse, cell, c) layout).
    */
  def collectLevel(level: DataFrame): Seq[(Int, Int, Seq[Long])] =
    level.select(col("coarse"), col("cell"), col("c"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2)))
      .sortBy(r => (r._1, r._2))

  def collectFine(cb: Codebook): Seq[(Int, Int, Seq[Long])] =
    collectLevel(cb.fine)

  /** DuckDB CTE rendering the collected codebook as literal rows:
    * `name(coarse, cell, c)`.
    */
  def codebookCteSql(name: String, rows: Seq[(Int, Int, Seq[Long])]): String = {
    require(rows.nonEmpty, "empty codebook")
    val vals = rows.map { case (coarse, cell, c) =>
      s"($coarse, $cell, ${c.mkString("[", ", ", "]")}::BIGINT[])"
    }.mkString(",\n    ")
    s"$name(coarse, cell, c) AS (VALUES\n    $vals)"
  }

  /** SQL twin of the per-row integer argmin [[nearestCandidate]]
    * evaluates, as a CTE body: `eName` must expose (vec_id, coarse, xq);
    * emits one (vec_id, cell) row per assignable input row — exact
    * BIGINT squared distance, ties to the smaller cell id, rows whose
    * coarse cell has no codebook entries dropped by the inner join
    * (the Spark side filters its NULL cells identically).
    */
  def assignCteSql(eName: String, cbName: String): String =
    s"""SELECT vec_id, cell FROM (
       |    SELECT $eName.vec_id, $cbName.cell,
       |           ROW_NUMBER() OVER (PARTITION BY $eName.vec_id ORDER BY
       |             ${sqDistSql(s"$eName.xq", s"$cbName.c")},
       |             $cbName.cell) AS rn
       |    FROM $eName JOIN $cbName ON $eName.coarse = $cbName.coarse)
       |  WHERE rn = 1""".stripMargin

  /** SQL twin of [[KMeans.quantize]] over a whole list column. */
  def quantizeListSql(vec: String): String =
    s"list_transform($vec, x -> ${KMeans.quantizeSql("x")})"
}
