package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Document-deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine. The reference's
  * dedup slice is exact-match only (SURVEY.md §2.4 A12/A13,
  * merge_training_datasets/01,03); the sketch-based family is the
  * 100 TB-scale extension the brief requires.
  *
  * Scale design, common to all: never materialize the O(n²) pair space.
  * Candidates come from an equi-join on a *bucket key* (hash group, LSH
  * band, SimHash band, shared shingle, IVF cell), are deduped to (a < b),
  * and only then exactly verified. Every join is a hash join on a key with
  * bounded fan-out; the verify step is per-pair O(doc length).
  */
object Dedup {

  /** Exact duplicate groups by arbitrary key columns (A12:
    * 01_create_file_index.R:69-75): groups with >1 member, smallest id as
    * the canonical keeper.
    */
  def exactGroups(df: DataFrame, id: String, key: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(count(lit(1)).as("n"), min(col(id)).as("keeper"))
      .filter(col("n") > 1)

  /** Adds `__sh` (k-shingle set) and `__th` (shingle hashes) to docs. */
  private def withShingleHashes(docs: DataFrame, text: String, k: Int): DataFrame =
    docs
      .withColumn("__sh", Hashing.shingles(Hashing.words(col(text)), k))
      .filter(size(col("__sh")) > 0)
      .withColumn("__th", Hashing.tokHashes(col("__sh")))

  /** Exact Jaccard between two string-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** MinHash + banded LSH near-duplicate pairs (the Broder construction):
    * 8 MinHashes in 4 bands of 2; a shared band is the join key; survivors
    * are verified with exact shingle-set Jaccard ≥ `minJaccard`.
    *
    * At scale: the band join's fan-out is bounded by bucket size; a
    * pathological hot bucket (boilerplate shingles) should be capped or
    * salted — bucket sizes are observable via `groupBy(band, key).count`.
    */
  def minhashLshPairs(
      docs: DataFrame, id: String, text: String,
      shingleK: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val base = withShingleHashes(docs, text, shingleK)
      .select(col(id).as("__id"), col("__sh"), col("__th"))
    val nBands = Hashing.MinHashSeeds.size / 2
    val banded = base.select(
      col("__id"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          (Hashing.minhash(col("__th"), 2 * b) * Hashing.MinP +
            Hashing.minhash(col("__th"), 2 * b + 1)).as("key"))
      }: _*)).as("bk"))
      .select(col("__id"), col("bk.band"), col("bk.key"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
      .distinct()
    cand
      .join(base.select(col("__id").as("id_a"), col("__sh").as("sh_a")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs: 32-bit signature, 4 bands of 8 bits as
    * candidate keys (any pair at Hamming ≤ 3 shares ≥ 1 band — pigeonhole),
    * verified by popcount(xor) ≤ `maxHamming`.
    */
  def simhashPairs(
      docs: DataFrame, id: String, text: String,
      shingleK: Int = 3, maxHamming: Int = 3): DataFrame = {
    val base = withShingleHashes(docs, text, shingleK)
      .select(col(id).as("__id"), Hashing.simhash(col("__th")).as("__sig"))
    val banded = base.select(
      col("__id"), col("__sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("__sig"), 8 * b).bitwiseAND(255L).as("key"))
      }: _*)).as("bk"))
      .select(col("__id"), col("__sig"), col("bk.band"), col("bk.key"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"),
        col("x.__sig").as("sig_a"), col("y.__sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** n-gram Jaccard pairs without sketching: candidates share ≥ 1 shingle
    * (inverted-index join), then exact Jaccard. Exact-recall counterpart
    * of [[minhashLshPairs]]; costlier candidates, no probabilistic miss.
    */
  def ngramJaccardPairs(
      docs: DataFrame, id: String, text: String,
      shingleK: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val base = withShingleHashes(docs, text, shingleK)
      .select(col(id).as("__id"), col("__sh"))
    val inv = base.select(col("__id"), explode(col("__sh")).as("shingle"))
    val cand = inv.as("x").join(inv.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
      .distinct()
    cand
      .join(base.select(col("__id").as("id_a"), col("__sh").as("sh_a")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs within blocks (`blockCol` is
    * the IVF-cell / LSH-bucket stand-in; null → global, only sane for
    * tests). Cosine is a deterministic left-fold (see
    * [[Similarity.cosine]]) so results are partitioning-independent.
    */
  def embeddingNearDupPairs(
      embs: DataFrame, id: String, vec: String,
      minCosine: Double, blockCol: Option[String]): DataFrame = {
    val e = embs.select(
      col(id).as("__id"), col(vec).as("__v"),
      blockCol.map(col).getOrElse(lit(0)).as("__blk"))
    e.as("x").join(e.as("y"),
        col("x.__blk") === col("y.__blk") && col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"),
        Similarity.cosine(col("x.__v"), col("y.__v")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }
}
