package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi join (SURVEY.md §4 / the brief's "salting for
  * skew"): explicit key salting for engines/paths where AQE's runtime
  * skew-join split doesn't apply (e.g. the build side is too big to
  * broadcast and one key dominates).
  *
  * The skewed (large) side gets a uniform random-ish salt derived from a
  * stable row expression; the small side is replicated `salts` times.
  * Join key becomes (key, salt) — the hot key's rows spread over `salts`
  * reducers. Replication factor is `salts` on the small side only.
  *
  * ==When AQE's built-in skew split subsumes this, and when it can't==
  *
  * Spark's `OptimizeSkewedJoin` (`spark.sql.adaptive.skewJoin.*`) splits
  * oversized shuffle partitions at runtime with zero code changes — both
  * regimes are pinned by listener in SkewJoinSpec:
  *
  * | scenario | AQE skew split | saltedJoin |
  * |---|---|---|
  * | bare sort-merge equi join, skewed fact | YES — prefer it: runtime-sized splits, no replication cost | works but redundant |
  * | join output feeding a same-key agg/window | NO — splitting would violate the downstream required hash distribution, so the rule skips the join (unless `forceOptimizeSkewedJoin` pays an extra shuffle) | YES — the join spreads over (key, salt); the later agg re-shuffles but map-side partials keep its reducers flat |
  * | broadcast-able dimension | moot — broadcast joins have no reducer | moot |
  * | skewed aggregation, no join | out of scope — the rule only rewrites joins | same trick at groupBy level (salt, partial agg, re-agg) |
  * | reproducible partition layout needed (bucketed sink, differential test) | splits depend on runtime sizes | deterministic: salt is a hash of a stable row expression |
  */
object SkewJoin {

  /** @param large    skewed fact side
    * @param small    dimension side (replicated; must be modest)
    * @param on       equi key column name present on both
    * @param salts    number of splits for hot keys
    * @param saltExpr deterministic per-row expression on `large` used to
    *                 derive the salt (e.g. a unique id column); keeps the
    *                 join reproducible across retries, unlike rand()
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, on: String, salts: Int,
      saltExpr: org.apache.spark.sql.Column): DataFrame = {
    // salts = 0 makes pmod null on the large side while sequence(0, -1)
    // still emits salts on the small side: the join silently returns
    // empty instead of failing (salts = 1 is a valid no-op salting)
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val l = large.withColumn("__salt", pmod(xxhash64(saltExpr), lit(salts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(s, Seq(on, "__salt")).drop("__salt")
  }
}
