package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-containment) join — SURVEY.md §2.3 J4, the bin-time ∈
  * cruise-interval join (reference: code/ifcb_ingest_and_qc.R:217-221
  * `join_by(between(datetime, startdate, stopdate))`).
  *
  * Scale design: `pt BETWEEN start AND stop` alone is non-equi →
  * broadcast-nested-loop. Here each interval is exploded into the fixed
  * time buckets it covers (via `sequence`), points carry their single
  * bucket, and the join becomes an equi hash join on (keys, bucket)
  * refined by the exact between predicate. Each qualifying (point,
  * interval) pair matches on exactly one bucket — the point's — so no
  * dedup pass is needed. Bucket width should be of the order of the
  * typical interval length: replication factor ≈ len/bucket + 1.
  */
object IntervalJoin {

  /** @param points     fact side with a timestamp column `pointTs`
    * @param intervals  interval side with `startCol`/`endCol` timestamps
    *                   (inclusive bounds, matching R's `between`)
    * @param on         extra equi key column names on both sides (may be empty)
    * @param bucketSec  bucket width in seconds
    * @param maxReplication replication clamp: intervals spanning more than
    *        this many buckets (a year-long interval at an hourly bucket
    *        replicates 8,760x; a malformed end ≪ start worse) are kept out
    *        of the explode and joined through a plain range predicate
    *        instead — a broadcast-nested-loop over the outliers ONLY, so
    *        the bucketed hash join's fan-out stays bounded. Malformed
    *        intervals (null bounds, end < start) never match, same as R's
    *        `between`. Pass None to disable the clamp (required for any
    *        join type but inner, where the two-path union is not
    *        decomposable). Right/full joins bypass bucketing entirely
    *        (plain range join) so unmatched intervals appear exactly once.
    */
  def contains(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      startCol: String,
      endCol: String,
      on: Seq[String] = Nil,
      bucketSec: Long = 3600L,
      joinType: String = "inner",
      maxReplication: Option[Long] = Some(1000L)): DataFrame = {
    // The bucketed rewrite is only sound for point-preserving join types:
    // each qualifying pair matches on exactly one bucket, so inner/left/
    // semi/anti semantics are exact. Interval-preserving types (right,
    // full) would duplicate an unmatched interval once per exploded
    // bucket and drop null-bound intervals through `explode` — those go
    // through the plain range predicate instead (exact semantics;
    // malformed intervals surface as unmatched rows with nulls).
    val norm = joinType.toLowerCase.replace("_", "")
    val pointPreserving =
      Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")
    if (!pointPreserving.contains(norm)) {
      // never touches bucketing or the clamp, so the maxReplication
      // require below must not fire here (round-11 review: a right/full
      // join with the DEFAULT clamp threw spuriously)
      return points.join(
        intervals,
        on.map(c => points(c) === intervals(c)).foldLeft(
          points(pointTs) >= intervals(startCol) &&
            points(pointTs) <= intervals(endCol))(_ && _),
        joinType)
    }
    require(maxReplication.isEmpty || norm == "inner",
      "maxReplication clamp requires an inner join; pass maxReplication=None")
    // bucketSec = 0 would divide into null buckets and null sequence
    // bounds: the join silently returns empty instead of failing
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    val bUs = bucketSec * 1000000L
    val span = floor(unix_micros(col(endCol)) / bUs) -
      floor(unix_micros(col(startCol)) / bUs) + 1
    // Malformed intervals (null bounds, end < start) never match, same
    // as R's `between`; safe to drop pre-explode on the bucketed path.
    val valid = intervals.filter(col(endCol) >= col(startCol))
    val bucketable = maxReplication.fold(valid)(m => valid.filter(span <= m))
    val iv = bucketable.withColumn(
      "__bucket",
      explode(sequence(
        floor(unix_micros(col(startCol)) / bUs),
        floor(unix_micros(col(endCol)) / bUs))))
    val pt = points.withColumn("__bucket", floor(unix_micros(col(pointTs)) / bUs))
    val bucketed = pt.join(
        iv,
        (on :+ "__bucket").map(c => pt(c) === iv(c)).reduce(_ && _) &&
          pt(pointTs) >= iv(startCol) && pt(pointTs) <= iv(endCol),
        joinType)
      .drop("__bucket")
    maxReplication match {
      case None => bucketed
      case Some(m) =>
        val outliers = valid.filter(span > m)
        val wide = points.join(
          outliers,
          on.map(c => points(c) === outliers(c)).foldLeft(
            points(pointTs) >= outliers(startCol) &&
              points(pointTs) <= outliers(endCol))(_ && _),
          "inner")
        // positional union: both branches emit points-cols ++ interval-cols
        // (unionByName rejects the duplicated equi-key names)
        bucketed.union(wide)
    }
  }
}
