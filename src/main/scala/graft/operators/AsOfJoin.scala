package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-time) join — SURVEY.md §2.3 J3, the ferrybox↔sample
  * match (reference: ifcb-data-pipeline.Rmd:265-269,292-293,
  * `ifcb_get_ferrybox_data(max_time_diff_min = 5)`).
  *
  * Semantics: each left row is matched to the right row (sharing the equi
  * keys) whose timestamp is nearest by absolute difference and within
  * `toleranceSec`; ties break to the earlier right row (SURVEY.md §7.4
  * risk 1), then by `rightTieBreak` for a total order.
  *
  * Scale design: a naive `abs(lts - rts) <= tol` predicate is non-equi, so
  * Catalyst plans a broadcast-nested-loop — O(n·m) and a driver OOM at
  * 100 TB. Instead both sides get an equi-joinable time bucket of width
  * `toleranceSec`; the right side is replicated into its bucket ±1 (3×, a
  * constant factor independent of data size), the join runs as a plain
  * shuffled/broadcast HASH join on (keys, bucket), and a window keeps the
  * nearest candidate. Any right row within tolerance is guaranteed to land
  * in the left row's bucket ±1, so no matches are lost.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference/quote) side; its non-key columns are
    *                   prefixed with `rightPrefix` in the output
    * @param on         equi key column names present on both sides
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param toleranceSec max |leftTs - rightTs| in seconds (inclusive)
    * @param leftId     column(s) uniquely identifying a left row (window key)
    * @param joinType   "inner" (drop unmatched left rows) or "left"
    * @param direction  "nearest" (abs-diff, the reference's semantics),
    *                   "backward" (right.ts <= left.ts, the SQL ASOF JOIN
    *                   convention) or "forward" (right.ts >= left.ts)
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      toleranceSec: Long,
      leftId: Seq[String],
      rightTieBreak: Seq[String] = Nil,
      rightPrefix: String = "asof_",
      joinType: String = "inner",
      direction: String = "nearest"): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"joinType=$joinType")
    require(Seq("nearest", "backward", "forward").contains(direction),
      s"direction=$direction")
    // toleranceSec = 0 (exact-match intent) would divide into null
    // buckets: the equi join never matches and the result is silently
    // empty / all-null instead of exact matches — reject loudly (an
    // exact-timestamp join is a plain equi join on (keys, ts))
    require(toleranceSec > 0, s"toleranceSec must be positive, got $toleranceSec")
    val tolUs = toleranceSec * 1000000L

    val r0 = right.columns.foldLeft(right) { (df, c) =>
      if (on.contains(c)) df else df.withColumnRenamed(c, rightPrefix + c)
    }
    val rts = rightPrefix + rightTs
    // replicate right rows into bucket-1, bucket, bucket+1
    val r = r0
      .withColumn("__rb", floor(unix_micros(col(rts)) / tolUs))
      .withColumn("__bucket", explode(array(col("__rb") - 1, col("__rb"), col("__rb") + 1)))
      .drop("__rb")
    val l = left.withColumn("__bucket", floor(unix_micros(col(leftTs)) / tolUs))

    val joined = l.join(r, on :+ "__bucket", "left")
    val rawDiff = unix_micros(col(leftTs)) - unix_micros(col(rts))
    val diff = direction match {
      case "nearest" => abs(rawDiff)
      case "backward" => when(rawDiff >= 0L, rawDiff) // right at or before left
      case "forward" => when(rawDiff <= 0L, -rawDiff)
    }
    val withDiff = joined.withColumn(
      "__diff", when(col(rts).isNotNull && diff <= tolUs, diff))

    // nearest candidate per left row: abs-diff asc, earlier right ts on tie
    val ord = (col("__diff").asc_nulls_last +: col(rts).asc +:
      rightTieBreak.map(c => col(rightPrefix + c).asc))
    val w = Window.partitionBy(leftId.map(col): _*).orderBy(ord: _*)
    val picked = withDiff
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__bucket")

    val out =
      if (joinType == "inner") picked.filter(col("__diff").isNotNull)
      else {
        // a bucket-matched but out-of-tolerance candidate must read as no-match
        val rcols = right.columns.filterNot(on.contains).map(rightPrefix + _)
        rcols.foldLeft(picked) { (df, c) =>
          df.withColumn(c, when(col("__diff").isNotNull, col(c)))
        }
      }
    out.drop("__diff")
  }
}
