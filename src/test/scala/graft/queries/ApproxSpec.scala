package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Accuracy contracts for the no-oracle sketch queries (q53/q54). */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("q53: HLL count-distinct within 5% of exact; approx quantiles near exact") {
    // the query's own acceptance booleans (what the DuckDB oracle pins)
    val rows = SparkEntry.queries("q53_approx_sketches")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getString(0)
      assert(r.getAs[Boolean]("parts_ok"), s"$k parts_ok")
      assert(r.getAs[Boolean]("p50_ok"), s"$k p50_ok")
      assert(r.getAs[Boolean]("p90_ok"), s"$k p90_ok")
    }
    // tighter-than-oracle bound: recompute sketch vs exact directly
    import org.apache.spark.sql.functions._
    graft.Tables.lineitem(spark, d)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.02).as("apx"),
        countDistinct($"l_partkey").as("nd"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("ap50"),
        expr("percentile(l_quantity, 0.5)").as("p50"))
      .collect().foreach { r =>
        val (k, apx, nd) = (r.getString(0), r.getLong(1), r.getLong(2))
        val (ap50, p50) = (r.getDouble(3), r.getDouble(4))
        assert(math.abs(apx - nd).toDouble / nd < 0.05, s"$k HLL: $apx vs $nd")
        assert(math.abs(ap50 - p50) / p50 < 0.1, s"$k p50: $ap50 vs $p50")
      }
  }

  test("q72 multi-probe dominates q54 single-probe at every common rank") {
    def byRank(name: String) =
      SparkEntry.queries(name)(spark, d)
        .select("query_id", "rank", "cosine")
        .as[(Long, Int, Double)].collect()
        .map { case (q, r, c) => (q, r) -> c }.toMap
    val single = byRank("q54_lsh_ann")
    val multi = byRank("q72_lsh_ann_multiprobe")
    // multi-probe candidates are a superset → its rank-i cosine can only
    // be equal or better, and it never returns fewer rows
    assert(single.keySet.subsetOf(multi.keySet))
    single.foreach { case (key, c) =>
      assert(multi(key) >= c, s"$key: multi ${multi(key)} < single $c")
    }
  }

  test("q54: LSH-restricted ANN returns valid self-consistent rankings") {
    val rows = SparkEntry.queries("q54_lsh_ann")(spark, d).collect()
    assert(rows.nonEmpty)
    // per query: ranks contiguous from 1, cosine non-increasing
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val cos = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cos == cos.sorted.reverse)
    }
  }
}
