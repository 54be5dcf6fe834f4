package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Accuracy contracts for the no-oracle sketch queries (q53/q54). */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("q53: HLL count-distinct within 5% of exact; approx quantiles near exact") {
    val apx = SparkEntry.queries("q53_approx_sketches")(spark, d)
      .select("l_returnflag", "apx_parts", "apx_p50").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = graft.Tables.lineitem(spark, d)
      .groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct($"l_partkey").as("nd"),
        org.apache.spark.sql.functions.expr("percentile(l_quantity, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (nd, p50)) =>
      val (and, ap50) = apx(k)
      assert(math.abs(and - nd).toDouble / nd < 0.05, s"$k HLL: $and vs $nd")
      assert(math.abs(ap50 - p50) / p50 < 0.1, s"$k p50: $ap50 vs $p50")
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
