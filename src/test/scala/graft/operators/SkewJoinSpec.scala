package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join and spreads the hot key") {
    // 90% of fact rows on one key
    val large = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong + 1000))).toDF("k", "v")
    val small = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
    val salted = SkewJoin.saltedJoin(large, small, "k", salts = 8, saltExpr = $"v")
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    val plain = large.join(small, "k")
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    // hot key spread over multiple salts
    val spread = large.filter($"k" === 1L)
      .select(pmod(xxhash64($"v"), lit(8)).as("s"))
      .distinct().count()
    assert(spread > 4)
  }
}
