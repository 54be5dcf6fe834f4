package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-19 optimization probe (temporary diagnostic, the ProbeCc
  * pattern): times q90's category rollup with its countDistinct keyed
  * by the sample_id STRING vs the recovered LONG carrier, alternated
  * inside one JVM so host steal hits both variants alike, and checks
  * the two aggregates return identical rows.
  *
  * Usage: sbt "runMain graft.tools.ProbeQ90 /root/testdata/sf0.1"
  */
object ProbeQ90 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val roi = Tables.lineitem(spark, d).select(
      $"l_partkey", $"l_orderkey",
      ($"l_extendedprice" / 100.0).as("Area"))
    val cls = Tables.part(spark, d).select($"p_partkey",
      concat($"p_brand", lit(", living")).as("category"))
    val smp = Tables.orders(spark, d).select($"o_orderkey",
      concat(lit("S"), $"o_orderkey").as("sample_id"))
    val input = roi
      .join(broadcast(cls), $"l_partkey" === $"p_partkey")
      .join(smp, $"l_orderkey" === $"o_orderkey")
      .localCheckpoint(true) // shared input, both variants read the same blocks
    def timed(longKey: Boolean): (Double, Long) = {
      val keyed =
        if (longKey) input.withColumn("__k", substring($"sample_id", 2, 20).cast("long"))
        else input.withColumn("__k", $"sample_id")
      val t0 = System.nanoTime()
      val out = keyed.groupBy($"category")
        .agg(count(lit(1)).as("n"), countDistinct($"__k").as("samples"))
        .agg(sum($"n" * $"samples")).collect()(0).getLong(0)
      ((System.nanoTime() - t0) / 1e9, out)
    }
    for (pass <- 1 to 4; lk <- Seq(false, true)) {
      val (t, s) = timed(lk)
      println(f"PROBE q90d pass=$pass longKey=$lk sec=$t%.2f checksum=$s")
    }
    spark.stop()
  }
}
