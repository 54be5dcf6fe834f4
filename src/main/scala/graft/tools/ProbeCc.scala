package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Round-19 optimization probe (temporary diagnostic, the Probe100
  * pattern): times [[Dedup.dupClusters]]' forced-distributed branch
  * under different `freeRounds` settings, ALTERNATED inside one JVM so
  * bursty hypervisor steal hits both variants alike. Also verifies the
  * two variants produce identical labels (fixpoint is fixpoint).
  *
  * Usage: sbt "runMain graft.tools.ProbeCc /root/testdata/sf0.1"
  */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pairs = Dedup.minhashLshPairs(Tables.documents(spark, d),
      "doc_id", "text").persist()
    println(s"PROBE pairs=${pairs.count()}")
    def labelsSum(fr: Int): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val l = Dedup.dupClusters(pairs, driverMaxEdges = 0L, freeRounds = fr)
      val r = l.agg(count(lit(1)), sum(col("id") * col("cluster"))).collect()(0)
      ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getLong(1))
    }
    for (pass <- 1 to 3; fr <- Seq(6, 2, 1)) {
      val (t, n, s) = labelsSum(fr)
      println(f"PROBE cc pass=$pass freeRounds=$fr sec=$t%.2f n=$n checksum=$s")
    }
    spark.stop()
  }
}
