package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ivf}

/** Round-17 fourth-decade adjudication probe (temporary diagnostic):
  * measures (1) the uncapped-LSH candidate volume over documents — the
  * arithmetic behind the q52/q75/q95 sf100 refusal — and (2) the
  * intra-cell pair volume of the q91 hierarchical cell model, to
  * separate "pair work grew super-linearly" from "the harness config
  * (fixed 32 shuffle partitions) hit a spill cliff".
  */
object Probe100 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args) {
      val docs = Tables.documents(spark, d)
      val p = Dedup.lshBucketProfile(docs, "doc_id", "text")
      println(s"PROBE lsh dir=$d buckets=${p.buckets} " +
        s"max=${p.maxBucket} cand=${p.candidatePairs}")
      val e = Tables.embeddings(spark, d)
      val n = e.count()
      val k = math.max(8L, (n + 249) / 250).toInt
      if (k > 512) {
        val cb = Ivf.train(e, "embedding", "vec_id", k,
          itersCoarse = 3, itersFine = 2)
        try {
          val cells = Ivf.assign(e, "embedding", cb)
            .filter(col("cell").isNotNull)
            .groupBy("cell").agg(count(lit(1)).as("m"))
          val r = cells.agg(count(lit(1)).as("cells"),
            max(col("m")).as("maxm"),
            sum(expr("m * (m - 1) DIV 2")).as("pairs")).collect()(0)
          println(s"PROBE cells dir=$d n=$n k=$k cells=${r.getLong(0)} " +
            s"max=${r.getLong(1)} pairs=${r.getLong(2)}")
          // time the ASSIGNMENT alone (warm fine-codebook cache, so
          // this isolates the per-row coarse-argmin + fine-candidate
          // kernel whose cost is Θ(√k·d) per row — the term that
          // makes n·√k super-linear when k scales with n)
          for (pass <- 1 to 2) {
            val t0 = System.nanoTime()
            Ivf.assign(e, "embedding", cb).filter(col("cell").isNotNull)
              .count()
            println(s"PROBE assign dir=$d pass=$pass " +
              f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
          }
        } finally cb.release()
      } else println(s"PROBE cells dir=$d n=$n k=$k (flat branch, skipped)")
    }
    spark.stop()
  }
}
