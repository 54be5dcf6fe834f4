package graft.tools

import java.util.Locale

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.Corpus
import graft.operators.{Dedup, Ivf, Similarity}

/** q112 calibration probe (round-19): over the deterministic 1/8
  * embedding sample, counts true pairs at several cosine thresholds and
  * how many of them each codebook TIER co-locates (flat corpus-scaled
  * cells, two-level, three-level) — the measurement behind
  * `DeepRecallBound` and the q112 scaladoc's per-SF table. One JSON
  * line per (tau, tier). Run exclusively like every measurement main:
  *
  * {{{ sbt "runMain graft.tools.Probe112 /tmp/graft_sf1" }}}
  */
object Probe112 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(
        master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-probe112")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def fmt(v: Double) = String.format(Locale.ROOT, "%.4f", v: java.lang.Double)

    val e = Tables.embeddings(spark, sfDir)
    val n = e.count()
    val k = math.max(8L, (n + 249) / 250).toInt
    println(s"""{"probe":"start","sf_dir":"$sfDir","rows":$n,"k":$k}""")

    val samp = e.filter(
        Corpus.bucket16($"vec_id", "semdedup-deep-r19") < "2000")
      .select($"vec_id", $"embedding").persist()
    val ns = samp.count()

    // tier assignments over the sample (pure per-row functions)
    val flatCents = Similarity.trainKmeansCentroids(
      e, "embedding", k, idCol = Some("vec_id"))
    val cb2 = Ivf.train(e, "embedding", "vec_id", k,
      itersCoarse = 3, itersFine = 2)
    val cb3 = Ivf.train3(e, "embedding", "vec_id", k,
      itersCoarse = 3, itersLevel = 2)
    val cells = samp
      .withColumn("flat", Similarity.cellAssign($"embedding", flatCents))
    val cells2 = Ivf.assign(cells, "embedding", cb2, "two")
    val cells3 = Ivf.assign3(cells2, "embedding", cb3, "three")
      .select($"vec_id", $"flat", $"two", $"three").persist()
    cells3.count()

    for (tau <- Seq(0.4, 0.6, 0.8, 0.9, 0.95)) {
      val tp = Dedup.embeddingNearDupPairs(
          samp, "vec_id", "embedding", tau, blockCol = None)
        .select($"id_a", $"id_b").persist()
      val nPairs = tp.count()
      val joined = tp
        .join(cells3.select($"vec_id".as("id_a"), $"flat".as("fa"),
          $"two".as("ta"), $"three".as("ha")), "id_a")
        .join(cells3.select($"vec_id".as("id_b"), $"flat".as("fb"),
          $"two".as("tb"), $"three".as("hb")), "id_b")
        .select(
          count(when($"fa" === $"fb", 1)).as("flat"),
          count(when($"ta".isNotNull && $"ta" === $"tb", 1)).as("two"),
          count(when($"ha".isNotNull && $"ha" === $"hb", 1)).as("three"))
        .collect()(0)
      def r(c: Long) = if (nPairs > 0) c.toDouble / nPairs else 0.0
      println(s"""{"probe":"tau","tau":$tau,"sample_rows":$ns,""" +
        s""""n_pairs":$nPairs,"flat":${joined.getLong(0)},""" +
        s""""two":${joined.getLong(1)},"three":${joined.getLong(2)},""" +
        s""""r_flat":${fmt(r(joined.getLong(0)))},""" +
        s""""r_two":${fmt(r(joined.getLong(1)))},""" +
        s""""r_three":${fmt(r(joined.getLong(2)))}}""")
      tp.unpersist()
    }
    cb2.release(); cb3.release()
    spark.stop()
  }
}
