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
  * {{{ sbt "runMain graft.tools.Probe112 /tmp/graft_sf1 [hexBound] [tiers]" }}}
  *
  * `hexBound` shrinks the sample (default "2000" = 1/8, q112's; the
  * sf100 measurement uses "0400" = 1/64 — the 1/8 brute term is
  * ~31G pairs there, the same infeasibility that moved q108 to a
  * sample in the first place). `tiers` ⊆ flat,two,three (default all;
  * sf100 drops `flat` — its O(pool·k·d) driver seeding at k = 8000 is
  * exactly the term the hierarchical tiers exist to remove).
  */
object Probe112 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1"))
    val hexBound = if (args.length > 1) args(1) else "2000"
    val tiers = (if (args.length > 2) args(2) else "flat,two,three")
      .split(",").map(_.trim).toSet
    val unknownTiers = tiers -- Set("flat", "two", "three")
    require(unknownTiers.isEmpty,
      s"unknown Probe112 tier(s): ${unknownTiers.mkString(", ")}")
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
    println(s"""{"probe":"start","sf_dir":"$sfDir","rows":$n,"k":$k,""" +
      s""""hex_bound":"$hexBound","tiers":"${tiers.toSeq.sorted.mkString(",")}"}""")

    val samp = e.filter(
        Corpus.bucket16($"vec_id", "semdedup-deep-r19") < hexBound)
      .select($"vec_id", $"embedding").persist()
    val ns = samp.count()

    // tier assignments over the sample (pure per-row functions); a
    // skipped tier carries NULL cells, so its co-location count reads
    // 0 — the start line's "tiers" field says which columns are live
    val cells0 =
      if (tiers("flat")) {
        val flatCents = Similarity.trainKmeansCentroids(
          e, "embedding", k, idCol = Some("vec_id"))
        samp.withColumn("flat", Similarity.cellAssign($"embedding", flatCents))
      } else samp.withColumn("flat", lit(null).cast("int"))
    val cb2 = if (tiers("two"))
      Some(Ivf.train(e, "embedding", "vec_id", k,
        itersCoarse = 3, itersFine = 2)) else None
    val cb3 = if (tiers("three"))
      Some(Ivf.train3(e, "embedding", "vec_id", k,
        itersCoarse = 3, itersLevel = 2)) else None
    val cells2 = cb2.fold(cells0.withColumn("two", lit(null).cast("int")))(
      b => Ivf.assign(cells0, "embedding", b, "two"))
    val cells3 = cb3.fold(cells2.withColumn("three", lit(null).cast("int")))(
        b => Ivf.assign3(cells2, "embedding", b, "three"))
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
    cb2.foreach(_.release()); cb3.foreach(_.release())
    spark.stop()
  }
}
