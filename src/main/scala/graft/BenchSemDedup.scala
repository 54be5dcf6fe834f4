package graft

import java.util.Locale

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** End-to-end semDedup switch measurement (round-16 verdict task 3's
  * evidence): times [[graft.operators.Dedup.semDedupScaled]] under both
  * branches of its flat→hierarchical threshold at each requested k —
  * `forced-hier` (`flatMaxK = 0`) against `forced-flat`
  * (`flatMaxK = Int.MaxValue`) — to locate the crossover the default
  * threshold sits at. Train + assign + the full drop-policy ledger,
  * so the number is the operator a corpus-prep run actually pays, not
  * the trainer alone ([[BenchIvf]] isolates that).
  *
  * One JSON line per (k, variant, pass):
  * `{"variant":"forced-hier|forced-flat","k":N,"rows":N,"total_sec":…,
  *   "dropped":N}` — both branches are FORCED (the switched default
  * is one of the two by definition, so timing it adds nothing; the
  * crossover is read off where the two forced curves cross).
  *
  * Run exclusively (the Bench rule):
  * `sbt "runMain graft.BenchSemDedup /tmp/graft_sf1 scaled,320,1280 3"`
  * — the k list takes literal ints plus `scaled` for the corpus-scaled
  * n/250.
  */
object BenchSemDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1"))
    val ksArg = if (args.length > 1) args(1) else "scaled"
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double) = String.format(Locale.ROOT, "%.3f", v: java.lang.Double)
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      Thread.sleep(300)
    }

    val e = Tables.embeddings(spark, sfDir)
    val n = e.count() // also warms the JVM/session
    val scaledK = math.max(8L, (n + 249) / 250).toInt // the n/250 recipe
    val ks = ksArg.split(",").map(_.trim).map {
      case "scaled" => scaledK
      case v => v.toInt
    }
    val TAU = 0.4

    for (k <- ks;
        (label, flatMaxK) <- Seq(
          ("forced-hier", 0), ("forced-flat", Int.MaxValue));
        pass <- 1 to passes) {
      hygiene()
      val t0 = System.nanoTime()
      val ledger = Dedup.semDedupScaled(e, "vec_id", "embedding", k, TAU,
        flatMaxK = flatMaxK)
      val dropped = ledger.filter(org.apache.spark.sql.functions
        .col("dropped")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"variant":"$label","pass":$pass,"k":$k,"rows":$n,""" +
        s""""total_sec":${fmt(sec)},"dropped":$dropped}""")
    }
    spark.stop()
  }
}
