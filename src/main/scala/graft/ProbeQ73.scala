package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 q73 fourth-decade decomposition probe (temporary): times the
  * delivery pipeline's stages separately at a given SF dir so the 17.9x
  * solo reading can be attributed to a stage instead of modeled.
  */
object ProbeQ73 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE73 $label sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    for (d <- args) {
      println(s"PROBE73 dir=$d")
      val li = Tables.lineitem(spark, d)
      val or = Tables.orders(spark, d)
      val roi = li.select(
        concat(lit("S"), $"l_orderkey").as("sample"),
        $"l_returnflag".as("class_name"),
        ($"l_extendedprice" / 10.0).as("vol_um3"),
        ($"l_returnflag" === "A").as("is_diatom"))
      val dim = or.select(
        concat(lit("S"), $"o_orderkey").as("sample"),
        ($"o_totalprice" / 10000.0).as("ml_analyzed"),
        lit(57.5).as("lat"), lit(11.8).as("lon"))
      val flags = or.filter($"o_orderkey" % 97 === 0).select(
        concat(lit("S"), $"o_orderkey").as("sample"),
        when($"o_orderkey" % 2 === 0, "bubbles").otherwise("beads").as("flag"))
      import graft.GraftQuery.{dsum, D4}
      t("rolled_agg") {
        roi.withColumn("carbon_pg",
            round(graft.agg.Biovolume.carbonPg($"is_diatom", $"vol_um3"), 4))
          .groupBy($"sample", $"class_name")
          .agg(count(lit(1)).as("counts"),
            dsum($"vol_um3", D4).as("biovolume_um3"),
            dsum($"carbon_pg", D4).as("carbon_pg"))
          .write.mode("overwrite").format("noop").save()
      }
      t("sample_universe_distinct") {
        roi.select($"sample").distinct()
          .write.mode("overwrite").format("noop").save()
      }
      val full = graft.jobs.SharkExport.delivery(roi, dim, flags,
        removeFlagged = Seq("beads"),
        adjacencyPartition = substring($"sample", 1, 3))
      t("delivery_nosort") {
        full.write.mode("overwrite").format("noop").save()
      }
      t("delivery_sorted") {
        full.drop("MYEAR").orderBy($"SMPNO", $"LATNM")
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
