package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** SURVEY §4 bucketing evidence: tables pre-bucketed on the join key
  * join WITHOUT any Exchange — the co-located-join tool for repeated
  * big-big joins at 100 TB (pay the shuffle once at write time, never
  * again at read time). Complements the other two §4 join tools that
  * already have pinned evidence: broadcast (PlanShapeSpec q04) and
  * salting (q76/q77).
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero exchanges; unbucketed pay two") {
    // explicit per-table paths: warehouse.dir is a static conf, and the
    // data should land in a temp dir, not the repo
    val wh = Files.createTempDirectory("bucket_wh")
    val d = testDataDir("sf0.001")
    val li = Tables.lineitem(spark, d)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    val or = Tables.orders(spark, d)
      .select($"o_orderkey", $"o_totalprice")

    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
    or.withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/or_b").mode("overwrite").saveAsTable("or_b")

    // force the shuffle-join path: broadcast would mask the bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // decimal sum: the two plans partition differently, and a plain
      // double sum's addition order differs in the last ULP (the dsum
      // discipline — GraftQuery.scala)
      import GraftQuery.{dsum, D2}
      val joined = spark.table("li_b").join(spark.table("or_b"), "l_orderkey")
        .groupBy($"l_orderkey").agg(dsum($"l_quantity", D2).as("q"))
      val p = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // join AND the following same-key aggregation ride the bucket
      // partitioning: no Exchange anywhere in the plan
      assert(!p.contains("Exchange"),
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
      assert(p.contains("SortMergeJoin"))
      assert(p.contains("Bucketed: true"), "scan must report bucketed read")

      // identical unbucketed join: both sides shuffle
      val flat = li.join(
        or.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
      val pf = flat.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // formatted mode splits node name and arguments across lines —
      // count the argument lines (the PlanShapeSpec.shuffles rationale)
      assert("Arguments: hashpartitioning".r.findAllMatchIn(pf).size >= 2)

      // and the result matches the plain join
      val a = joined.orderBy($"l_orderkey").collect()
      val b = flat.groupBy($"l_orderkey").agg(dsum($"l_quantity", D2).as("q"))
        .orderBy($"l_orderkey").collect()
      assert(a.sameElements(b))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS or_b")
      // DROP TABLE on an external (path-backed) table keeps the files —
      // remove the temp warehouse itself
      import scala.jdk.CollectionConverters._
      Files.walk(wh).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
