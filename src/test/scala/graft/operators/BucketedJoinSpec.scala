package graft.operators

import java.nio.file.Files
import graft.SparkSpec

/** Co-located joins via bucketing (SURVEY.md §4 / the brief's "bucketing
  * for co-located joins"): two tables bucketed + sorted on the join key
  * join with NO shuffle exchange — the layout decision that removes the
  * dominant cost of repeated large-fact joins at 100 TB.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("warehouse").toString
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "bv")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/ta").saveAsTable("ta")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/tb").saveAsTable("tb")
    try {
      val joined = spark.table("ta").join(spark.table("tb"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ta")
      spark.sql("DROP TABLE IF EXISTS tb")
      // DROP TABLE keeps external-path files: remove the temp warehouse
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(wh)).iterator().asScala.toSeq
        .reverse.foreach(Files.deleteIfExists(_))
    }
  }
}
