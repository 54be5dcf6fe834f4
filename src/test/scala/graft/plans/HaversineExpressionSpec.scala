package graft.plans

import org.apache.spark.sql.SparkSession
import graft.SparkSpec
import graft.functions.Geo

/** Native codegen haversine: SQL registration via SparkSessionExtensions,
  * agreement with the column-math form, null propagation.
  */
class HaversineExpressionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val extSpark: SparkSession = {
    GraftExtensions.install(spark)
    spark
  }

  test("expression matches the column-math composition bit-for-bit") {
    val df = Seq(
      (57.7089, 11.9746, 59.3293, 18.0686),
      (0.0, 0.0, 0.0, 180.0),
      (-90.0, 0.0, 90.0, 0.0),
      (10.1, 20.2, 10.1, 20.2)
    ).toDF("a", "b", "c", "d")
    val both = df.select(
      GraftExtensions.haversineKm($"a", $"b", $"c", $"d").as("expr_km"),
      Geo.haversineKm($"a", $"b", $"c", $"d").as("col_km"))
      .as[(Double, Double)].collect()
    both.foreach { case (e, c) => assert(math.abs(e - c) < 1e-9, s"$e vs $c") }
  }

  test("registered as a SQL function through GraftExtensions") {
    val km = extSpark.sql(
      "SELECT haversine_km(57.7089, 11.9746, 59.3293, 18.0686) AS km")
      .collect().head.getDouble(0)
    assert(math.abs(km - 397.0) < 5.0)
  }

  test("null inputs propagate to null") {
    val df = Seq((Some(1.0), Option.empty[Double])).toDF("a", "b")
    val r = df.select(GraftExtensions.haversineKm($"a", $"b", $"a", $"a"))
      .collect().head
    assert(r.isNullAt(0))
  }
}
