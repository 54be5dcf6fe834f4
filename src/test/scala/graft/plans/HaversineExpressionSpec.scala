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

  test("hash/sketch family registered in SQL matches the Column API") {
    import graft.functions.Hashing
    extSpark.range(1).createOrReplaceTempView("one")
    val sql = extSpark.sql(
      """SELECT
        |  graft_fingerprint('hello world') AS fp,
        |  graft_tok_hash('hello') AS th,
        |  graft_simhash64(graft_tok_hashes(
        |    graft_shingles(array('a','b','c','d','e','f'), 5))) AS sh,
        |  float_array_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS dot
        |FROM one""".stripMargin).collect().head
    val viaCols = extSpark.sql("SELECT 'hello world' AS t, 'hello' AS tok, 'a b c d e f' AS words")
      .select(
        Hashing.fingerprint($"t"),
        Hashing.tokHash($"tok"),
        Hashing.simhash64(Hashing.tokHashes(Hashing.shingles(Hashing.words($"words"), 5))))
      .collect().head
    assert(sql.getLong(0) == viaCols.getLong(0))
    assert(sql.getLong(1) == viaCols.getLong(1))
    assert(sql.getLong(2) == viaCols.getLong(2))
    assert(math.abs(sql.getDouble(3) - 11.0) < 1e-12)
  }

  test("corpus family (ngrams / repetition stats / deflate ratio) registered in SQL") {
    import graft.functions.{Corpus, TextAnalysis}
    val row = extSpark.sql(
      """SELECT
        |  graft_ngrams(array('a','b','a','b','a'), 2) AS g,
        |  graft_repetition_stats(array('a','b','a','b','a')) AS st,
        |  deflate_ratio('abc abc abc abc abc abc abc abc', 6) AS r
        |""".stripMargin).collect().head
    assert(row.getSeq[String](0) == Seq("a b", "b a", "a b", "b a"))
    assert(row.getSeq[Long](1) == Seq(2L, 4L, 2L, 3L))
    val viaCol = extSpark.sql("SELECT 'abc abc abc abc abc abc abc abc' AS t")
      .select(TextAnalysis.compressionRatio($"t"))
      .collect().head.getDouble(0)
    assert(row.getDouble(2) == viaCol)
  }
}
