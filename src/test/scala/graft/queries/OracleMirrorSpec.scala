package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the Spark-side cast/parse semantics the DuckDB oracle mirrors
  * rely on (round-12 review). These are the behaviors the q34/q28
  * oracle SQL encodes; if a Spark upgrade shifts any of them the
  * corresponding oracle must move too, so they are contracts, not
  * incidental behavior.
  */
class OracleMirrorSpec extends SparkSpec {
  import spark.implicits._

  test("session runs with ANSI mode on (the Spark 4 default, no override)") {
    // q28's try_cast-on-both-sides mirror exists BECAUSE of this: under
    // ANSI a plain cast('' as int) throws instead of producing null
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val thrown = intercept[Exception] {
      Seq("").toDF("m").select($"m".cast("int")).collect()
    }
    assert(thrown.getMessage.contains("CAST_INVALID_INPUT"))
  }

  test("DOUBLE division by zero THROWS under ANSI — every zero-able divisor needs a guard") {
    // pinned empirically (round-13): Spark 4 ANSI raises DIVIDE_BY_ZERO
    // for DOUBLE division too (not just integral/decimal), while DuckDB
    // keeps IEEE Inf/NaN — so an unguarded zero-able divisor is a CRASH
    // on Spark and an answer on DuckDB (the q51 single-row-group sd).
    // Every division in a query path must gate its divisor (when/CASE,
    // GREATEST, or NULLIF) identically on both engines.
    val thrown = intercept[Exception] {
      Seq((1.0, 0.0)).toDF("a", "b").select(($"a" / $"b").as("div")).collect()
    }
    assert(thrown.getMessage.contains("DIVIDE_BY_ZERO"), thrown.getMessage)
  }

  test("from_json(LongType) nulls non-integer and quoted k — the q34 mirror contract") {
    // DuckDB's ->> would stringify 1.5 / "123" and TRY_CAST would yield
    // 2 / 123; the oracle's json_type IN (BIGINT, UBIGINT) gate exists
    // to reproduce exactly this column
    val schema = StructType(Seq(StructField("k", LongType)))
    val got = Seq(
      """{"k": 2}""", """{"k": -7}""", """{"k": 1.5}""", """{"k": "123"}""",
      """{}""", "not json")
      .toDF("props")
      .select(from_json($"props", schema).getField("k").as("k"))
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(2L), Some(-7L), None, None, None, None))
  }

  test("try_cast nulls empty, non-numeric, and out-of-range strings — the q28 mirror contract") {
    val got = Seq("", "12", "x", "9999999999999")
      .toDF("m")
      .select(expr("try_cast(m AS INT)").as("v"))
      .as[Option[Int]].collect().toSeq
    assert(got == Seq(None, Some(12), None, None))
  }
}
