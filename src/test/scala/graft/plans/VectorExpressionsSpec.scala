package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** Native vector-expression contracts (round-12 review findings). */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    GraftBridge.column(FloatArrayDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  test("FloatArrayDot yields NULL on unequal lengths, like its zip_with and DuckDB twins") {
    // a truncated embedding must not produce a plausible min-length
    // score that could rank the damaged row into top-k
    val df = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (Array(1.0f, 2.0f, 9.0f), Array(3.0f, 4.0f))
    ).toDF("a", "b")
    val got = df.select(dot($"a", $"b").as("d")).as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(11.0), None))
    // the portable composition this expression replaces agrees
    val twin = df.select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v).as("d")).as[Option[Double]].collect().toSeq
    assert(twin == Seq(Some(11.0), None))
  }

  test("NearestCell and ChainReplace have structural equality (Seq params, not Array)") {
    // Array case fields compare by reference, defeating semanticEquals
    // and subexpression elimination for identical nodes
    val c = GraftBridge.expression(col("xq"))
    assert(NearestCell(c, Seq(Seq(1L, 2L), Seq(3L, 4L))) ==
      NearestCell(c, Seq(Seq(1L, 2L), Seq(3L, 4L))))
    val w = GraftBridge.expression(col("w"))
    assert(ChainReplace(w, Seq("a"), Seq("b")) == ChainReplace(w, Seq("a"), Seq("b")))
  }

  test("NearestCell rejects centroid dims and values past the overflow-exact bound") {
    val c = GraftBridge.expression(col("xq"))
    intercept[IllegalArgumentException](
      NearestCell(c, Seq(Seq.fill(8192)(0L))))
    // the values half of the contract: an unquantized seed would wrap
    // t*t silently (round-12 review, third pass)
    intercept[IllegalArgumentException](
      NearestCell(c, Seq(Seq(1L << 40, 0L))))
    NearestCell(c, Seq(Seq.fill(8191)(NearestCellExpr.MaxAbsQ))) // at the bound: fine
  }

  test("quantize clamp keeps the integer-exact distance inside Long") {
    // round-12 review: the old 2^52 clamp admitted values whose squared
    // distance wrapped Long negative, silently capturing every row into
    // the overflowing cell; the 2^24 bound makes t*t*dims provably exact
    import graft.operators.KMeans
    val q = Seq(Tuple1(Array(Some(1e9f), Some(Float.NaN), Some(-1e9f),
        Some(0.25f), None)))
      .toDF("v").select(KMeans.quantize($"v").as("q"))
      .as[Seq[Long]].head()
    assert(q(0) == KMeans.QBound && q(1) == KMeans.QBound && q(2) == -KMeans.QBound)
    assert(q(3) == (0.25 * KMeans.Scale).toLong)
    // a NULL element is missing-means-0.0, not the clamp corner
    // (null-skipping greatest/least pinned it to -QBound before)
    assert(q(4) == 0L)
    // worst-case squared distance at the clamp cannot overflow
    val t = 2L * KMeans.QBound
    assert(t * t > 0 && Long.MaxValue / (t * t) >= 8191,
      "per-dim t^2 x 8191 dims must stay inside Long")
  }
}
