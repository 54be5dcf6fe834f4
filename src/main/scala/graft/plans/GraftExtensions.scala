package graft.plans

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so
  * `spark.sql("SELECT haversine_km(a,b,c,d)")` and the Column API both hit
  * the codegen Expression. Install with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`; [[GraftExtensions.install]]
  * registers into an already-built session.
  *
  * Hash functions are bound to the graft constants
  * ([[graft.functions.Hashing]]) so SQL results match the Column API and
  * the DuckDB oracles exactly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registry.foreach { case (name, info, builder) =>
      ext.injectFunction((new FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  import org.apache.spark.sql.GraftBridge
  import graft.functions.Hashing

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) for every SQL-exposed native expression. */
  private[plans] val registry: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("haversine_km",
      new ExpressionInfo(classOf[HaversineKm].getName, "haversine_km"),
      (children: Seq[Expression]) => {
        require(children.length == 4, "haversine_km(lat1, lon1, lat2, lon2)")
        HaversineKm(toDouble(children(0)), toDouble(children(1)),
          toDouble(children(2)), toDouble(children(3)))
      }),
    ("graft_fingerprint",
      new ExpressionInfo(classOf[StringPolyHash].getName, "graft_fingerprint"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_fingerprint(text)")
        StringPolyHash(toString_(children(0)),
          Hashing.FpMult, Hashing.FpMod, Hashing.FpSeed)
      }),
    ("graft_tok_hash",
      new ExpressionInfo(classOf[StringPolyHash].getName, "graft_tok_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_tok_hash(token)")
        StringPolyHash(toString_(children(0)),
          Hashing.TokMult, Hashing.TokP, Hashing.TokSeed)
      }),
    ("graft_tok_hashes",
      new ExpressionInfo(classOf[StringPolyHashArray].getName, "graft_tok_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_tok_hashes(tokens)")
        StringPolyHashArray(toStringArray(children(0)),
          Hashing.TokMult, Hashing.TokP, Hashing.TokSeed)
      }),
    ("graft_shingles",
      new ExpressionInfo(classOf[WordShinglesExpr].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_shingles(words, k)")
        WordShinglesExpr(toStringArray(children(0)), litInt(children(1), "k"))
      }),
    ("graft_minhashes",
      new ExpressionInfo(classOf[MinHashesExpr].getName, "graft_minhashes"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_minhashes(token_hashes)")
        MinHashesExpr(toLongArray(children(0)),
          Hashing.MinHashSeeds.map(_._1), Hashing.MinHashSeeds.map(_._2), Hashing.MinP)
      }),
    ("graft_simhash64",
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_simhash64(token_hashes)")
        SimHash64Expr(toLongArray(children(0)), Hashing.Mix, Hashing.Mix2)
      }),
    ("float_array_dot",
      new ExpressionInfo(classOf[FloatArrayDot].getName, "float_array_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "float_array_dot(a, b)")
        FloatArrayDot(toFloatArray(children(0)), toFloatArray(children(1)))
      }),
    ("graft_ngrams",
      new ExpressionInfo(classOf[WordNgramsExpr].getName, "graft_ngrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_ngrams(words, k)")
        WordNgramsExpr(toStringArray(children(0)), litInt(children(1), "k"))
      }),
    ("graft_repetition_stats",
      new ExpressionInfo(classOf[RepetitionStatsExpr].getName, "graft_repetition_stats"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_repetition_stats(words)")
        RepetitionStatsExpr(toStringArray(children(0)))
      }),
    ("deflate_ratio",
      new ExpressionInfo(classOf[DeflateRatioExpr].getName, "deflate_ratio"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "deflate_ratio(text, level)")
        DeflateRatioExpr(toString_(children(0)), litInt(children(1), "level"))
      }))

  /** Registers the functions into an already-built session (the
    * `withExtensions` path only applies at session construction).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    registry.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        new FunctionIdentifier(name), info, builder)
    }

  private[plans] def toDouble(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.DoubleType)

  // input-type coercion for the SQL surface (round-11 review): the
  // native expressions declare no ExpectsInputTypes, so without these
  // casts a wrong-typed SQL argument passed analysis and crashed
  // executors mid-stage with ClassCastException; an explicit Cast
  // either coerces (bigint -> string) or fails at PLAN time
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types._
  private def toString_(e: Expression): Expression = Cast(e, StringType)
  private def toStringArray(e: Expression): Expression =
    Cast(e, ArrayType(StringType))
  private def toLongArray(e: Expression): Expression =
    Cast(e, ArrayType(LongType))
  private def toFloatArray(e: Expression): Expression =
    Cast(e, ArrayType(FloatType))

  /** Column-API handle to the native expression. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    GraftBridge.column(HaversineKm(
      GraftBridge.expression(lat1.cast("double")),
      GraftBridge.expression(lon1.cast("double")),
      GraftBridge.expression(lat2.cast("double")),
      GraftBridge.expression(lon2.cast("double"))))
}
