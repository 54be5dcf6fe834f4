package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two float-array columns: per-element double
  * products summed left-to-right — the exact fold order of the portable
  * `zip_with`+`aggregate` composition and of the DuckDB oracle
  * (`Similarity.cosineSql`), so results stay bit-identical while the loop
  * runs inside codegen instead of interpreted HOF eval.
  */
object VectorExpr {
  /** True iff no element is null — the null-element gate both
    * [[FloatArrayDot]] and [[HyperplaneBucket]] apply (round-13 review):
    * ArrayData.getFloat reads a null element as 0.0f with no error, so
    * an unchecked loop gave a corrupt embedding with one null component
    * a plausible finite score on Spark while the zip_with twin and the
    * DuckDB list arithmetic both return NULL — the exact
    * damaged-row-ranks-into-top-k failure this expression exists to
    * prevent.
    */
  def noNulls(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return false
      i += 1
    }
    true
  }

  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** Unequal-length inputs yield NULL, not a truncated sum (round-12
  * review): both declared twins — the `zip_with`+`aggregate` column
  * composition (zip_with null-pads the tail, nulling the sum) and the
  * DuckDB `list_zip` oracle — produce NULL for a corrupt/truncated
  * embedding, while a min-length dot returned a plausible finite score
  * that could rank the damaged row into top-k. The mirror is the
  * contract; equal-length rows are untouched.
  */
case class FloatArrayDot(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements() ||
        !VectorExpr.noNulls(x) || !VectorExpr.noNulls(y)) null
    else VectorExpr.dotFloat(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements() ||
         |    !graft.plans.VectorExpr.noNulls($a) ||
         |    !graft.plans.VectorExpr.noNulls($b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.VectorExpr.dotFloat($a, $b);
         |}
       """.stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatArrayDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "float_array_dot"
}

/** Native hyperplane-LSH bucket id over a float-array column: `planes`
  * signed projections against deterministic pseudo-random hyperplanes
  * (coefficients are a pure function of (plane, dim) — no shared state),
  * sign bits packed into a long. Replaces a planes×dims `element_at`
  * expression tree (256 nodes at 4×64) with one codegen loop; the double
  * arithmetic accumulates in dimension order, exactly like the column
  * composition it supersedes, so bucket assignments are unchanged.
  */
object HyperplaneExpr {
  /** Coefficient stride: each plane owns a disjoint 64-wide slice of the
    * (plane, dim) keyspace. Dims past the stride would OVERLAP the next
    * plane's slice (coef(p, d) == coef(p+1, d−64)), correlating the
    * hyperplanes and silently degrading LSH bucket independence —
    * [[HyperplaneBucket]] rejects dims > stride loudly (round-12 review).
    */
  val CoefStride = 64

  @inline def coef(p: Int, d: Int): Double =
    (((p.toLong * CoefStride + d) * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5

  def bucket(vec: ArrayData, planes: Int, dims: Int): Long = {
    var out = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var d = 0
      val n = math.min(dims, vec.numElements())
      while (d < n) {
        proj += vec.getFloat(d).toDouble * coef(p, d)
        d += 1
      }
      // NaN sets the bit: the DuckDB twin renders `CASE WHEN proj > 0.0`
      // and SQL engines order NaN GREATEST, so Java's `NaN > 0.0 = false`
      // here silently broke the bit-exact twin contract for vectors with
      // a NaN component (round-14 review; latent behind callers' norm
      // gates, but the operator contract must hold without them)
      if (proj > 0.0 || java.lang.Double.isNaN(proj)) out += 1L << p
      p += 1
    }
    out
  }
}

case class HyperplaneBucket(child: Expression, planes: Int, dims: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {
  require(dims >= 1 && dims <= HyperplaneExpr.CoefStride,
    s"dims $dims exceeds the coefficient stride ${HyperplaneExpr.CoefStride}: " +
      "adjacent planes' coefficient slices would overlap and correlate")
  require(planes >= 1 && planes <= 63, s"planes $planes must fit a long's sign bits")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  // null-element gate like [[FloatArrayDot]] (round-13 review): an
  // unchecked getFloat reads a null component as 0.0 and buckets the
  // corrupt vector somewhere plausible while the oracle's list
  // arithmetic nulls the key — NULL bucket, dropped by the join
  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (!VectorExpr.noNulls(v)) null
    else HyperplaneExpr.bucket(v, planes, dims)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if (!graft.plans.VectorExpr.noNulls($c)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.HyperplaneExpr.bucket($c, $planes, $dims);
         |}
       """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_bucket"
}

/** Native nearest-centroid search over a QUANTIZED long-array column
  * (the [[graft.operators.KMeans]] hot path): exact integer squared-L2
  * against a constant centroid set, returning the 0-based index of the
  * first minimum (ties → smallest cell, exactly `array_position` of
  * `array_min` over the HOF composition it supersedes — and exactly the
  * SQL twin's `ORDER BY dist, cell` row_number pick).
  *
  * The HOF form pays ~k·dims boxed lambda invocations per row in
  * interpreted eval; this is one static call whose k×dims loop runs on
  * primitive longs inside whole-stage codegen. At 100 TB the per-row
  * assignment IS the dominant cost of a clustering pass (the only
  * shuffle is k·dims partial sums), so this constant factor is the
  * operator's scale budget.
  */
object NearestCellExpr {
  /** Canonical overflow-exact contract, single-sourced here (the
    * kernel owns it; `KMeans.QBound` aliases it): with every quantized
    * value in [−MaxAbsQ, MaxAbsQ] and at most MaxDims dimensions,
    * per-dim t² ≤ (2·2^24)² = 2^50 and the Long distance sum tops out
    * at 8191·2^50 = 2^63 − 2^50 < Long.MaxValue — exact, no wrap.
    */
  val MaxAbsQ = 1L << 24
  val MaxDims = 8191

  def nearest(vec: ArrayData, cents: Array[Array[Long]]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    val nv = vec.numElements()
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var d = 0L
      var i = 0
      // clamp to the INPUT's length like every sibling kernel (dotFloat,
      // HyperplaneExpr.bucket): UnsafeArrayData.getLong has no bounds
      // check, so a row shorter than the centroid dims read adjacent
      // heap memory into the distance (round-11 review). Missing dims
      // contribute nothing — exactly the SQL twin's dim-join semantics.
      val n = math.min(c.length, nv)
      while (i < n) {
        val t = vec.getLong(i) - c(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = j } // strict: first min wins
      j += 1
    }
    best
  }
}

/** Nearest candidate from a COLUMN of (cell, centroid) structs — the
  * two-level IVF assignment kernel ([[graft.operators.Ivf]], round-15):
  * where [[NearestCell]] carries its centroids as plan constants (O(k·d)
  * serialized into every task), this reads them from a joined codebook
  * column, so the plan stays O(√k·d) — the coarse literals — and the
  * fine codebook rides the join as ordinary data. Same integer-exact
  * distance and (distance, cell) lexicographic tie-break as
  * [[NearestCellExpr.nearest]] / the SQL twin's `ORDER BY dist, cell`.
  *
  * Returns −1 for "no result" (encoded for codegen; the expression maps
  * it to NULL): empty candidate list, or ANY structural corruption — a
  * null struct/cell/vector, a null element, a candidate whose length
  * differs from the input's, a value outside the quantization clamp, or
  * more than [[NearestCellExpr.MaxDims]] dims (the overflow-exactness
  * contract [[NearestCell]] enforces at construction must be checked
  * per row here, because the candidates are data). Corrupt-to-NULL is
  * the [[FloatArrayDot]] convention: both engines' twins null the same
  * rows instead of one side inventing a plausible cell.
  */
object NearestCandidateExpr {
  def nearest(vec: ArrayData, cands: ArrayData): Long = {
    val nv = vec.numElements()
    if (nv > NearestCellExpr.MaxDims) return -1L
    var i = 0
    while (i < nv) {
      if (vec.isNullAt(i) ||
          math.abs(vec.getLong(i)) > NearestCellExpr.MaxAbsQ) return -1L
      i += 1
    }
    val m = cands.numElements()
    var bestCell = -1L
    var bestD = Long.MaxValue
    var j = 0
    while (j < m) {
      if (cands.isNullAt(j)) return -1L
      val s = cands.getStruct(j, 2)
      if (s.isNullAt(0) || s.isNullAt(1)) return -1L
      val cell = s.getInt(0)
      if (cell < 0) return -1L // −1 is the null encoding; negative ids
      val c = s.getArray(1)    // have no meaning in a codebook
      if (c.numElements() != nv) return -1L
      var d = 0L
      i = 0
      while (i < nv) {
        if (c.isNullAt(i) ||
            math.abs(c.getLong(i)) > NearestCellExpr.MaxAbsQ) return -1L
        val t = vec.getLong(i) - c.getLong(i)
        d += t * t
        i += 1
      }
      if (d < bestD || (d == bestD && cell < bestCell)) {
        bestD = d; bestCell = cell
      }
      j += 1
    }
    bestCell
  }
}

case class NearestCandidate(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  // loud analysis-time type check (the round-14 NearestCentroid ADVICE
  // applied from birth): getLong/getInt/getStruct silently misread any
  // other physical layout
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types._
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _),
            ArrayType(StructType(Array(f0, f1)), _))
          if f0.dataType == IntegerType &&
            f1.dataType.isInstanceOf[ArrayType] &&
            f1.dataType.asInstanceOf[ArrayType].elementType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<struct<int, array<bigint>>>), " +
            s"got (${l.catalogString}, ${r.catalogString})")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = NearestCandidateExpr.nearest(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r < 0) null else r.toInt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("nearestCand")
    nullSafeCodeGen(ctx, ev, (v, cs) =>
      s"""
         |long $r = graft.plans.NearestCandidateExpr.nearest($v, $cs);
         |if ($r < 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (int) $r;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCandidate =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "nearest_candidate"
}

/** Centroid params are Seq, not Array (round-12 review): an Array case
  * field compares by reference, so two structurally-identical nodes
  * (the same cellAssign column in a projection AND a filter) would
  * defeat semanticEquals/canonicalization — no subexpression
  * elimination, the full k×dims scan once per occurrence per row (the
  * MinHashesExpr pattern). The requires enforce BOTH halves of
  * [[NearestCellExpr.MaxAbsQ]]/[[NearestCellExpr.MaxDims]]'s
  * overflow-exact contract loudly: dims ≤ 8191 AND every centroid
  * value inside the quantization clamp — an out-of-contract seed
  * (round-12 review, third pass) would otherwise wrap t·t silently
  * and capture every row into the bad cell.
  */
case class NearestCell(child: Expression, centroids: Seq[Seq[Long]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {
  require(centroids.forall(_.length <= NearestCellExpr.MaxDims),
    s"centroid dims ${centroids.map(_.length).max} exceed " +
      s"${NearestCellExpr.MaxDims} — the integer-exact distance sum " +
      "could overflow Long")
  require(centroids.forall(_.forall(v => math.abs(v) <= NearestCellExpr.MaxAbsQ)),
    "centroid values outside the quantization clamp " +
      s"±${NearestCellExpr.MaxAbsQ} — the integer-exact distance sum " +
      "could overflow Long")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  @transient private lazy val centArr = centroids.map(_.toArray).toArray
  override protected def nullSafeEval(input: Any): Any =
    NearestCellExpr.nearest(input.asInstanceOf[ArrayData], centArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centArr, "long[][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.NearestCellExpr.nearest($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
  override def prettyName: String = "nearest_cell"
}
