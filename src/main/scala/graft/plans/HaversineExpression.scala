package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst haversine (SURVEY.md §4 "custom Catalyst work actually
  * needed" item 1): great-circle km between two lat/lon pairs, with
  * `doGenCode` so it participates in whole-stage codegen — usable inside
  * join conditions (J7 distance join) without an UDF eval boundary.
  *
  * The column-math composition in [[graft.functions.Geo.haversineKm]] is
  * semantically identical; this Expression form exists for the hot path:
  * one virtual call per row instead of a ~20-node expression tree, and a
  * smaller generated-code footprint inside join loops.
  */
case class HaversineKm(
    lat1: Expression, lon1: Expression, lat2: Expression, lon2: Expression)
  extends QuaternaryExpression with Serializable {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    lat1.nullable || lon1.nullable || lat2.nullable || lon2.nullable

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    HaversineKm.compute(
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.plans.HaversineKm.compute($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HaversineKm =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)

  override def prettyName: String = "haversine_km"
}

object HaversineKm {
  val EarthRadiusKm = 6371.0088

  /** Shared by interpreted eval and generated code. */
  def compute(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1) / 2.0
    val dLon = math.toRadians(lon2 - lon1) / 2.0
    val s1 = math.sin(dLat)
    val s2 = math.sin(dLon)
    val a = s1 * s1 +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * s2 * s2
    2.0 * EarthRadiusKm * math.asin(math.min(1.0, math.sqrt(a)))
  }
}
