package graft.plans

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so
  * `spark.sql("SELECT haversine_km(a,b,c,d)")` and the Column API both hit
  * the codegen Expression. Install with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("haversine_km"),
      new ExpressionInfo(classOf[HaversineKm].getName, "haversine_km"),
      (children: Seq[Expression]) => {
        require(children.length == 4, "haversine_km(lat1, lon1, lat2, lon2)")
        HaversineKm(GraftExtensions.toDouble(children(0)),
          GraftExtensions.toDouble(children(1)),
          GraftExtensions.toDouble(children(2)),
          GraftExtensions.toDouble(children(3)))
      }))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.GraftBridge

  /** Registers the functions into an already-built session (the
    * `withExtensions` path only applies at session construction).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("haversine_km"),
      new ExpressionInfo(classOf[HaversineKm].getName, "haversine_km"),
      (children: Seq[Expression]) => {
        require(children.length == 4, "haversine_km(lat1, lon1, lat2, lon2)")
        HaversineKm(toDouble(children(0)), toDouble(children(1)),
          toDouble(children(2)), toDouble(children(3)))
      })
  }

  private[plans] def toDouble(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.DoubleType)

  /** Column-API handle to the native expression. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    GraftBridge.column(HaversineKm(
      GraftBridge.expression(lat1.cast("double")),
      GraftBridge.expression(lon1.cast("double")),
      GraftBridge.expression(lat2.cast("double")),
      GraftBridge.expression(lon2.cast("double"))))
}
