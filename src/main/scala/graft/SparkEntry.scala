package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-module registries; every entry with
  * a SQL-expressible oracle also appears in `oracleSql` (same key), which
  * is what the driver's DuckDB differential gate consumes.
  */
object SparkEntry {

  /** All registered queries, in module order. A lazy val, not a def
    * (round-12 review): Bench resolves `queries(name)` inside its timed
    * regions and Verify per query — rebuilding the 100-entry flatten +
    * duplicate check every access was sub-millisecond but avoidable
    * timed-region impurity. The dup require still fails at first touch.
    */
  lazy val registry: Seq[GraftQuery] = {
    val all = queries_.flatten
    // a name collision across module registries would last-wins out of
    // the `queries`/`oracleSql` maps: the shadowed query silently drops
    // from BOTH the bench and the correctness gate while everything
    // reports green (round-11 review) — fail at first touch instead
    val dup = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names across registries: ${dup.mkString(", ")}")
    all
  }

  private def queries_ : Seq[Seq[GraftQuery]] = Seq(
    graft.queries.CoreRelational.all,
    graft.queries.OrderedNonEqui.all,
    graft.queries.ScalarBattery.all,
    graft.queries.Domain.all,
    graft.queries.TrainingData.all,
    graft.queries.FeatureExtract.all,
    graft.queries.TaxonomyQueries.all,
    graft.queries.CorpusBattery.all,
    graft.queries.SkewBench.all)

  /** Flagship query (SURVEY.md §7.5, the HAB-alert spine,
    * reference: code/ifcb_hab_alert.R:102-119,197-200): per brand ("taxon"),
    * the single highest-revenue lineitem ("max concentration sample"),
    * joined to a per-brand warning threshold dim, flagged where it exceeds.
    * Scan → broadcast dim join → window top-1 → threshold predicate → sort.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val pt = Tables.part(spark, d)
    // warning-level dim (taxa_lookup.csv analog): per brand, a threshold.
    val warn = pt.groupBy($"p_brand")
      .agg((avg($"p_retailprice") * lit(20.0)).as("warning_level"))
    val w = Window.partitionBy($"p_brand")
      .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc)
    li.join(broadcast(pt.select($"p_partkey", $"p_brand")), $"l_partkey" === $"p_partkey")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .join(broadcast(warn), Seq("p_brand"))
      .withColumn("alert", $"l_extendedprice" > $"warning_level")
      .select($"p_brand", $"l_orderkey", $"l_extendedprice", $"warning_level", $"alert")
      .orderBy($"p_brand")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  lazy val oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin.trim)).toMap

  /** [[oracleSql]] plus the per-directory rendered dynamic oracles
    * (data-dependent literals such as trained IVF centroids) — the map
    * Verify dumps for the driver's DuckDB gate. `nameFilter` prunes the
    * registry BEFORE rendering (round-12 review): the dynamic renderers
    * run full Spark training jobs, so a targeted Verify must not pay
    * for — or die on — oracles it will immediately filter out.
    */
  def oracleSqlRendered(spark: SparkSession, dir: String,
      nameFilter: String => Boolean = _ => true): Map[String, String] =
    oracleSql.filter { case (n, _) => nameFilter(n) } ++
      registry.filter(q => nameFilter(q.name)).flatMap { q =>
        q.oracleDyn.map { f =>
          // a failing renderer must stay IN the gate as a loud failure
          // (round-14 review): silently omitting the key made the query
          // indistinguishable from "no oracle by design" — the driver
          // skipped the compare and the round reported green with the
          // query unverified. The sentinel SQL always hash-mismatches,
          // so the failure surfaces as a red CORRECTNESS row naming the
          // query.
          q.name -> (try f(spark, dir).stripMargin.trim
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(
                s"[oracle] ${q.name} render failed: ${e.getMessage}")
              "SELECT 'ORACLE RENDER FAILED: " +
                String.valueOf(e.getMessage).replace("'", "''") +
                "' AS oracle_render_failed"
          })
        }
      }.toMap
}
