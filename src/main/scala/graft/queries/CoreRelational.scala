package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.GraftQuery._

/** Core relational operator battery (SURVEY.md §2.2 projections/filters,
  * §2.3 equi/semi/anti/outer joins, §2.4 aggregations, §2.6 sorts,
  * §2.7 set ops). Each query is the Spark-first expression of a reference
  * operator, demonstrated on the synthetic star schema; citations point at
  * the reference call site whose semantics the query generalizes.
  */
object CoreRelational {

  import Tables._

  /** A1/A3 rollup (reference: ifcb_delivery_data_to_shark.R:328-357) as a
    * TPC-H-Q1-shaped aggregate: grouped algebraic sums → one shuffle with
    * map-side partial aggregation; scan prunes to 6 columns.
    */
  private val q01 = GraftQuery(
    "q01_pricing_summary",
    (s, d) => {
      import s.implicits._
      lineitem(s, d)
        // string-literal cast parses in the SESSION timezone (pinned
        // UTC), matching the oracle's naive TIMESTAMP literal;
        // java.sql.Timestamp.valueOf parsed in the JVM DEFAULT timezone
        // and shifted the cutoff on any non-UTC host — empirically
        // reproduced: all 6 q01 rows mismatched under
        // -Duser.timezone=America/New_York (round-11 review)
        .filter($"l_shipdate" < lit("2000-01-01 00:00:00").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), D4).as("sum_disc_price"),
          (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** P1+P2 projection & predicate battery (Rmd:250-262): both the filter
    * and the 5-column projection reach the parquet scan (PushedFilters /
    * ReadSchema) — at 100 TB that is the difference between reading 5
    * columns and reading 40.
    */
  private val q02 = GraftQuery(
    "q02_project_filter",
    (s, d) => {
      import s.implicits._
      lineitem(s, d)
        .filter($"l_returnflag".isin("A", "R") && $"l_discount" > 0.05 && $"l_quantity" < 25.0)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_returnflag")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_returnflag")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
      FROM lineitem
      WHERE l_returnflag IN ('A','R') AND l_discount > 0.05 AND l_quantity < 25.0
      ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag"""))

  /** P5 distinct (Rmd:430,988). */
  private val q03 = GraftQuery(
    "q03_distinct",
    (s, d) => {
      import s.implicits._
      lineitem(s, d).select($"l_returnflag", $"l_linestatus").distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus"""))

  /** J1 star-enrichment join chain (Rmd:1094-1103): small dims are
    * explicitly broadcast so the fact table never shuffles — the shape
    * that survives a 1000-executor scale-up.
    */
  private val q04 = GraftQuery(
    "q04_star_broadcast_join",
    (s, d) => {
      import s.implicits._
      lineitem(s, d)
        .join(broadcast(part(s, d)), $"l_partkey" === $"p_partkey")
        .join(broadcast(supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .groupBy($"p_brand")
        .agg(
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), D4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"p_brand")
    },
    Some("""
      SELECT p_brand,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY p_brand
      ORDER BY p_brand"""))

  /** J2/J13 left join + coalesce fallback (Rmd:277-283; the "SMHI" owner
    * default at 01_create_file_index.R:56-62). Unmatched rows are
    * manufactured by thinning the dim.
    */
  private val q05 = GraftQuery(
    "q05_left_join_coalesce",
    (s, d) => {
      import s.implicits._
      val cust = customer(s, d).filter($"c_custkey" % 7 =!= 0)
      orders(s, d)
        .join(broadcast(cust), $"o_custkey" === $"c_custkey", "left")
        .withColumn("segment", coalesce($"c_mktsegment", lit("UNKNOWN")))
        .groupBy($"segment")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
        .orderBy($"segment")
    },
    Some("""
      SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 7 <> 0) ON o_custkey = c_custkey
      GROUP BY 1
      ORDER BY 1"""))

  /** J9 semi-join membership (ifcb-dashboard-metadata-pipeline.Rmd:717-722). */
  private val q06 = GraftQuery(
    "q06_semi_join",
    (s, d) => {
      import s.implicits._
      customer(s, d)
        .join(
          orders(s, d).filter($"o_orderpriority" === "1-URGENT"),
          $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""))

  /** J10 anti-join new/unprocessed detection (ifcb_ingest_and_qc.R:173-181). */
  private val q07 = GraftQuery(
    "q07_anti_join",
    (s, d) => {
      import s.implicits._
      part(s, d)
        .join(lineitem(s, d), $"p_partkey" === $"l_partkey", "left_anti")
        .select($"p_partkey", $"p_name")
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey, p_name FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      ORDER BY p_partkey"""))

  /** J5 full outer join (Rmd:758-759 flags ⟗ positions). */
  private val q08 = GraftQuery(
    "q08_full_outer_join",
    (s, d) => {
      import s.implicits._
      val cn = customer(s, d).groupBy($"c_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val sn = supplier(s, d).groupBy($"s_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      cn.join(sn, Seq("nationkey"), "full_outer").orderBy($"nationkey")
    },
    Some("""
      SELECT nationkey, n_cust, n_supp
      FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
      FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      USING (nationkey)
      ORDER BY nationkey"""))

  /** A4 top-1 per group (ifcb_hab_alert.R:106-119 slice_max): window
    * row_number with a total-order tiebreak so the result is unique.
    */
  private val q09 = GraftQuery(
    "q09_top1_per_group",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"p_brand")
        .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc)
      lineitem(s, d)
        .join(broadcast(part(s, d)), $"l_partkey" === $"p_partkey")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"p_brand", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"p_brand")
    },
    Some("""
      SELECT p_brand, l_orderkey, l_linenumber, l_extendedprice FROM (
        SELECT p_brand, l_orderkey, l_linenumber, l_extendedprice,
          ROW_NUMBER() OVER (PARTITION BY p_brand
            ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
        FROM lineitem JOIN part ON l_partkey = p_partkey) t
      WHERE rn = 1
      ORDER BY p_brand"""))

  /** A5/W3 latest record per key (ifcb_delivery_data_to_shark.R:268-277):
    * ordered dedup to the most recent event per user. Timestamps are
    * emitted as epoch microseconds (BIGINT) for engine-neutral compare.
    */
  private val q10 = GraftQuery(
    "q10_last_per_group",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("ts_us"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1
      ORDER BY user_id"""))

  /** A6 global sorted top-k (ifcb_delivery_data_to_shark.R:149-153):
    * Spark plans this as TakeOrderedAndProject — no global sort at scale.
    */
  private val q11 = GraftQuery(
    "q11_global_topk",
    (s, d) => {
      import s.implicits._
      orders(s, d)
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(50)
        .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
    },
    Some("""
      SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 50"""))

  /** A7 per-key total + threshold banding (ifcb_hab_alert.R:121-136 bloom
    * categories): exact decimal revenue, then a when-chain band.
    */
  private val q12 = GraftQuery(
    "q12_threshold_banding",
    (s, d) => {
      import s.implicits._
      lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), D4).as("revenue"))
        .withColumn("band",
          when($"revenue" > 300000.0, "bloom")
            .when($"revenue" >= 150000.0, "high")
            .when($"revenue" >= 50000.0, "mid")
            .otherwise("low"))
        .groupBy($"band")
        .agg(count(lit(1)).as("n_orders"), dsum($"revenue", D4).as("band_revenue"))
        .orderBy($"band")
    },
    Some("""
      SELECT band, COUNT(*) AS n_orders,
        CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE) AS band_revenue
      FROM (
        SELECT CASE WHEN revenue > 300000.0 THEN 'bloom'
                    WHEN revenue >= 150000.0 THEN 'high'
                    WHEN revenue >= 50000.0 THEN 'mid'
                    ELSE 'low' END AS band, revenue
        FROM (
          SELECT l_orderkey,
            CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
          FROM lineitem GROUP BY l_orderkey) t) b
      GROUP BY band
      ORDER BY band"""))

  /** A8 ratio-of-aggregates (ifcb_delivery_data_to_shark.R:512-520):
    * biovolume/n_images×1000 analog; division of two exact sums.
    */
  private val q13 = GraftQuery(
    "q13_ratio_of_aggregates",
    (s, d) => {
      import s.implicits._
      lineitem(s, d)
        .groupBy($"l_suppkey")
        .agg(dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("n_items"))
        .withColumn("qty_per_item_x1000", $"sum_qty" / $"n_items" * 1000.0)
        .orderBy($"qty_per_item_x1000".desc, $"l_suppkey".asc)
    },
    Some("""
      SELECT l_suppkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 1000.0 AS qty_per_item_x1000
      FROM lineitem
      GROUP BY l_suppkey
      ORDER BY qty_per_item_x1000 DESC, l_suppkey ASC"""))

  /** A9 pivot-wider (compare_microscopy.R:99-104): Spark relational
    * pivot with explicit value list (no extra distinct pass at scale).
    */
  private val q14 = GraftQuery(
    "q14_pivot_wide",
    (s, d) => {
      import s.implicits._
      lineitem(s, d)
        .join(orders(s, d), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(dsum($"l_quantity"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
        CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "A",
        CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "N",
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "R"
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** A10 unpivot/pivot_longer (ifcb_delivery_data_to_shark.R:523-528). */
  private val q15 = GraftQuery(
    "q15_unpivot_long",
    (s, d) => {
      import s.implicits._
      orders(s, d)
        .select($"o_orderkey", $"o_totalprice", $"o_custkey".cast("double").as("o_custkey_d"))
        .unpivot(Array($"o_orderkey"), Array($"o_totalprice", $"o_custkey_d"), "metric", "value")
        .orderBy($"o_orderkey", $"metric")
    },
    Some("""
      SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS value FROM orders
      UNION ALL
      SELECT o_orderkey, 'o_custkey_d' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders
      ORDER BY o_orderkey, metric"""))

  /** A11 distinct-count summary (01_create_file_index.R:63-67). Exact
    * countDistinct here for the oracle; at 100 TB swap in
    * approx_count_distinct (HLL) — see q16's rows-only approx twin.
    */
  private val q16 = GraftQuery(
    "q16_count_distinct",
    (s, d) => {
      import s.implicits._
      lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct($"l_suppkey").as("n_supp"),
          countDistinct($"l_partkey").as("n_part"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag, COUNT(*) AS n_rows,
        COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(DISTINCT l_partkey) AS n_part
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** A12 duplicate detection via having count>1
    * (01_create_file_index.R:69-75) — the exact-dedup detection primitive.
    */
  private val q17 = GraftQuery(
    "q17_dup_detect",
    (s, d) => {
      import s.implicits._
      lineitem(s, d)
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(count(lit(1)).as("n"))
        .filter($"n" > 1)
        .orderBy($"l_partkey", $"l_suppkey")
    },
    Some("""
      SELECT l_partkey, l_suppkey, COUNT(*) AS n
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
      HAVING COUNT(*) > 1
      ORDER BY l_partkey, l_suppkey"""))

  /** A1's ordered string-agg (paste collapse, shark.R:344-351) — made
    * deterministic under shuffle by sorting the collected set (SURVEY.md
    * §7.4 risk 4).
    */
  private val q18 = GraftQuery(
    "q18_string_agg",
    (s, d) => {
      import s.implicits._
      orders(s, d)
        .join(lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          array_join(array_sort(collect_set($"l_returnflag")), ",").as("flags"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
        STRING_AGG(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) AS flags,
        COUNT(*) AS n
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** A14 count-by-month histogram (samples_frequency_map.R:76-79). */
  private val q19 = GraftQuery(
    "q19_month_histogram",
    (s, d) => {
      import s.implicits._
      events(s, d)
        .groupBy(date_format($"ts", "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n"), dsum($"value", D6).as("sum_value"))
        .orderBy($"month")
    },
    Some("""
      SELECT strftime(ts, '%Y-%m') AS month, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1
      ORDER BY 1"""))

  /** A15 min/max extraction (ifcb-image-export-pipeline.Rmd:946-951). */
  private val q20 = GraftQuery(
    "q20_minmax_dates",
    (s, d) => {
      import s.implicits._
      orders(s, d)
        .groupBy($"o_orderpriority")
        .agg(
          min($"o_orderdate").cast("date").as("first_date"),
          max($"o_orderdate").cast("date").as("last_date"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
        CAST(MIN(o_orderdate) AS DATE) AS first_date,
        CAST(MAX(o_orderdate) AS DATE) AS last_date,
        COUNT(*) AS n
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  val all: Seq[GraftQuery] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20)
}
