package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.GraftQuery._
import graft.functions.{Nums, Strings}

/** Scalar-function battery (SURVEY.md §2.8) plus the conditional null
  * gates P6-P8 and the JSON scan S7 — each as an oracle-checked query.
  */
object ScalarBattery {

  import Tables._

  /** §2.8 regex family: the taxa-cleaner shape (Rmd:936-971) — an ordered
    * regexp_replace chain + squish + sentence case, folded by Catalyst
    * into one codegen stage.
    */
  private val q31 = GraftQuery(
    "q31_regex_clean",
    (s, d) => {
      import s.implicits._
      val cleaned = Strings.sentenceCase(Strings.squish(
        Strings.regexClean(Seq(
          "\\b(red|blue|green|yellow|small)\\b" -> "",
          "_+" -> " "))($"p_name")))
      part(s, d)
        .groupBy(cleaned.as("clean_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"clean_name")
    },
    Some(s"""
      SELECT UPPER(SUBSTRING(sq, 1, 1)) || LOWER(SUBSTRING(sq, 2)) AS clean_name,
             COUNT(*) AS n
      FROM (
        SELECT TRIM(REGEXP_REPLACE(
                 REGEXP_REPLACE(
                   REGEXP_REPLACE(p_name, '\\b(red|blue|green|yellow|small)\\b', '', 'g'),
                   '_+', ' ', 'g'),
                 '${graft.functions.Hashing.WsClass}', ' ', 'g')) AS sq
        FROM part) t
      GROUP BY 1
      ORDER BY 1"""))
      // the squish mirror uses the explicit WsClass, not '\\s+' — RE2's
      // \\s lacks \\x0B, Java's (the Spark side) has it (round-12 review)

  /** §2.8 split/substr/pad/concat family (Rmd:716,1083 pid prefix;
    * shark.R:243 sprintf %05d; Rmd:761 unite).
    */
  private val q32 = GraftQuery(
    "q32_string_parts",
    (s, d) => {
      import s.implicits._
      customer(s, d)
        .select(
          $"c_custkey",
          split($"c_name", "#").getItem(1).as("key_str"),
          format_string("%010d", $"c_custkey").as("key_pad"),
          lower(substring($"c_name", 1, 8)).as("prefix"),
          length($"c_name").as("name_len"),
          concat_ws("-", lit("C"), $"c_mktsegment", $"c_nationkey").as("joined"))
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey,
        string_split(c_name, '#')[2] AS key_str,
        printf('%010d', c_custkey) AS key_pad,
        LOWER(SUBSTRING(c_name, 1, 8)) AS prefix,
        LENGTH(c_name) AS name_len,
        CONCAT_WS('-', 'C', c_mktsegment, c_nationkey) AS joined
      FROM customer
      ORDER BY c_custkey"""))

  /** §2.8 date/time family (Rmd:1383 format YYYYMMDDHHMMSS, :811 month/
    * year, hab_alert.R:21 date arithmetic, :410 seasonal gate).
    */
  private val q33 = GraftQuery(
    "q33_datetime_battery",
    (s, d) => {
      import s.implicits._
      events(s, d)
        .withColumn("ymd", date_format($"ts", "yyyyMMdd"))
        .withColumn("in_window", dayofmonth($"ts").between(10, 20))
        .groupBy($"ymd")
        .agg(
          count(lit(1)).as("n"),
          sum(when($"in_window", 1L).otherwise(0L)).as("n_in_window"),
          max(dayofyear($"ts")).as("max_doy"),
          min(month($"ts")).as("min_month"),
          // format AFTER the max, not inside it (round-20, guide §4):
          // date_format(·, "yyyy-MM-dd") is monotone non-decreasing in
          // ts, so max(format(ts+7d)) = format(max(ts)+7d) — and the
          // formatted-string max was the one immutable (string) agg
          // buffer forcing this whole aggregation into SortAggregate;
          // with a timestamp max buffer every phase is codegen
          // HashAggregate
          date_format(max($"ts") + expr("INTERVAL 7 DAY"), "yyyy-MM-dd")
            .as("max_plus7"))
        .orderBy($"ymd")
    },
    Some("""
      SELECT strftime(ts, '%Y%m%d') AS ymd, COUNT(*) AS n,
        CAST(SUM(CASE WHEN day(ts) BETWEEN 10 AND 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_window,
        MAX(dayofyear(ts)) AS max_doy,
        MIN(month(ts)) AS min_month,
        MAX(strftime(ts + INTERVAL 7 DAY, '%Y-%m-%d')) AS max_plus7
      FROM events
      GROUP BY 1
      ORDER BY 1"""))

  /** S7 JSON scan (ifcb_delivery_data_to_shark.R:265-266 per-class JSON
    * thresholds): JSON field extraction in the relational layer.
    */
  private val q34 = GraftQuery(
    "q34_json_extract",
    (s, d) => {
      import s.implicits._
      events(s, d)
        // from_json with an explicit schema beats get_json_object ~2x
        // (single parse into a struct, no per-path JSON re-walk)
        .withColumn("k", from_json($"props",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k"))
        .groupBy($"event_type")
        .agg(count($"k").as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM (SELECT event_type,
              CASE WHEN json_valid(props)
                     AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                THEN TRY_CAST(props->>'$.k' AS BIGINT) END AS k
            FROM events) t
      GROUP BY event_type
      ORDER BY event_type"""))
      // Mirror of from_json's lenient nulls, pinned empirically on BOTH
      // engines (round-12 review): Spark's PERMISSIVE JacksonParser nulls
      // the struct for a non-integer k ({"k": 1.5}) AND a quoted number
      // ({"k": "123"}), while DuckDB's ->> stringifies those and
      // TRY_CAST would "helpfully" produce 2 / 123 — so the oracle gates
      // on json_type IN (BIGINT, UBIGINT) before casting. TRY_CAST stays
      // for the one residual case the type gate passes: a UBIGINT above
      // Long.MaxValue, which both engines null.

  /** P6 stale-fix nulling (Rmd:255-258), P7 QC-flag gating (Rmd:1145-1157),
    * P8 sentinel→null (Rmd:1333-1339) — the three conditional-invalidation
    * shapes in one pass over the event stream.
    */
  private val q35 = GraftQuery(
    "q35_null_gates",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      events(s, d)
        .withColumn("gap_us", unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
        // P6: value invalid when the previous observation is > 10 min stale
        .withColumn("fresh_v",
          when($"gap_us".isNull || $"gap_us" > 600000000L, lit(null)).otherwise($"value"))
        // P7: value kept only when its paired QC flag == 1
        .withColumn("qc_v", when($"event_id" % 2 === 1, $"value"))
        // P8: sentinel floor(value)==0 → null. NaN routes to the
        // sentinel BEFORE floor on both engines (round-13 review, the
        // clamp-before-floor class): Spark's floor(double) converts
        // NaN→0 internally while DuckDB's FLOOR keeps NaN, so an
        // unguarded NaN value counted on DuckDB only
        .withColumn("nz_v", nullif(floor(
          when(isnan($"value"), lit(0.0)).otherwise($"value")), lit(0.0)))
        .groupBy($"user_id")
        .agg(
          count($"fresh_v").as("n_fresh"),
          dsum($"qc_v", D6).as("sum_qc"),
          count($"nz_v").as("n_nonzero"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id,
        COUNT(CASE WHEN gap_us IS NULL OR gap_us > 600000000 THEN NULL ELSE value END) AS n_fresh,
        CAST(SUM(CAST(CASE WHEN event_id % 2 = 1 THEN value END AS DECIMAL(18,6))) AS DOUBLE) AS sum_qc,
        COUNT(NULLIF(FLOOR(CASE WHEN isnan(value) THEN 0.0 ELSE value END), 0.0)) AS n_nonzero
      FROM (
        SELECT *, epoch_us(ts) - epoch_us(LAG(ts) OVER
          (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events) t
      GROUP BY user_id
      ORDER BY user_id"""))

  /** §2.8 math family: signif presentation rounding (Rmd:1398-1443) and
    * the harmonic-mean/F1 shape (Rmd:909).
    */
  private val q36 = GraftQuery(
    "q36_signif_math",
    (s, d) => {
      import s.implicits._
      orders(s, d)
        .withColumn("sig4", Nums.signifPos($"o_totalprice", 4))
        .groupBy($"o_orderpriority")
        .agg(
          dsum($"sig4").as("sum_sig4"),
          dsum(when($"o_orderstatus" === "F", $"o_totalprice")).as("a"),
          dsum(when($"o_orderstatus" === "O", $"o_totalprice")).as("b"))
        .withColumn("f1", round(Nums.harmonic($"a", $"b"), 2))
        .select($"o_orderpriority", $"sum_sig4", $"f1")
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, sum_sig4,
        CASE WHEN a + b <> 0.0 THEN ROUND(2.0 * a * b / (a + b), 2) END AS f1
      FROM (
        SELECT o_orderpriority,
          CAST(SUM(CAST(round_even(o_totalprice / POW(10.0, LENGTH(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR)) - 4), 0) *
            POW(10.0, LENGTH(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR)) - 4) AS DECIMAL(18,2))) AS DOUBLE) AS sum_sig4,
          CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS a,
          CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS b
        FROM orders
        GROUP BY o_orderpriority) t
      ORDER BY o_orderpriority"""))

  /** §2.8 encoding family (SURVEY §7.4 risk 8): legacy classifier path
    * names carry Windows-1252 Scandinavian letters, µ-unit headers, and
    * backslash paths (Rmd:861-863, 1426; ifcb_ingest_and_qc.R:474).
    * Synthesizes the mojibake deterministically from `part` rows, then
    * normalizes with [[Strings.normalizeClassifierName]]; the oracle
    * mirrors each step with DuckDB string functions. (The byte-level
    * Windows-1252 → UTF-8 decode is native `decode()` — spec-covered in
    * FunctionsSpec; not SQL-expressible in DuckDB.)
    */
  private val q56 = GraftQuery(
    "q56_encoding_cleanup",
    (s, d) => {
      import s.implicits._
      val raw = concat(
        lit("C:\\classifiers\\Tångesund_"), $"p_brand",
        lit("_µm_v"), ($"p_partkey" % 5).cast("string"))
      part(s, d)
        .withColumn("classifier", Strings.normalizeClassifierName(raw))
        .groupBy($"classifier")
        .agg(count(lit(1)).as("n"))
        .orderBy($"classifier")
    },
    Some("""
      SELECT classifier, COUNT(*) AS n
      FROM (
        SELECT translate(
                 list_extract(string_split(replace(
                   'C:\classifiers\Tångesund_' || p_brand ||
                     '_µm_v' || CAST(p_partkey % 5 AS VARCHAR),
                   '\', '/'), '/'), -1),
                 'åÅäÄöÖμµ', 'aAaAoOuu') AS classifier
        FROM part) t
      GROUP BY classifier
      ORDER BY classifier"""))

  val all: Seq[GraftQuery] = Seq(q31, q32, q33, q34, q35, q36, q56)
}
