package graft.queries

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.Taxonomy

/** Taxonomy post-lookup operators as oracle-checked queries: the class
  * dim is synthesized deterministically from `part` (marker suffixes by
  * key residue) so every step — sflag derivation, CF parent
  * substitution, F1 threshold selection — is SQL-expressible for the
  * DuckDB differential gate.
  */
object TaxonomyQueries {

  import Tables._

  /** q57: sflag derivation + CF parent substitution (Rmd:992-1049).
    * Parent ids are the key's tens-bucket; parent records exist only
    * for keys ≡ 0 (mod 10), so sub-10 CF taxa exercise the
    * `scientificname → class_clean` fallback chain.
    */
  private val q57 = GraftQuery(
    "q57_taxonomy_parents",
    (s, d) => {
      import s.implicits._
      val base = part(s, d).select(
        $"p_partkey".as("aphia_id"),
        (floor($"p_partkey" / 10) * 10).cast("long").as("parentNameUsageID"),
        concat(
          regexp_replace(lower($"p_name"), " ", "_"),
          element_at(
            array(lit(""), lit("_cf_xx"), lit("_spp"), lit("_group"), lit("_sp")),
            ($"p_partkey" % 5 + 1).cast("int"))).as("class"))
      val classNames = base
        .withColumn("class_clean",
          regexp_replace(
            regexp_replace($"class", "_(cf_xx|spp|group|sp)$", ""), "_", " "))
        .withColumn("sflag", Taxonomy.sflag($"class"))
        .withColumn("scientificname",
          when($"aphia_id" % 3 === 0, concat(lit("Sci "), $"class_clean")))
      val parents = part(s, d)
        .filter($"p_partkey" % 10 === 0)
        .select($"p_partkey".cast("long").as("AphiaID"),
          concat(lit("Parent "), $"p_partkey").as("scientificname"))
      Taxonomy.substituteCfParents(classNames, parents)
        .select($"class", $"class_clean", $"sflag", $"scientificname", $"aphia_id")
        .orderBy($"class", $"aphia_id")
    },
    Some("""
      WITH base AS (
        SELECT p_partkey AS aphia_id,
               CAST(FLOOR(p_partkey / 10) * 10 AS BIGINT) AS parent_id,
               REPLACE(LOWER(p_name), ' ', '_') ||
                 CASE CAST(p_partkey % 5 AS INT)
                   WHEN 0 THEN '' WHEN 1 THEN '_cf_xx' WHEN 2 THEN '_spp'
                   WHEN 3 THEN '_group' ELSE '_sp' END AS class
        FROM part),
      flagged AS (
        SELECT *,
               REPLACE(REGEXP_REPLACE(class, '_(cf_xx|spp|group|sp)$', ''), '_', ' ') AS class_clean,
               CASE WHEN contains(class, '-like') OR contains(class, '_cf_')
                         OR contains(class, '_like') THEN 'CF' END AS s0
        FROM base),
      f1x AS (
        SELECT *, CASE WHEN regexp_matches(REPLACE(class, '_', ' '), '\bspp\b')
                       THEN TRIM(CONCAT_WS(' ', COALESCE(s0, ''), 'SPP'))
                       ELSE s0 END AS s1
        FROM flagged),
      f2x AS (
        SELECT *, CASE WHEN regexp_matches(REPLACE(class, '_', ' '), '\bgroup\b')
                       THEN TRIM(CONCAT_WS(' ', COALESCE(s1, ''), 'GRP'))
                       ELSE s1 END AS s2
        FROM f1x),
      f3x AS (
        SELECT *, CASE WHEN regexp_matches(REPLACE(class, '_', ' '), '\bsp\b')
                       THEN TRIM(CONCAT_WS(' ', COALESCE(s2, ''), 'SP'))
                       ELSE s2 END AS sflag,
               CASE WHEN aphia_id % 3 = 0 THEN 'Sci ' || class_clean END AS scientificname
        FROM f2x),
      parents AS (
        SELECT CAST(p_partkey AS BIGINT) AS parent_aphia,
               'Parent ' || p_partkey AS parent_name
        FROM part WHERE p_partkey % 10 = 0),
      prel AS (
        SELECT parents.* FROM parents
        WHERE parent_aphia IN (SELECT DISTINCT parent_id FROM f3x WHERE sflag = 'CF'))
      SELECT f.class,
             f.class_clean,
             CASE WHEN f.sflag = 'CF' THEN NULL ELSE f.sflag END AS sflag,
             COALESCE(p.parent_name, f.scientificname, f.class_clean) AS scientificname,
             COALESCE(CASE WHEN p.parent_name IS NULL THEN NULL ELSE f.parent_id END,
                      f.aphia_id) AS aphia_id
      FROM f3x f LEFT JOIN prel p ON f.parent_id = p.parent_aphia
      ORDER BY class, aphia_id"""))

  /** q58: per-class F1 = 2PR/(P+R) + threshold selection (Rmd:1001-1008;
    * the params `f1_threshold`). Precision/recall derive from exact
    * integer/decimal sums so the per-row double arithmetic is
    * bit-deterministic across engines.
    */
  private val q58 = GraftQuery(
    "q58_f1_threshold",
    (s, d) => {
      import s.implicits._
      val scores = part(s, d)
        .groupBy($"p_brand".as("class"))
        .agg(
          (sum($"p_size") / (count(lit(1)) * 50.0)).as("precision"),
          (GraftQuery.dsum($"p_retailprice") / (count(lit(1)) * 2000.0))
            .as("detection_probability"))
      scores
        .withColumn("f1", Taxonomy.f1($"precision", $"detection_probability"))
        .withColumn("above_threshold", $"f1" >= 0.9)
        .orderBy($"class")
    },
    Some(s"""
      WITH scores AS (
        SELECT p_brand AS class,
               SUM(p_size) / (COUNT(*) * 50.0) AS precision,
               ${GraftQuery.dsumSql("p_retailprice")} / (COUNT(*) * 2000.0)
                 AS detection_probability
        FROM part GROUP BY 1)
      SELECT class, precision, detection_probability,
             CASE WHEN precision + detection_probability <> 0.0
                  THEN 2.0 * precision * detection_probability /
                       (precision + detection_probability) END AS f1,
             CASE WHEN precision + detection_probability <> 0.0
                  THEN 2.0 * precision * detection_probability /
                       (precision + detection_probability) >= 0.9 END
               AS above_threshold
      FROM scores
      ORDER BY class"""))

  /** Folder-name decorations by key residue — every [[Taxonomy.CleanRules]]
    * family represented: morphology suffixes, flags, a versioned folder,
    * a comma-combined class, a forma marker.
    */
  private val Decos = Seq("", "_single_cell", "_chain", "_cf", "_spp",
    "_larger_than_30", "_smaller_than_30", "_001", "_like",
    ",Nodularia_spumigena_coil", "_group", "_sp1", "_f",
    "_heterotrof", "_single", "_filament")

  /** q64: the 40-rule training-folder class-name cleaner
    * (count_pngs_images.R:26-88 — the long-tail variant of q31's chain)
    * over class-folder names synthesized deterministically from `part`:
    * versioned folders, morphology suffixes, species flags, forma
    * markers, comma-combined classes, and the Gymnodiniales/Ciliophora/
    * Proboscia special cases, each selected by key residue so every rule
    * family fires. The chain itself is [[Taxonomy.CleanRules]] — one
    * ordered table rendering both engines' identical regex sequence.
    * Pure map-side projection + one count shuffle.
    */
  private val q64 = GraftQuery(
    "q64_taxa_cleaner_40",
    (s, d) => {
      import s.implicits._
      val w = split($"p_name", " ")
      def cap(c: org.apache.spark.sql.Column) =
        concat(upper(substring(c, 1, 1)), substring(c, 2, 1000))
      val species = when($"p_partkey" % 7 === 0, cap(element_at(w, 2)))
        .otherwise(element_at(w, 2))
      val deco = element_at(
        array(Decos.map(lit): _*), ($"p_partkey" % 16).cast("int") + 1)
      val folder = when($"p_partkey" % 23 === 0, lit("Gymnodiniales_S"))
        .when($"p_partkey" % 23 === 1, lit("Gymnodiniales_CS"))
        .when($"p_partkey" % 23 === 2, lit("Gymnodiniales_CC"))
        .when($"p_partkey" % 23 === 3, lit("Ciliophora_S"))
        .when($"p_partkey" % 23 === 4, lit("cf_Proboscia_rhizosolenia"))
        .otherwise(concat(cap(element_at(w, 1)), lit("_"), species, deco))
      part(s, d)
        .select(Taxonomy.cleanClassName(folder).as("clean_name"))
        .groupBy($"clean_name")
        .agg(count(lit(1)).as("n"))
        .orderBy($"clean_name")
    },
    Some(s"""
      WITH folders AS (
        SELECT CASE
          WHEN p_partkey % 23 = 0 THEN 'Gymnodiniales_S'
          WHEN p_partkey % 23 = 1 THEN 'Gymnodiniales_CS'
          WHEN p_partkey % 23 = 2 THEN 'Gymnodiniales_CC'
          WHEN p_partkey % 23 = 3 THEN 'Ciliophora_S'
          WHEN p_partkey % 23 = 4 THEN 'cf_Proboscia_rhizosolenia'
          ELSE upper(substr(w[1], 1, 1)) || substr(w[1], 2, 1000) || '_' ||
            CASE WHEN p_partkey % 7 = 0
                 THEN upper(substr(w[2], 1, 1)) || substr(w[2], 2, 1000)
                 ELSE w[2] END ||
            (${Decos.map("'" + _ + "'").mkString("[", ", ", "]")})
              [CAST(p_partkey % 16 AS INTEGER) + 1]
          END AS folder
        FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part) t)
      SELECT ${Taxonomy.cleanClassNameSql("folder")} AS clean_name,
             COUNT(*) AS n
      FROM folders
      GROUP BY 1
      ORDER BY 1"""))

  val all: Seq[GraftQuery] = Seq(q57, q58, q64)
}
