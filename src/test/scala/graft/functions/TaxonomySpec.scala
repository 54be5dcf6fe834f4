package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Taxonomy post-lookup logic: sflag derivation chain, F1 edge cases,
  * CF parent substitution semantics (Rmd:992-1049).
  */
class TaxonomySpec extends SparkSpec {
  import spark.implicits._

  test("sflag follows the R paste chain, including combinations") {
    val got = Seq(
      "alexandrium_spp",          // SPP
      "chaetoceros_cf_xx",        // CF
      "dino-like_cells",          // CF (-like)
      "cryptomonadales_group",    // GRP
      "mesodinium_sp",            // SP
      "thalassiosira_cf_spp",     // CF then SPP -> "CF SPP"
      "plain_taxon"               // null
    ).toDF("name")
      .select(col("name"), Taxonomy.sflag(col("name")).as("sflag"))
      .as[(String, Option[String])].collect().toMap
    assert(got("alexandrium_spp").contains("SPP"))
    assert(got("chaetoceros_cf_xx").contains("CF"))
    assert(got("dino-like_cells").contains("CF"))
    assert(got("cryptomonadales_group").contains("GRP"))
    assert(got("mesodinium_sp").contains("SP"))
    assert(got("thalassiosira_cf_spp").contains("CF SPP"))
    assert(got("plain_taxon").isEmpty)
  }

  test("f1 nulls NaN inputs and zero denominators (R mutate_all + 2PR/(P+R))") {
    val got = Seq(
      (0.8, 0.6),                       // 2*.48/1.4
      (Double.NaN, 0.5),                // NaN precision -> null
      (0.0, 0.0)                        // zero denominator -> null
    ).toDF("p", "r")
      .select(Taxonomy.f1(col("p"), col("r")).as("f1"))
      .as[Option[Double]].collect()
    assert(math.abs(got(0).get - 2 * 0.8 * 0.6 / 1.4) < 1e-12)
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("substituteCfParents replaces only CF rows' lineage, with fallbacks") {
    val classNames = Seq(
      // pure CF with a known parent: name+id replaced, sflag consumed
      ("a_cf_xx", "a", "CF", Some("Sci a"), 1L, 10L),
      // CF whose parent is unknown: falls back to own scientificname
      ("b_cf_xx", "b", "CF", Some("Sci b"), 2L, 99L),
      // CF, no parent, no scientificname: falls back to class_clean
      ("c_cf_xx", "c", "CF", None, 3L, 99L),
      // "CF SPP" is NOT exactly CF -> its parent is never fetched
      ("d_cf_spp", "d", "CF SPP", Some("Sci d"), 4L, 20L),
      // plain row untouched
      ("e", "e", null, Some("Sci e"), 5L, 10L)
    ).toDF("class", "class_clean", "sflag", "scientificname",
      "aphia_id", "parentNameUsageID")
    val parents = Seq((10L, "Parent ten"), (20L, "Parent twenty"))
      .toDF("AphiaID", "scientificname")

    val got = Taxonomy.substituteCfParents(classNames, parents)
      .select("class", "sflag", "scientificname", "aphia_id")
      .as[(String, Option[String], String, Long)].collect()
      .map(r => r._1 -> r).toMap

    assert(got("a_cf_xx") == ("a_cf_xx", None, "Parent ten", 10L))
    assert(got("b_cf_xx") == ("b_cf_xx", None, "Sci b", 2L))
    assert(got("c_cf_xx") == ("c_cf_xx", None, "c", 3L))
    // d: parent 20 was fetched? No - only exact-CF rows feed the parent
    // fetch, so d keeps its own name (sflag untouched)
    assert(got("d_cf_spp") == ("d_cf_spp", Some("CF SPP"), "Sci d", 4L))
    // e: parent 10 IS in the fetched set (via a) and e's parent id
    // matches -> the R semantics substitute it too, sflag stays null
    assert(got("e") == ("e", None, "Parent ten", 10L))
  }

  test("40-rule folder cleaner matches the reference chain on representative names") {
    // count_pngs_images.R:26-88 — one row per rule family
    val cases = Seq(
      // combined classes cut at the first comma (R:85)
      "Nodularia_spumigena_coil,Nodularia_spumigena_filament" -> "Nodularia spumigena",
      // iRfcb truncate_folder_name: 3-digit version folder
      "Dinophysis_acuminata_001" -> "Dinophysis acuminata",
      // special cases (R:27-33)
      "Gymnodiniales_CS" -> "Gymnodiniales",
      "Ciliophora_S" -> "Ciliophora",
      "cf_Proboscia_rhizosolenia" -> "Proboscia/Rhizosolenia",
      // size-qualifier phrases survive truncation (two digits, not three)
      "Aphanizomenon_flosaquae_larger_than_30" -> "Aphanizomenon flosaquae",
      // word-bounded cf leaves a double space the squish rule collapses
      "Chaetoceros_cf_simplex" -> "Chaetoceros simplex",
      // forma marker dotted (R:70)
      "Nodularia_spumigena_f_spumigena" -> "Nodularia spumigena f. spumigena",
      // capital-letter slash join (R:74-76)
      "Snowella_Woronichinia" -> "Snowella/Woronichinia",
      // hyphenated genus: word-bounded sp removed, hyphen kept
      "Pseudo-nitzschia_sp" -> "Pseudo-nitzschia",
      "Mesodinium_rubrum_single_cell" -> "Mesodinium rubrum")
    val got = cases.map(_._1).toDF("folder")
      .select($"folder", Taxonomy.cleanClassName($"folder").as("clean"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"cleanClassName($in) = ${got(in)}, want $want")
    }
  }

  test("variant batteries diverge exactly where their scripts do (round-14 parity audit)") {
    // four orderly-divergent copies of the cleaner exist in the
    // reference; each table must reproduce ITS script's gsub sequence.
    // Pins: names where at least two batteries disagree.
    def runAll(name: String): (String, String, String, String) = {
      val r = Seq(name).toDF("folder").select(
        Taxonomy.cleanClassName($"folder").as("pngs"),
        Taxonomy.cleanClassName($"folder", Taxonomy.CleanRulesExport).as("export"),
        Taxonomy.cleanClassName($"folder", Taxonomy.CleanRulesNiva).as("niva"),
        Taxonomy.cleanClassName($"folder", Taxonomy.CleanRulesSharkMatlab).as("matlab"))
        .as[(String, String, String, String)].head()
      r
    }
    // " colony" exists ONLY in the NIVA battery (niva.Rmd:138)
    assert(runAll("Dolichospermum_colony") ==
      (("Dolichospermum colony", "Dolichospermum colony",
        "Dolichospermum", "Dolichospermum colony")))
    // " round" exists in the export Rmds but not count_pngs / matlab
    assert(runAll("Chaetoceros_round") ==
      (("Chaetoceros round", "Chaetoceros", "Chaetoceros", "Chaetoceros round")))
    // " heterotropic" exists in count_pngs and NIVA, not export / matlab
    assert(runAll("Ceratium_heterotropic") ==
      (("Ceratium", "Ceratium heterotropic", "Ceratium", "Ceratium heterotropic")))
    // folder truncation: matlab names come from class lists, never
    // version-suffixed folders — its battery must NOT truncate
    assert(runAll("Mesodinium_001") ==
      (("Mesodinium", "Mesodinium", "Mesodinium", "Mesodinium 001")))
    // count_pngs-only morphology rule
    assert(runAll("Cryptomonas_elliptical") ==
      (("Cryptomonas", "Cryptomonas elliptical", "Cryptomonas elliptical",
        "Cryptomonas elliptical")))
    // shared behavior stays shared: flags, slash join, first-comma cut
    assert(runAll("Snowella_Woronichinia") ==
      (("Snowella/Woronichinia", "Snowella/Woronichinia",
        "Snowella/Woronichinia", "Snowella/Woronichinia")))
    assert(runAll("Nodularia_spumigena_coil,Nodularia_spumigena_filament") ==
      (("Nodularia spumigena", "Nodularia spumigena",
        "Nodularia spumigena", "Nodularia spumigena")))
    // the SQL mirror takes the same table parameter (oracle parity for
    // any future variant-battery query)
    val sql = Taxonomy.cleanClassNameSql("folder", Taxonomy.CleanRulesNiva)
    assert(sql.contains(" colony") && sql.contains(" heterotropic"))
  }
}
