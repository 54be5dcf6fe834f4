package graft.jobs

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** M5 index-driven copy (reference 02_copy_from_index.R): first-match
  * source resolution, per-owner path construction, no-overwrite
  * collision handling, SMHI skip/include, missing-source accounting,
  * and second-run idempotency.
  */
class CopyFromIndexSpec extends SparkSpec {
  import spark.implicits._

  private def write(path: String, content: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"))
    ()
  }

  private def read(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  test("copy_from_index: first-match resolution, owner paths, collisions, SMHI, missing") {
    val root = Files.createTempDirectory("copyidx").toString
    val orig = s"$root/original_data"
    val dest = s"$root/merged"
    val smhi = s"$root/smhi_png"

    // img1 exists under BOTH NIVA and SYKE — the reference keeps the
    // index's first row per (filename, dest_class): NIVA (rbindlist
    // order), so the merged tree must hold NIVA's bytes
    write(s"$orig/NIVA/classA/img1.png", "niva1")
    write(s"$orig/SYKE/nested/classA/img1.png", "syke1")
    write(s"$orig/SAMS/classB/img2.png", "sams2")
    write(s"$smhi/img3.png", "smhi3")
    // img5's destination ALREADY exists (the reference's SMHI-prefilled
    // dest case): overwrite=FALSE must keep the old bytes
    write(s"$orig/NIVA/classB/img5.png", "new5")
    write(s"$dest/classB/img5.png", "old5")

    val index = Seq(
      ("img1.png", "classA", "NIVA", "classA/img1.png"),
      ("img1.png", "classA", "SYKE", "nested/classA/img1.png"),
      ("img2.png", "classB", "SAMS", "classB/img2.png"),
      ("img3.png", "classC", "SMHI", null),
      ("img4.png", "classA", "NIVA", "classA/img4.png"), // source absent
      ("img5.png", "classB", "NIVA", "classB/img5.png")
    ).toDF("filename", "dest_class", "source_owner", "source_relpath")

    // --- no SMHI source dir: SMHI rows are skipped with a count ---
    val (ledger, summary) = CopyFromIndex.run(index, orig, dest)
    val st = ledger.select($"filename", $"status").as[(String, String)]
      .collect().toMap
    assert(st == Map(
      "img1.png" -> "copied", "img2.png" -> "copied",
      "img3.png" -> "skipped_smhi", "img4.png" -> "missing",
      "img5.png" -> "exists"), st.toString)
    // dedup happened BEFORE the copy: one ledger row per (filename,
    // dest_class), the winning source recorded
    assert(ledger.count() == 5)
    assert(ledger.filter($"filename" === "img1.png")
      .select($"source_owner").as[String].collect().toSeq == Seq("NIVA"))
    // first match wins the bytes; no-overwrite keeps old5
    assert(read(s"$dest/classA/img1.png") == "niva1")
    assert(read(s"$dest/classB/img2.png") == "sams2")
    assert(read(s"$dest/classB/img5.png") == "old5")
    assert(!Files.exists(Paths.get(s"$dest/classC/img3.png")))
    val sm = summary.as[(String, Long)].collect().toMap
    assert(sm == Map("copied" -> 2L, "exists" -> 1L, "missing" -> 1L,
      "skipped_smhi" -> 1L), sm.toString)

    // --- with the SMHI source dir: img3 resolves by bare filename ---
    val (ledger2, _) = CopyFromIndex.run(index, orig, dest, Some(smhi))
    val st2 = ledger2.select($"filename", $"status").as[(String, String)]
      .collect().toMap
    assert(st2("img3.png") == "copied", st2.toString)
    assert(read(s"$dest/classC/img3.png") == "smhi3")
    // everything already copied reports exists — idempotent second run
    assert(st2("img1.png") == "exists" && st2("img2.png") == "exists")

    // an unknown owner fails LOUDLY before any copy — a typo would
    // otherwise fall silently into the SMHI branch (round-19 review)
    val bad = Seq(("img9.png", "classA", "niva", "classA/img9.png"))
      .toDF("filename", "dest_class", "source_owner", "source_relpath")
    val e = intercept[IllegalArgumentException] {
      CopyFromIndex.run(bad, orig, dest)
    }
    assert(e.getMessage.contains("niva"), e.getMessage)
  }
}
