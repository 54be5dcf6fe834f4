package graft.sources

import java.nio.file.Files
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._
import graft.SparkSpec

class ZipSinkSpec extends SparkSpec {
  import spark.implicits._

  test("packs size-capped parts with manifest; all entries round-trip") {
    val dir = Files.createTempDirectory("zip").toString + "/out"
    val rows = (1 to 10).map(i => (f"img$i%03d.png", Array.fill[Byte](100)(i.toByte)))
    val manifest = ZipSink.write(rows.toDF("name", "bytes"), "name", "bytes",
      dir, maxPartBytes = 350L)
    val m = manifest.collect()
    assert(m.length == 10)
    val parts = m.map(_.getAs[Int]("part")).distinct.sorted
    assert(parts.length >= 3) // 1000 bytes / 350 cap
    val entries = parts.flatMap { p =>
      val zf = new ZipFile(s"$dir/part-$p.zip")
      try {
        val es = zf.entries().asScala.map(_.getName).toSeq
        assert(es.contains("MANIFEST.txt"))
        es.filterNot(_ == "MANIFEST.txt").map { e =>
          val data = zf.getInputStream(zf.getEntry(e)).readAllBytes()
          assert(data.length == 100)
          e
        }
      } finally zf.close()
    }
    assert(entries.sorted.toSeq == rows.map(_._1))
  }

  test("the reserved MANIFEST.txt entry name fails fast, not at part close") {
    val dir = Files.createTempDirectory("zipres").toString + "/out"
    val rows = Seq(("MANIFEST.txt", Array[Byte](1)), ("ok.png", Array[Byte](2)))
    val e = intercept[IllegalArgumentException](
      ZipSink.write(rows.toDF("name", "bytes"), "name", "bytes", dir, 1000L))
    assert(e.getMessage.contains("reserved"), e.getMessage)
  }

  test("a mid-write failure cleans up its .zip.tmp and a bad cap rejects up front") {
    // round-12 review: a null bytes row used to NPE with the stream
    // open and the tmp file orphaned in the archive dir
    val dir = Files.createTempDirectory("zipfail").toString + "/out"
    // a null bytes row fails LOUDLY (the metadata length pass rejects
    // it; the writer's own require is the second gate) and leaves no
    // orphaned .zip.tmp in the archive dir
    val rows = Seq(("a.png", Array[Byte](1)), ("b.png", null: Array[Byte]))
    intercept[Exception](
      ZipSink.write(rows.toDF("name", "bytes"), "name", "bytes", dir, 1000L))
    val leftovers = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.endsWith(".zip.tmp"))
    assert(leftovers.isEmpty, s"orphaned tmp parts: $leftovers")
    val e2 = intercept[IllegalArgumentException](
      ZipSink.write(Seq(("a.png", Array[Byte](1))).toDF("name", "bytes"),
        "name", "bytes", dir, 0L))
    assert(e2.getMessage.contains("maxPartBytes"), e2.getMessage)
  }

  test("re-running over an existing output directory replaces parts atomically") {
    // REPLACE_EXISTING + ATOMIC_MOVE (round-12 review): the second run
    // must overwrite part-0.zip wholesale, not throw FileAlreadyExists
    val dir = Files.createTempDirectory("ziprerun").toString + "/out"
    val rows = Seq(("a.png", Array[Byte](1, 2, 3)))
    ZipSink.write(rows.toDF("name", "bytes"), "name", "bytes", dir, 1000L)
    ZipSink.write(rows.toDF("name", "bytes"), "name", "bytes", dir, 1000L)
    val zf = new ZipFile(s"$dir/part-0.zip")
    try assert(zf.entries().asScala.map(_.getName).toSet ==
      Set("a.png", "MANIFEST.txt"))
    finally zf.close()
  }

  test("duplicate entry names fail loudly instead of fanning out") {
    val dir = Files.createTempDirectory("zipdup").toString + "/out"
    val rows = Seq(("a.png", Array[Byte](1)), ("a.png", Array[Byte](2)))
    val e = intercept[IllegalArgumentException] {
      ZipSink.write(rows.toDF("name", "bytes"), "name", "bytes", dir, 100L)
    }
    assert(e.getMessage.contains("duplicate entry names"))
    assert(e.getMessage.contains("a.png"))
  }
}
