package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Fuzzing for the ADC/ROI slice reader and the HDR text reader
  * (round-10 extension of the MatFuzz/H5Fuzz/SqliteFuzz family to the
  * domain's two most-used sources).
  *
  * ROI: the `.roi` payload is opaque bytes — every possible payload is
  * "valid" — so the fuzz surface is the ADC geometry that drives the
  * slice. Generated bins must round-trip pixel-exactly; corrupted
  * geometry (offset/extent past the payload, negative offsets) must
  * raise through the strict guard, never silently return short or
  * misplaced pixel arrays.
  *
  * HDR: arbitrary text lines (missing colons, repeated colons, unicode,
  * blank values) must never throw — the reader's contract is typed
  * extraction of the requested keys and null for everything absent.
  */
class RoiFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def sampleId(i: Int): String =
    f"D202401${1 + i / 24}%02dT${i % 24}%02d0000_IFCB134"

  test("round-trip: 40 generated bins slice back the exact pixel payloads") {
    val dir = Files.createTempDirectory("roifuzz")
    val rnd = new scala.util.Random(11L)
    // expected (sample, roi_number) -> pixel bytes
    val expected = scala.collection.mutable.Map.empty[(String, Int), Seq[Byte]]
    var expectedRows = 0
    for (b <- 0 until 40) {
      val sid = sampleId(b)
      val n = 1 + rnd.nextInt(5)
      val payload = new java.io.ByteArrayOutputStream()
      val adc = new StringBuilder("roi_number,width,height,start_byte\n")
      // leading junk the ADC never references (real .roi files may carry
      // header bytes the offsets simply skip)
      val junk = new Array[Byte](rnd.nextInt(16))
      rnd.nextBytes(junk)
      payload.write(junk)
      for (r <- 1 to n) {
        if (rnd.nextInt(4) == 0) {
          // zero-area trigger: present in the ADC, no image bytes — the
          // reader must drop it
          adc ++= s"$r,0,0,${payload.size}\n"
        } else {
          val w = 1 + rnd.nextInt(8)
          val h = 1 + rnd.nextInt(8)
          val px = new Array[Byte](w * h)
          rnd.nextBytes(px)
          adc ++= s"$r,$w,$h,${payload.size}\n"
          expected((sid, r)) = px.toSeq
          expectedRows += 1
          payload.write(px)
        }
      }
      Files.write(dir.resolve(s"$sid.roi"), payload.toByteArray)
      Files.writeString(dir.resolve(s"$sid.adc"), adc.toString)
    }
    val got = RoiSource.read(spark, dir.toString)
      .select("sample", "roi_number", "pixels")
      .as[(String, Int, Array[Byte])].collect()
    assert(got.length == expectedRows, s"${got.length} vs $expectedRows")
    got.foreach { case (s, r, px) =>
      assert(px.toSeq == expected((s, r)), s"pixels differ for $s roi $r")
    }
  }

  test("corrupted ADC geometry raises instead of slicing short or misplaced") {
    def corruptBin(adcRow: String): Throwable = {
      val dir = Files.createTempDirectory("roicorrupt")
      val sid = sampleId(0)
      Files.write(dir.resolve(s"$sid.roi"), Array.tabulate[Byte](20)(_.toByte))
      Files.writeString(dir.resolve(s"$sid.adc"),
        s"roi_number,width,height,start_byte\n$adcRow\n")
      intercept[Throwable] {
        RoiSource.read(spark, dir.toString).collect()
      }
    }
    def messageOf(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    // extent past the payload: 4x4 = 16 bytes claimed at offset 10 of 20
    assert(messageOf(corruptBin("1,4,4,10")).contains("truncated ROI slice"))
    // offset entirely past the payload
    assert(messageOf(corruptBin("1,2,2,100")).contains("truncated ROI slice"))
    // negative offset: would slice from the payload END with the right
    // length — wrong pixels, silently — without the guard
    assert(messageOf(corruptBin("1,2,2,-4")).contains("truncated ROI slice"))
    // 32-bit wrap-arounds (review finding): start_byte+1 wrapping to a
    // small negative int would slice the END with a plausible length;
    // width*height wrapping to 0 would return an "empty image" that
    // passes a naive length check — both must reject via 64-bit math
    assert(messageOf(corruptBin("1,4,4,4294967279")).contains("truncated ROI slice"))
    assert(messageOf(corruptBin("1,65536,65536,0")).contains("truncated ROI slice"))
    // 64-bit wrap-around (round-11 advice): start_byte near Long.MaxValue
    // makes start_byte + need wrap NEGATIVE in non-ANSI long arithmetic,
    // which passed an addition-side `start + need <= payload` guard and
    // silently returned a clamped garbage slice — the subtraction-side
    // bound must reject it
    assert(messageOf(corruptBin("1,2,2,9223372036854775805"))
      .contains("truncated ROI slice"))
    // and strict=false hands the row through for dead-letter flows
    val dir = Files.createTempDirectory("roilenient")
    val sid = sampleId(0)
    Files.write(dir.resolve(s"$sid.roi"), Array.tabulate[Byte](20)(_.toByte))
    Files.writeString(dir.resolve(s"$sid.adc"),
      s"roi_number,width,height,start_byte\n1,4,4,10\n")
    val adc = RoiSource.readAdc(spark, s"$dir/*.adc")
    val roi = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.roi").load(dir.toString)
    val lenient = RoiSource.images(adc, roi, strict = false).collect()
    assert(lenient.length == 1) // short slice visible to the caller's gate
  }

  test("HDR first-occurrence-wins holds across file SPLITS (round-11 ordering pin)") {
    // the duplicate-key fix keys "file order" off monotonically_increasing_id,
    // whose cross-split monotonicity-by-offset was asserted in a comment but
    // never pinned over a file actually cut into >= 2 splits. Force tiny
    // splits and duplicate a key across the boundary: the FIRST value must
    // win even when the second occurrence sits in a different partition.
    val dir = Files.createTempDirectory("hdrsplit")
    val sid = sampleId(0)
    val sb = new StringBuilder("temperature: 7.5\n")
    for (i <- 0 until 400) sb.append(f"filler$i%03d: $i\n")
    sb.append("temperature: 9.9\n") // duplicate, several splits later
    Files.writeString(dir.resolve(s"$sid.hdr"), sb.toString)
    val oldMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val oldCost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try {
      val nParts = spark.read.text(s"$dir/*.hdr").rdd.getNumPartitions
      assert(nParts >= 2, s"fixture did not split: $nParts partition(s)")
      val df = HdrSource.read(spark, s"$dir/*.hdr",
        stringKeys = Seq.empty, numericKeys = Seq("temperature"))
      val t = df.select("temperature").as[Double].collect()
      assert(t.toSeq == Seq(7.5), s"split ordering broke first-wins: $t")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", oldMax)
      spark.conf.set("spark.sql.files.openCostInBytes", oldCost)
    }
  }

  test("HDR reader never throws on arbitrary text and types requested keys") {
    val dir = Files.createTempDirectory("hdrfuzz")
    val rnd = new scala.util.Random(13L)
    for (b <- 0 until 20) {
      val sid = sampleId(b)
      val lines = (0 until rnd.nextInt(12)).map { _ =>
        rnd.nextInt(6) match {
          case 0 => "temperature: " + (rnd.nextDouble() * 30)
          case 1 => "runTime: " + rnd.nextInt(1200)
          case 2 => "no colon in this line at all"
          case 3 => "weird:key:with:colons: value"
          case 4 => "unicodeKey: åäö 字"
          case 5 => "emptyValue:"
        }
      }
      Files.writeString(dir.resolve(s"$sid.hdr"), lines.mkString("\n"))
    }
    // deterministic duplicate-key header: crashed map construction with
    // DUPLICATED_MAP_KEY before the round-10 first-wins fix
    Files.writeString(dir.resolve(s"${sampleId(30)}.hdr"),
      "temperature: 7.5\ntemperature: 9.9\nrunTime: 100\n")
    val df = HdrSource.read(spark, s"$dir/*.hdr",
      stringKeys = Seq("unicodeKey", "emptyValue", "absentKey"),
      numericKeys = Seq("temperature", "runTime"))
    val rows = df.collect() // must not throw
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("sample", "timestamp", "unicodeKey",
      "emptyValue", "absentKey", "temperature", "runTime"))
    // absent keys are null, numeric keys are double-typed or null
    assert(rows.forall(_.isNullAt(df.columns.indexOf("absentKey"))))
    // duplicate key: first occurrence wins
    val dup = df.filter($"sample" === sampleId(30)).collect().head
    assert(dup.getDouble(df.columns.indexOf("temperature")) == 7.5)
  }
}
