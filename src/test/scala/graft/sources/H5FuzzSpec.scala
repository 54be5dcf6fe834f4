package graft.sources

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import H5Source.{H5Num, H5Str}

/** Round-trip + byte-mutation fuzzing of the HDF5 reader (round-10
  * verdict task 3), mirroring MatFuzzSpec: generated files cover
  * contiguous int32/float64, chunked+deflate float32 matrices (single
  * and multi chunk, edge-overhang chunks), variable-length strings via
  * the global heap, and object-header continuation blocks; mutants must
  * decode or throw IllegalArgumentException (the reference consumes
  * these files at code/convert_h5_to_irfcb_format.R:38-66 — a silent
  * misdecode there corrupts classifier scores downstream).
  */
class H5FuzzSpec extends AnyFunSuite {

  private val dsGen: Gen[H5Fixture.Ds] = for {
    name <- FuzzGen.nameGen(5)
    kind <- Gen.chooseNum(0, 5)
    ds <- kind match {
      case 0 => for {
        n <- Gen.chooseNum(0, 16)
        vs <- Gen.listOfN(n, Gen.chooseNum(Int.MinValue, Int.MaxValue))
        split <- Gen.oneOf(true, false)
      } yield H5Fixture.I32(name, vs.toArray, splitHeader = split)
      case 1 => for {
        n <- Gen.chooseNum(0, 12)
        vs <- Gen.listOfN(n, Gen.chooseNum(-1e9, 1e9))
      } yield H5Fixture.F64(name, vs.toArray)
      case 2 => for {
        rows <- Gen.chooseNum(1, 6)
        cols <- Gen.chooseNum(1, 5)
        vs <- Gen.listOfN(rows * cols, Gen.chooseNum(-1e6, 1e6).map(_.toFloat))
        chunkRows <- Gen.oneOf(1, 2, 3, Int.MaxValue)
        shuffle <- Gen.oneOf(true, false) // h5py-default shuffle+deflate combo
        raw <- Gen.oneOf(true, false) // mask-skipped (incompressible) chunks
        fletch <- Gen.oneOf(true, false) // trailing per-chunk checksum
      } yield H5Fixture.F32Matrix(name, rows, cols, vs.toArray, chunkRows,
        shuffle, rawChunks = raw, fletcher32 = fletch && !raw)
      case 3 => for {
        n <- Gen.chooseNum(0, 5)
        vs <- Gen.listOfN(n,
          Gen.oneOf(Gen.const(""), Gen.const("åäö字"),
            Gen.listOfN(7, Gen.alphaNumChar).map(_.mkString)))
      } yield H5Fixture.VStr(name, vs.toArray)
      case 4 => for { // compact layout: data inline in the object header
        n <- Gen.chooseNum(0, 12)
        vs <- Gen.listOfN(n, Gen.chooseNum(Int.MinValue, Int.MaxValue))
      } yield H5Fixture.I32Compact(name, vs.toArray)
      case 5 => for { // fixed-length NUL-padded strings
        n <- Gen.chooseNum(0, 6)
        vs <- Gen.listOfN(n, Gen.oneOf(Gen.const(""),
          Gen.listOfN(5, Gen.alphaNumChar).map(_.mkString)))
      } yield H5Fixture.FStr(name, 12, vs.toArray)
    }
  } yield ds

  private def genFile(seed: Long): (Array[Byte], Seq[H5Fixture.Ds]) = {
    val nDs = 1 + (seed % 3).toInt
    val dss = (0 until nDs).map(i => FuzzGen.sample(dsGen, seed * 37 + i))
      .groupBy(_.name).map(_._2.head).toSeq
    (H5Fixture.write(dss), dss)
  }

  private def check(parsed: Map[String, H5Source.H5Value],
      ds: H5Fixture.Ds, ctx: String): Unit = ds match {
    case H5Fixture.I32(name, vs, _) =>
      parsed(name) match {
        case H5Num(dims, data) =>
          assert(dims == Seq(vs.length.toLong), s"$ctx $name dims")
          assert(data.toSeq == vs.map(_.toDouble).toSeq, s"$ctx $name values")
        case other => fail(s"$ctx $name: $other")
      }
    case H5Fixture.F64(name, vs) =>
      parsed(name) match {
        case H5Num(dims, data) =>
          assert(dims == Seq(vs.length.toLong), s"$ctx $name dims")
          assert(data.toSeq == vs.toSeq, s"$ctx $name values")
        case other => fail(s"$ctx $name: $other")
      }
    case H5Fixture.F32Matrix(name, rows, cols, vs, _, _, _, _, _, _) =>
      parsed(name) match {
        case H5Num(dims, data) =>
          assert(dims == Seq(rows.toLong, cols.toLong), s"$ctx $name dims")
          assert(data.toSeq == vs.map(_.toDouble).toSeq, s"$ctx $name values")
        case other => fail(s"$ctx $name: $other")
      }
    case H5Fixture.VStr(name, vs) =>
      parsed(name) match {
        case H5Str(dims, data) =>
          assert(dims == Seq(vs.length.toLong), s"$ctx $name dims")
          assert(data.toSeq == vs.toSeq, s"$ctx $name values")
        case other => fail(s"$ctx $name: $other")
      }
    case H5Fixture.I32Compact(name, vs) =>
      parsed(name) match {
        case H5Num(dims, data) =>
          assert(dims == Seq(vs.length.toLong), s"$ctx $name dims")
          assert(data.toSeq == vs.map(_.toDouble).toSeq, s"$ctx $name values")
        case other => fail(s"$ctx $name: $other")
      }
    case H5Fixture.FStr(name, _, vs) =>
      parsed(name) match {
        case H5Str(dims, data) =>
          assert(dims == Seq(vs.length.toLong), s"$ctx $name dims")
          assert(data.toSeq == vs.toSeq, s"$ctx $name NUL-truncated values")
        case other => fail(s"$ctx $name: $other")
      }
  }

  test("round-trip: 120 generated files parse back to the generated datasets") {
    for (seed <- 0 until 120) {
      val (bytes, dss) = genFile(seed.toLong)
      val parsed =
        try H5Source.parse(bytes)
        catch { case e: Throwable => fail(s"seed $seed: parse threw $e", e) }
      assert(parsed.keySet == dss.map(_.name).toSet, s"seed $seed: names")
      dss.foreach(check(parsed, _, s"seed $seed"))
    }
  }

  test("wrap-inducing dataspace dims reject via the contract exception, not AIOOBE") {
    // patch a valid chunked dataset's dataspace to claim dims [2, 2^62]:
    // the element-count product wraps a Long in ONE multiply step, so a
    // bare dims.product slips a negative/small total under the size cap
    // and the failure deferred to a raw AIOOBE in chunk reassembly
    // (round-12 ADVICE; guarded by the shared Dims.product helper)
    val rows = 2
    val cols = 3
    val bytes = H5Fixture.write(Seq(H5Fixture.F32Matrix(
      "evil", rows, cols, Array.tabulate(rows * cols)(_.toFloat), chunkRows = 1)))
    val pattern = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).put(2.toByte).put(new Array[Byte](6))
      .putLong(rows.toLong).putLong(cols.toLong).array()
    val hits = (0 to bytes.length - 24)
      .filter(i => pattern.indices.forall(j => bytes(i + j) == pattern(j)))
    assert(hits.size == 1, s"dataspace pattern matched at $hits")
    val patched = bytes.clone()
    val evil = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(2L).putLong(1L << 62).array()
    System.arraycopy(evil, 0, patched, hits.head + 8, 16)
    val e = intercept[IllegalArgumentException] { H5Source.parse(patched) }
    assert(e.getMessage.contains("overflows"), e.getMessage)
  }

  test("mutation: byte flips and truncations decode or throw IllegalArgumentException") {
    var parsed = 0
    var rejected = 0
    for (seed <- 0 until 40) {
      val (bytes, _) = genFile(seed.toLong)
      val rnd = new scala.util.Random(seed * 104729L)
      val mutants =
        (0 until 6).map { _ =>
          val m = bytes.clone()
          // past the 8-byte signature: the signature check is separately
          // covered and a flipped magic is the least interesting mutant
          val pos = 8 + rnd.nextInt(math.max(1, m.length - 8))
          m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
          m
        } ++
          Seq(bytes.take(97 + rnd.nextInt(math.max(1, bytes.length - 97))))
      mutants.foreach { m =>
        scala.util.Try(H5Source.parse(m)) match {
          case scala.util.Success(_) => parsed += 1
          case scala.util.Failure(_: IllegalArgumentException) => rejected += 1
          case scala.util.Failure(e) =>
            fail(s"seed $seed: non-contract exception $e", e)
        }
      }
    }
    assert(parsed > 0 && rejected > 0, s"parsed=$parsed rejected=$rejected")
  }

  test("corrupted fletcher32 checksum rejects loudly, never decodes damaged data") {
    // the checksum filter's whole purpose is detecting chunk damage —
    // the reader must surface the mismatch as the contract exception,
    // not return silently wrong floats
    val vals = Array.tabulate(6)(i => i * 1.5f)
    val bad = H5Fixture.write(Seq(
      H5Fixture.F32Matrix("scores", 3, 2, vals, chunkRows = 2,
        fletcher32 = true, corruptFletcher = true)))
    val e = intercept[IllegalArgumentException] { H5Source.parse(bad) }
    assert(e.getMessage.contains("fletcher32 checksum mismatch"), e.getMessage)
    // the same fixture with an honest checksum parses (non-vacuous)
    val good = H5Fixture.write(Seq(
      H5Fixture.F32Matrix("scores", 3, 2, vals, chunkRows = 2,
        fletcher32 = true)))
    val H5Num(_, data) = H5Source.parse(good)("scores"): @unchecked
    assert(data.map(_.toFloat).sameElements(vals))
  }
}
