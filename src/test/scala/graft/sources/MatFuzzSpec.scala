package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Deflater

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import MatSource.{MatCell, MatNum, MatStr, MatValue}

/** Round-trip + byte-mutation fuzzing of the MAT-5 reader (round-10
  * verdict task 3): the r8 hardening commits found silent-corruption
  * bugs by inspection; this makes the search systematic.
  *
  *  - Round-trip: ≥100 generated files over the reader's whole surface
  *    (all eight numeric mi-types, single- and multi-row char matrices,
  *    UTF-8 strings, cells of strings, nested cells, zlib-compressed
  *    top-level elements) must parse back to exactly the generated
  *    values.
  *  - Mutation: random byte flips and truncations of valid files must
  *    either parse (flips in payload bytes ARE data) or throw the one
  *    contract exception type, IllegalArgumentException — never a raw
  *    buffer/index/decode exception, never a hang.
  *
  * Deterministic: scalacheck generators driven by fixed seeds (the
  * FunctionsSpec pattern), so a failure reproduces by seed index.
  */
object MatFuzzSpec {
  /** Values the v7.3 writer serializes: double matrices (incl. empty),
    * char vectors (incl. empty and non-ASCII BMP), cellstr, and a
    * nested cell — every shape [[MatSink.write73]] emits. Shared with
    * MatSinkCrossCheckSpec so the independent Python reader sweeps the
    * same corpus the Scala round-trip pins.
    */
  val v73ValueGen: Gen[MatValue] = {
    val numGen: Gen[MatValue] = for {
      rows <- Gen.chooseNum(0, 4)
      cols <- Gen.chooseNum(0, 4)
      vs <- Gen.listOfN(rows * cols, Gen.chooseNum(-1e12, 1e12))
    } yield MatNum(Seq(rows, cols), vs.toArray)
    val strGen: Gen[MatValue] = Gen.oneOf(
      Gen.const(MatStr("")),
      Gen.listOfN(7, Gen.oneOf('a', 'Z', '0', 'å', '字', ' '))
        .map(cs => MatStr(cs.mkString)))
    val cellStrGen: Gen[MatValue] = for {
      n <- Gen.chooseNum(0, 5)
      ss <- Gen.listOfN(n, Gen.listOfN(5, Gen.alphaNumChar).map(_.mkString))
    } yield MatCell(Seq(n, 1), ss.map(MatStr(_): MatValue))
    val nestedGen: Gen[MatValue] = for {
      num <- numGen
      inner <- cellStrGen
    } yield MatCell(Seq(1, 2), Seq(num, inner))
    Gen.oneOf(numGen, strGen, cellStrGen, nestedGen)
  }

  def sampleV73Value(seed: Long): MatValue = FuzzGen.sample(v73ValueGen, seed)
}

class MatFuzzSpec extends AnyFunSuite {

  // --- generators -----------------------------------------------------------

  /** (miType, payload bytes, expected doubles) for every numeric type
    * the reader decodes.
    */
  private val numericGen: Gen[(Int, Array[Byte], Array[Double])] = for {
    tpe <- Gen.oneOf(1, 2, 3, 4, 5, 6, 7, 9)
    n <- Gen.chooseNum(0, 12)
    longs <- Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue))
  } yield {
    val b = ByteBuffer.allocate(n * 8).order(ByteOrder.LITTLE_ENDIAN)
    val expected = longs.map { l =>
      tpe match {
        case 1 => val v = l.toByte; b.put(v); v.toDouble
        case 2 => val v = l.toByte; b.put(v); (v & 0xff).toDouble
        case 3 => val v = l.toShort; b.putShort(v); v.toDouble
        case 4 => val v = l.toShort; b.putShort(v); (v & 0xffff).toDouble
        case 5 => val v = l.toInt; b.putInt(v); v.toDouble
        case 6 => val v = l.toInt; b.putInt(v); (v.toLong & 0xffffffffL).toDouble
        case 7 => val v = (l % 10000).toFloat; b.putFloat(v); v.toDouble
        case 9 => val v = l.toDouble / 7.0; b.putDouble(v); v
      }
    }.toArray
    val width = tpe match {
      case 1 | 2 => 1
      case 3 | 4 => 2
      case 5 | 6 | 7 => 4
      case 9 => 8
    }
    (tpe, b.array().take(n * width), expected)
  }

  /** One variable: (bytes of the top-level element, name, expected). */
  private val varGen: Gen[(String, Array[Byte], MatValue)] = for {
    name <- FuzzGen.nameGen(5)
    kind <- Gen.chooseNum(0, 4)
    v <- kind match {
      case 0 => // numeric matrix, any mi type, stored as a 1 x n row
        numericGen.map { case (tpe, payload, expected) =>
          val dims = Seq(1, expected.length)
          (name, MatFixture.matrix(name, 6, dims, payload, tpe),
            MatNum(dims, expected): MatValue)
        }
      case 1 => // single-row char, UTF-8 (incl. non-ASCII)
        Gen.listOfN(6, Gen.oneOf('a', 'Z', '0', 'å', 'ö', '字', ' ')).map { cs =>
          val s = cs.mkString
          (name, MatFixture.charMatrix(name, s), MatStr(s): MatValue)
        }
      case 2 => // multi-row ASCII char matrix, stored column-major
        for {
          rows <- Gen.chooseNum(2, 4)
          cols <- Gen.chooseNum(1, 5)
          cs <- Gen.listOfN(rows * cols, Gen.alphaNumChar)
        } yield {
          // cs is the row-major expectation; write it column-major
          val colMajor = Array.tabulate(rows * cols) { k =>
            val r = k % rows; val c = k / rows
            cs(r * cols + c).toByte
          }
          (name,
            MatFixture.matrix(name, 4, Seq(rows, cols), colMajor, 16),
            MatStr(cs.mkString): MatValue)
        }
      case 3 => // cell of strings
        Gen.listOfN(4, Gen.listOfN(5, Gen.alphaNumChar).map(_.mkString)).map { ss =>
          (name, MatFixture.cellOfStrings(name, ss),
            MatCell(Seq(ss.length, 1),
              ss.map(MatStr(_): MatValue)): MatValue)
        }
      case 4 => // nested cell: cell holding a numeric matrix and a cell
        numericGen.map { case (tpe, payload, expected) =>
          val innerNum = MatFixture.matrix("", 6, Seq(1, expected.length), payload, tpe)
          val innerCell = MatFixture.cellOfStrings("", Seq("ab", "cd"))
          val outer = MatFixture.matrix(name, 1, Seq(2, 1), Array.empty, 0,
            cells = Seq(MatFixture.stripTag(innerNum), MatFixture.stripTag(innerCell)))
          (name, outer,
            MatCell(Seq(2, 1), Seq(
              MatNum(Seq(1, expected.length), expected),
              MatCell(Seq(2, 1), Seq(MatStr("ab"), MatStr("cd"))))): MatValue)
        }
    }
  } yield v

  /** A compressed top-level element is the inner element deflated, with
    * NO 8-byte padding after the tag (matching what MATLAB writes and
    * what the reader expects).
    */
  private def compress(inner: Array[Byte]): Array[Byte] = {
    val deflater = new Deflater()
    deflater.setInput(inner)
    deflater.finish()
    val buf = new Array[Byte](inner.length + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val out = ByteBuffer.allocate(8 + n).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(15).putInt(n).put(buf, 0, n)
    out.array()
  }

  private def assertEq(actual: MatValue, expected: MatValue, ctx: String): Unit =
    (actual, expected) match {
      case (MatNum(ad, av), MatNum(ed, ev)) =>
        assert(ad == ed, s"$ctx dims")
        assert(av.length == ev.length, s"$ctx length")
        av.zip(ev).zipWithIndex.foreach { case ((a, e), i) =>
          assert(a == e || (a.isNaN && e.isNaN), s"$ctx[$i]: $a != $e")
        }
      case (MatStr(a), MatStr(e)) => assert(a == e, ctx)
      case (MatCell(ad, ai), MatCell(ed, ei)) =>
        assert(ad == ed && ai.length == ei.length, s"$ctx cell shape")
        ai.zip(ei).zipWithIndex.foreach { case ((a, e), i) =>
          assertEq(a, e, s"$ctx.item($i)")
        }
      case _ => fail(s"$ctx: kind mismatch $actual vs $expected")
    }

  private def genFile(seed: Long): (Array[Byte], Map[String, MatValue]) = {
    val nVars = 1 + (seed % 4).toInt
    val vars = (0 until nVars).map(i => FuzzGen.sample(varGen, seed * 31 + i))
      .groupBy(_._1).map(_._2.head).toSeq // unique names
    val rnd = new scala.util.Random(seed)
    val elements = vars.map { case (_, bytes, _) =>
      if (rnd.nextBoolean()) compress(bytes) else bytes
    }
    (MatFixture.matFile(elements: _*), vars.map(v => v._1 -> v._3).toMap)
  }

  test("round-trip: 120 generated files parse back to the generated values") {
    for (seed <- 0 until 120) {
      val (bytes, expected) = genFile(seed.toLong)
      val parsed =
        try MatSource.parse(bytes)
        catch { case e: Throwable => fail(s"seed $seed: parse threw $e", e) }
      assert(parsed.keySet == expected.keySet, s"seed $seed: variable names")
      expected.foreach { case (name, exp) =>
        assertEq(parsed(name), exp, s"seed $seed var $name")
      }
    }
  }

  test("mutation: byte flips and truncations decode or throw IllegalArgumentException") {
    var parsed = 0
    var rejected = 0
    for (seed <- 0 until 40) {
      val (bytes, _) = genFile(seed.toLong)
      val rnd = new scala.util.Random(seed * 7919L)
      val mutants =
        // 5 random single-byte flips past the 128-byte header
        (0 until 5).map { _ =>
          val m = bytes.clone()
          val pos = 128 + rnd.nextInt(math.max(1, m.length - 128))
          m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
          m
        } ++
          // 2 truncations (mid-body and just past the header)
          Seq(bytes.take(128 + rnd.nextInt(math.max(1, bytes.length - 128))),
            bytes.take(130))
      mutants.foreach { m =>
        scala.util.Try(MatSource.parse(m)) match {
          case scala.util.Success(_) => parsed += 1
          case scala.util.Failure(_: IllegalArgumentException) => rejected += 1
          case scala.util.Failure(e) =>
            fail(s"seed $seed: non-contract exception $e", e)
        }
      }
    }
    // both outcomes must actually occur, or the corpus isn't probing
    assert(parsed > 0 && rejected > 0, s"parsed=$parsed rejected=$rejected")
  }

  test("wrap-inducing dims reject via the contract exception, not AIOOBE") {
    // dims whose element-count product overflows a Long in one multiply
    // step ([MaxInt, MaxInt, MaxInt] ~ 2^93): a bare dims.product wraps
    // and a wrapped "claimed" count slips under the bytes-available
    // cross-check, deferring the failure to a raw AIOOBE in a consumer
    // (round-12 ADVICE; guarded by the shared Dims.product helper)
    val evil = MatFixture.matrix("evil", 6,
      Seq(Int.MaxValue, Int.MaxValue, Int.MaxValue),
      MatFixture.doubles(Seq(1.0)), 9)
    val e = intercept[IllegalArgumentException] {
      MatSource.parse(MatFixture.matFile(evil))
    }
    assert(e.getMessage.contains("overflows"), e.getMessage)
  }

  test("deeply nested mxCELL rejects via the contract exception, not StackOverflowError") {
    // a hostile ~KB file of 200-deep nested cells: unbounded recursion
    // would throw StackOverflowError — an Error that escapes the
    // RuntimeException→IllegalArgumentException wrapper (round-11 advice)
    var cell = MatFixture.cellOfStrings("", Seq("x"))
    for (_ <- 0 until 200)
      cell = MatFixture.matrix("", 1, Seq(1, 1), Array.empty, 0,
        cells = Seq(MatFixture.stripTag(cell)))
    val named = MatFixture.matrix("deep", 1, Seq(1, 1), Array.empty, 0,
      cells = Seq(MatFixture.stripTag(cell)))
    val e = intercept[IllegalArgumentException] {
      MatSource.parse(MatFixture.matFile(named))
    }
    assert(e.getMessage.contains("nesting deeper"))
    // and the legitimate nesting the corpus uses (2 levels) still parses
    val ok = MatFixture.matrix("ok", 1, Seq(1, 1), Array.empty, 0,
      cells = Seq(MatFixture.stripTag(MatFixture.cellOfStrings("", Seq("ab")))))
    assert(MatSource.parse(MatFixture.matFile(ok)).contains("ok"))
  }

  test("mxSTRUCT/mxOBJECT/mxSPARSE/mxFUNCTION/mxOPAQUE reject by class name, not mis-decode") {
    // the round-14 verdict's finding: the old numeric catch-all decoded
    // a 1×1 struct's field-name-length element (miINT32, value 32) as
    // the NUMBER 32 — it even passed the dims/length cross-check. The
    // byte layout below mimics exactly that struct prefix.
    val fieldNameLen = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(32); b.array()
    }
    val cases = Seq(
      2 -> "mxSTRUCT_CLASS", 3 -> "mxOBJECT_CLASS", 5 -> "mxSPARSE_CLASS",
      16 -> "mxFUNCTION_CLASS", 17 -> "mxOPAQUE_CLASS", 42 -> "unknown mxClass 42")
    cases.foreach { case (clazz, expected) =>
      val bytes = MatFixture.matFile(
        MatFixture.matrix("opts", clazz, Seq(1, 1), fieldNameLen, 5))
      val e = intercept[IllegalArgumentException](MatSource.parse(bytes))
      assert(e.getMessage.contains(expected), s"class $clazz: ${e.getMessage}")
      assert(e.getMessage.contains("opts"), e.getMessage)
    }
    // a struct INSIDE a cell rejects the same way (the recursive path)
    val structInCell = MatFixture.matrix("wrap", 1, Seq(1, 1), Array.empty, 0,
      cells = Seq(MatFixture.stripTag(
        MatFixture.matrix("", 2, Seq(1, 1), fieldNameLen, 5))))
    val e = intercept[IllegalArgumentException] {
      MatSource.parse(MatFixture.matFile(structInCell))
    }
    assert(e.getMessage.contains("mxSTRUCT_CLASS"), e.getMessage)
  }

  test("complex numeric variables reject loudly instead of dropping the imaginary part") {
    // a complex matrix carries TWO data elements (pr then pi); the old
    // catch-all decoded pr and silently ignored pi AND the flag bit
    val pr = MatFixture.doubles(Seq(1.5, 2.5))
    val pi = MatFixture.doubles(Seq(0.5, -0.5))
    val body = new java.io.ByteArrayOutputStream()
    // rebuild the matrix body with both data elements and the complex bit
    val withFlag = MatFixture.matrix("z", 6, Seq(1, 2), pr, 9, flagBits = 0x08)
    body.write(MatFixture.stripTag(withFlag))
    body.write(MatFixture.element(9, pi))
    val full = MatFixture.element(14, body.toByteArray)
    val e = intercept[IllegalArgumentException] {
      MatSource.parse(MatFixture.matFile(full))
    }
    assert(e.getMessage.contains("complex"), e.getMessage)
    assert(e.getMessage.contains("z"), e.getMessage)
    // control: the same bytes WITHOUT the complex bit parse as the real part
    // (the trailing pi element is past the declared dims and ignored by
    // the >= length check — MATLAB never writes that shape uncomplexed)
    val real = MatSource.parse(MatFixture.matFile(
      MatFixture.matrix("z", 6, Seq(1, 2), pr, 9)))
    assertEq(real("z"), MatNum(Seq(1, 2), Array(1.5, 2.5)), "control")
  }

  test("corrupt cell items and corrupt variables reject loudly, never read as empty strings (round-15)") {
    // a cell item whose inner framing is broken used to substitute
    // MatStr("") — class2use silently emitted "" as a class name while
    // the count cross-check passed
    val corruptItem = MatFixture.matrix("wrap", 1, Seq(1, 1), Array.empty, 0,
      cells = Seq(Array[Byte](1, 2, 3, 4))) // 4 bytes: no element header fits
    val e1 = intercept[IllegalArgumentException] {
      MatSource.parse(MatFixture.matFile(corruptItem))
    }
    assert(e1.getMessage.contains("corrupt item"), e1.getMessage)
    // a top-level variable with broken INNER framing used to drop
    // silently ("TBscores missing", zero rows, no error)
    val corruptVar = MatFixture.element(14, Array[Byte](1, 2, 3, 4))
    val e2 = intercept[IllegalArgumentException] {
      MatSource.parse(MatFixture.matFile(corruptVar))
    }
    assert(e2.getMessage.contains("truncated flags"), e2.getMessage)
    // a compressed element wrapping a non-miMATRIX inner element too
    val deflater = new Deflater()
    val inner = MatFixture.element(5, Array[Byte](1, 0, 0, 0)) // miINT32, not miMATRIX
    deflater.setInput(inner); deflater.finish()
    val zbuf = new Array[Byte](inner.length + 64)
    val zn = deflater.deflate(zbuf); deflater.end()
    val z = ByteBuffer.allocate(8 + zn).order(ByteOrder.LITTLE_ENDIAN)
    z.putInt(15).putInt(zn).put(zbuf, 0, zn)
    val e3 = intercept[IllegalArgumentException] {
      MatSource.parse(MatFixture.matFile(z.array()))
    }
    assert(e3.getMessage.contains("not miMATRIX"), e3.getMessage)
  }

  test("miUINT64 values past 2^63 decode positive, not wrapped negative (round-15)") {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.putLong(-1L) // unsigned: 2^64 − 1
    b.putLong(42L)
    val v = MatFixture.matrix("u", 6, Seq(1, 2), b.array(), 13)
    val parsed = MatSource.parse(MatFixture.matFile(v))("u")
      .asInstanceOf[MatNum].data
    assert(parsed(0) == 1.8446744073709552E19, parsed(0))
    assert(parsed(1) == 42.0)
  }

  // --- v7.3 writer-generated corpus (round-14: write-side symmetry) ---------

  private def v73ValueGen: Gen[MatValue] = MatFuzzSpec.v73ValueGen

  private def v73File(seed: Long): (Array[Byte], Seq[(String, MatValue)]) = {
    val nVars = 1 + (seed % 3).toInt
    val vars = (0 until nVars).map { i =>
      (FuzzGen.sample(FuzzGen.nameGen(5), seed * 41 + i),
        FuzzGen.sample(v73ValueGen, seed * 43 + i))
    }.groupBy(_._1).map(_._2.head).toSeq
    (MatSink.write73(vars), vars)
  }

  test("v7.3 write→read round-trip: 120 writer-generated files parse back exactly") {
    // the writer closes the round-13 symmetry gap: the fuzz corpus is
    // now generated THROUGH MatSink.write73 (real /#refs# cellstr
    // idiom, MATLAB_class/MATLAB_empty typing) instead of hand-built
    // fixtures
    for (seed <- 1 to 120) {
      val (bytes, vars) = v73File(seed.toLong)
      val parsed = MatSource.parse(bytes)
      assert(parsed.keySet == vars.map(_._1).toSet, s"seed $seed keys")
      vars.foreach { case (n, v) => assertEq(parsed(n), v, s"seed $seed '$n'") }
    }
  }

  test("v7.3 writer handles a realistic 300-entry class2use cellstr (round-14 capacity fix)") {
    // the original capacity budget (64 B/value) crashed at ~140 typical
    // class names — exactly the class-list shape the writer exists for
    val classes = (1 to 300).map(i => f"Mesodinium_rubrum_$i%03d")
    val vars = Seq("class2use" ->
      (MatCell(Seq(classes.size, 1), classes.map(MatStr(_): MatValue)): MatValue))
    val parsed = MatSource.parse(MatSink.write73(vars))
    assertEq(parsed("class2use"), vars.head._2, "class2use")
    // name-collision and duplicate-name guards (silent variable loss)
    val e1 = intercept[IllegalArgumentException] {
      MatSink.write73(Seq("#refs#" -> MatStr("x")))
    }
    assert(e1.getMessage.contains("#refs#"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      MatSink.write73(Seq("a" -> MatStr("x"), "a" -> MatStr("y")))
    }
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
  }

  test("v7.3 writer rejects >32767 group entries loudly (SNOD count is a 2-byte field)") {
    // the 1 GiB capacity gate admits ~1M cell items, so an unbounded
    // .toShort would silently wrap and emit a corrupt file (round-14
    // ADVICE); a 32768-item cellstr puts 32768 targets in /#refs#
    val items = Seq.fill(32768)(MatStr("x"): MatValue)
    val e = intercept[IllegalArgumentException] {
      MatSink.write73(Seq("c" -> MatCell(Seq(items.size, 1), items)))
    }
    assert(e.getMessage.contains("32767"), e.getMessage)
    // control just under a smaller shape still round-trips (the 300-entry
    // test above covers the realistic scale)
  }

  test("v7.3 mutation: byte flips and truncations decode or throw IllegalArgumentException") {
    var parsed = 0
    var rejected = 0
    for (seed <- 1 to 40) {
      val (bytes, _) = v73File(seed.toLong)
      val rnd = new scala.util.Random(seed * 977L)
      val mutants =
        (0 until 12).map { _ =>
          val m = bytes.clone()
          // past the MAT userblock + HDF5 signature: those layers'
          // rejects are separately covered
          val pos = 520 + rnd.nextInt(math.max(1, m.length - 520))
          m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
          m
        } ++
          Seq(bytes.take(609 + rnd.nextInt(math.max(1, bytes.length - 609))))
      mutants.foreach { m =>
        scala.util.Try(MatSource.parse(m)) match {
          case scala.util.Success(_) => parsed += 1
          case scala.util.Failure(_: IllegalArgumentException) => rejected += 1
          case scala.util.Failure(e) =>
            fail(s"seed $seed: non-contract exception $e", e)
        }
      }
    }
    assert(parsed > 0 && rejected > 0, s"parsed=$parsed rejected=$rejected")
  }

  test("v7.3 cellstr reference-chain mutations reject via the contract exception") {
    def refCell(targets: Seq[String]): Array[Byte] =
      MatFixture.mat73File(H5Fixture.write(Seq(
        H5Fixture.Group("#refs#", Seq(
          H5Fixture.U16Attr("a", Seq(2L, 1L), Array('o', 'k'), "char"))),
        H5Fixture.RefArray("classes", Seq(1L, targets.length.toLong), targets))))
    // the healthy control parses (guards against vacuous rejects below)
    assert(MatSource.parse(refCell(Seq("#refs#/a"))) ==
      Map("classes" -> MatSource.MatCell(Seq(1, 1), Seq(MatSource.MatStr("ok")))))
    // dangling reference: an address past EOF
    val e1 = intercept[IllegalArgumentException] {
      MatSource.parse(refCell(Seq("#refs#/a", "<dangling>")))
    }
    assert(e1.getMessage.contains("dangling"), e1.getMessage)
    // null reference (address 0 is the superblock, never a header)
    val e2 = intercept[IllegalArgumentException] {
      MatSource.parse(refCell(Seq("<zero>")))
    }
    assert(e2.getMessage.contains("dangling"), e2.getMessage)
    // cyclic reference: the cell dataset references itself — the depth
    // cap must fire, not a StackOverflowError
    val e3 = intercept[IllegalArgumentException] {
      MatSource.parse(refCell(Seq("<self>")))
    }
    assert(e3.getMessage.contains("cyclic"), e3.getMessage)
    // wrong-class target: a reference at the /#refs# GROUP header — a
    // cell element must be a dataset; silently skipping it would shift
    // every later element's index
    val e4 = intercept[IllegalArgumentException] {
      MatSource.parse(refCell(Seq("#refs#")))
    }
    assert(e4.getMessage.contains("not a dataset"), e4.getMessage)
  }
}
