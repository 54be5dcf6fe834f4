package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip + byte-mutation fuzzing of the Shapefile/dBASE/WKB readers
  * (round-10 extension of the fuzz family): generated polygon files must
  * parse back ring-exactly; mutants must decode or throw
  * IllegalArgumentException — the mutation corpus is what exposed the
  * infinite loop a negative record content length caused in `readShp`
  * and the unbounded record loop a corrupted dBASE count caused in
  * `readDbf` (both now hard requires).
  */
class ShapefileFuzzSpec extends AnyFunSuite {

  private val ringGen: Gen[Seq[(Double, Double)]] = for {
    n <- Gen.chooseNum(3, 8)
    pts <- Gen.listOfN(n, Gen.zip(
      Gen.chooseNum(-180.0, 180.0), Gen.chooseNum(-90.0, 90.0)))
  } yield pts :+ pts.head // closed ring

  private val recordGen: Gen[Seq[Seq[(Double, Double)]]] = for {
    nRings <- Gen.chooseNum(1, 3)
    rings <- Gen.listOfN(nRings, ringGen)
  } yield rings

  test("round-trip: 100 generated shapefiles parse back ring-exactly") {
    for (seed <- 0 until 100) {
      val records = (0 until 1 + (seed % 4))
        .map(i => FuzzGen.sample(recordGen, seed * 19 + i))
      val rings = ShapefileSource.readShp(ShapefileFixture.writeShp(records))
      val expected = records.zipWithIndex.flatMap { case (rs, rec) =>
        rs.zipWithIndex.map { case (r, part) => (rec + 1, part, r) }
      }
      assert(rings.map(r => (r.recordNo, r.partNo, r.points)) == expected,
        s"seed $seed")
    }
  }

  test("round-trip: generated dBASE tables and WKB polygons parse back exactly") {
    for (seed <- 0 until 100) {
      val rnd = new scala.util.Random(seed * 31L)
      val fields = (0 until 1 + rnd.nextInt(3)).map(i =>
        (s"F${i}X${rnd.nextInt(90)}", 4 + rnd.nextInt(12)))
      val rows = (0 until rnd.nextInt(5)).map(_ =>
        fields.map { case (_, len) =>
          (0 until rnd.nextInt(len)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        })
      val parsed = ShapefileSource.readDbf(
        ShapefileFixture.writeDbf(fields, rows))
      assert(parsed.size == rows.size, s"seed $seed rows")
      parsed.zip(rows).foreach { case (m, r) =>
        fields.zip(r).foreach { case ((name, _), v) =>
          assert(m(name) == v, s"seed $seed field $name")
        }
      }
      val rings = (0 until 1 + rnd.nextInt(3)).map(_ => FuzzGen.sample(ringGen, seed))
      val order = if (rnd.nextBoolean()) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
      val wkbRings = ShapefileSource.readWkbPolygon(
        ShapefileFixture.writeWkb(rings, order))
      assert(wkbRings == rings, s"seed $seed wkb")
    }
  }

  test("mutation: byte flips and truncations decode or throw IllegalArgumentException") {
    var parsed = 0
    var rejected = 0
    for (seed <- 0 until 40) {
      val records = (0 until 1 + (seed % 3)).map(i => FuzzGen.sample(recordGen, seed * 7 + i))
      val shp = ShapefileFixture.writeShp(records)
      val dbf = ShapefileFixture.writeDbf(Seq(("BASIN", 12)),
        records.indices.map(i => Seq(s"basin$i")))
      val wkb = ShapefileFixture.writeWkb(records.head, ByteOrder.LITTLE_ENDIAN)
      val rnd = new scala.util.Random(seed * 12289L)
      def mutate(bytes: Array[Byte], skip: Int): Seq[Array[Byte]] =
        (0 until 5).map { _ =>
          val m = bytes.clone()
          val pos = skip + rnd.nextInt(math.max(1, m.length - skip))
          m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
          m
        } :+ bytes.take(skip + rnd.nextInt(math.max(1, bytes.length - skip)))
      def probe(run: => Any): Unit =
        scala.util.Try(run) match {
          case scala.util.Success(_) => parsed += 1
          case scala.util.Failure(_: IllegalArgumentException) => rejected += 1
          case scala.util.Failure(e) =>
            fail(s"seed $seed: non-contract exception $e", e)
        }
      mutate(shp, 4).foreach(m => probe(ShapefileSource.readShp(m)))
      mutate(dbf, 0).foreach(m => probe(ShapefileSource.readDbf(m)))
      mutate(wkb, 0).foreach(m => probe(ShapefileSource.readWkbPolygon(m)))
    }
    assert(parsed > 0 && rejected > 0, s"parsed=$parsed rejected=$rejected")
  }

  test("the two historical hangs are now loud rejections") {
    // negative .shp record content length: cursor would advance 0 bytes
    val shp = ShapefileFixture.writeShp(Seq(FuzzGen.sample(recordGen, 1L)))
    val b = ByteBuffer.wrap(shp).order(ByteOrder.BIG_ENDIAN)
    b.putInt(104, -4) // record 1 content length (16-bit words)
    val e1 = intercept[IllegalArgumentException](ShapefileSource.readShp(shp))
    assert(e1.getMessage.contains("content length"))
    // dBASE record count far past the file: 2-billion-iteration loop
    val dbf = ShapefileFixture.writeDbf(Seq(("A", 4)), Seq(Seq("x")))
    val d = ByteBuffer.wrap(dbf).order(ByteOrder.LITTLE_ENDIAN)
    d.putInt(4, Int.MaxValue)
    val e2 = intercept[IllegalArgumentException](ShapefileSource.readDbf(dbf))
    assert(e2.getMessage.contains("past file end"))
  }
}
