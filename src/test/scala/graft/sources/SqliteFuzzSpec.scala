package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip + byte-mutation fuzzing of the SQLite reader (round-10
  * verdict task 3): generated databases cover all integer serial
  * widths, floats, unicode text, NULLs, quoted identifiers with spaces,
  * parenthesised types (`DECIMAL(10,2)`), inline CHECK constraints,
  * table-level constraint rows, the INTEGER PRIMARY KEY rowid alias,
  * multi-page (interior + leaf) B-trees, and (round-11) chained
  * overflow pages — round-tripped across lengths and chain depths,
  * with truncated/corrupt chains pinned to the loud-reject contract
  * (reference consumption: code/ifcb_delivery_data_to_shark.R:236-243).
  */
class SqliteFuzzSpec extends AnyFunSuite {

  /** One column: (ddl fragment, clean name, value generator). */
  private val colGen: Gen[(String, String, Gen[Any])] = for {
    base <- FuzzGen.nameGen(4)
    style <- Gen.chooseNum(0, 5)
  } yield style match {
    case 0 => (s"$base TEXT", base,
      Gen.oneOf(Gen.const(null), Gen.const("åäö 字"),
        Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString)): Gen[Any])
    case 1 => // all integer serial widths incl. the 3- and 6-byte ones
      (s"$base INTEGER", base,
        Gen.oneOf(0L, 1L, -1L, 127L, -128L, 32000L, 8000000L, -8000000L,
          3000000000L, 140000000000000L, Long.MaxValue, Long.MinValue): Gen[Any])
    case 2 => (s"$base REAL", base,
      Gen.chooseNum(-1e9, 1e9).map(d => d: Any))
    case 3 => // parenthesised type: the comma must not split the DDL
      (s"$base DECIMAL(10,2)", base, Gen.chooseNum(-1e4, 1e4).map(d => d: Any))
    case 4 => // quoted identifier with a space
      (s""""$base x" TEXT""", s"$base x",
        Gen.listOfN(4, Gen.alphaNumChar).map(_.mkString): Gen[Any])
    case 5 => // inline CHECK with nested commas
      (s"$base INTEGER CHECK($base IN (1,2,3))", base,
        Gen.oneOf(1L, 2L, 3L): Gen[Any])
  }

  private def genDb(seed: Long): (Array[Byte], String, Seq[String], Seq[Seq[Any]]) = {
    val table = FuzzGen.sample(FuzzGen.nameGen(4), seed * 17)
    val nCols = 1 + (seed % 5).toInt
    val cols = (0 until nCols).map(i => FuzzGen.sample(colGen, seed * 53 + i))
      .groupBy(_._2).map(_._2.head).toSeq
    val nRows = (seed % 9).toInt // >= 4 exercises the interior-page path
    val rows = (0 until nRows).map { r =>
      cols.map { case (_, _, g) => FuzzGen.sample(g, seed * 101 + r * 13) }
    }
    // one table-level constraint row in every third schema: parsed
    // columns must skip it without shifting the data columns
    val ddlCols = cols.map(_._1) ++
      (if (seed % 3 == 0 && cols.size >= 2)
        Seq(s"PRIMARY KEY (${cols.head._2.split(" ").head})")
      else Nil)
    val bytes = SqliteFixture.write(table,
      ddlCols.map(c => (c, "")).map { case (c, _) =>
        // SqliteFixture joins name+type with a space; hand it the full
        // fragment as the "name" and an empty type
        (c, "")
      }, rows)
    (bytes, table, cols.map(_._2), rows)
  }

  private def norm(v: Any): Any = v match {
    case d: Double => math.round(d * 1e6)
    case b: Array[Byte] => b.toSeq
    case x => x
  }

  test("round-trip: 120 generated databases read back the generated rows") {
    for (seed <- 0 until 120) {
      val (bytes, table, colNames, rows) = genDb(seed.toLong)
      val t =
        try SqliteSource.readTable(bytes, table)
        catch { case e: Throwable => fail(s"seed $seed: readTable threw $e", e) }
      assert(t.columns == colNames, s"seed $seed: columns ${t.columns} vs $colNames")
      assert(t.rows.size == rows.size, s"seed $seed: row count")
      // fixture splits >= 4 rows over two leaves under an interior page;
      // within-page order is preserved and pages are walked in order
      t.rows.zip(rows).zipWithIndex.foreach { case ((a, e), i) =>
        assert(a.map(norm) == e.map(norm), s"seed $seed row $i: $a vs $e")
      }
    }
  }

  test("INTEGER PRIMARY KEY rowid alias substitutes the cell rowid for stored NULL") {
    // real SQLite stores NULL in the record for the alias column; keep
    // the table single-page so fixture rowids are 1..n in file order
    val bytes = SqliteFixture.write("obs",
      Seq(("id", "INTEGER PRIMARY KEY"), ("val", "TEXT")),
      Seq(Seq(null, "a"), Seq(null, "b"), Seq(null, "c")))
    val t = SqliteSource.readTable(bytes, "obs")
    assert(t.columns == Seq("id", "val"))
    assert(t.rows == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
  }

  test("overflow chains round-trip across lengths and chain depths") {
    // round-11: spilled payloads decode instead of rejecting. Lengths
    // sweep both local-prefix branches (K <= X keeps K bytes local,
    // K > X keeps only M) and chains of 1..5 overflow pages; one row
    // per db so the leaf page never overflows its own capacity
    val rnd = new scala.util.Random(29L)
    for (seed <- 0 until 40) {
      val len = 4200 + rnd.nextInt(16000)
      val s = {
        val sb = new StringBuilder(len)
        while (sb.length < len) sb.append(('a' + rnd.nextInt(26)).toChar)
        sb.toString
      }
      val bytes = SqliteFixture.write("docs",
        Seq(("id", "INTEGER"), ("body", "TEXT")), Seq(Seq(seed.toLong, s)))
      val t =
        try SqliteSource.readTable(bytes, "docs")
        catch { case e: Throwable => fail(s"seed $seed len $len: threw $e", e) }
      assert(t.rows == Seq(Seq(seed.toLong, s)), s"seed $seed len $len")
    }
  }

  test("a truncated or corrupt overflow chain rejects loudly") {
    // a cell claiming a 5000-byte payload with NO overflow pages behind
    // it: the local prefix + 4-byte pointer run past the file, or the
    // chain ends before the payload is complete — either way the
    // contract exception must fire, never a silent short read
    val valid = SqliteFixture.write("t", Seq(("a", "TEXT")), Seq(Seq("x")))
    val page1 = valid.take(4096)
    val page2 = {
      val page = ByteBuffer.allocate(4096).order(ByteOrder.BIG_ENDIAN)
      val cell = Array[Byte](
        0xa7.toByte, 0x08, // varint 5000 payload length
        0x01) ++ new Array[Byte](200) // rowid 1 + a payload prefix
      val contentStart = 4096 - cell.length
      page.position(contentStart)
      page.put(cell)
      page.position(0)
      page.put(0x0d.toByte) // leaf table
      page.putShort(0.toShort)
      page.putShort(1.toShort) // one cell
      page.putShort(contentStart.toShort)
      page.put(0.toByte)
      page.putShort(contentStart.toShort)
      page.array()
    }
    val e = intercept[IllegalArgumentException](
      SqliteSource.readTable(page1 ++ page2, "t"))
    assert(e.getMessage.contains("overflow"), e.getMessage)
    // a genuine spilled db whose overflow pages are truncated away must
    // also reject (chain points past the shortened file)
    val spilled = SqliteFixture.write("docs",
      Seq(("body", "TEXT")), Seq(Seq("y" * 9000)))
    val cut = spilled.take(4096 * 2) // drop the overflow pages
    val e2 = intercept[IllegalArgumentException](
      SqliteSource.readTable(cut, "docs"))
    // rejects at the payload-vs-file-size guard before touching the chain
    assert(e2.getMessage.contains("spilled payload"), e2.getMessage)
  }

  test("mutation: WAL byte flips and truncations decode or throw the contract exception") {
    // round-12: the -wal overlay path under the same contract — every
    // mutant either reads (recovery semantics: torn/stale frames drop
    // to the committed prefix) or throws IllegalArgumentException
    // (header damage), never a raw buffer/index/negative-size error
    val cols = Seq(("id", "INTEGER"), ("v", "TEXT"))
    var parsed = 0
    var rejected = 0
    for (seed <- 0 until 40) {
      val rnd = new scala.util.Random(seed * 7919L)
      val n = 1 + rnd.nextInt(6)
      val base = (1 to n).map(i => Seq(i.toLong, "r" + i + "x" * rnd.nextInt(20)))
      val changedRows = base.updated(rnd.nextInt(n), Seq((n + 1).toLong, "mutated" + seed))
      val v1 = SqliteFixture.toWalMode(SqliteFixture.write("t", cols, base))
      val v2 = SqliteFixture.toWalMode(SqliteFixture.write("t", cols, changedRows))
      val p1 = SqliteFixture.pages(v1)
      val p2 = SqliteFixture.pages(v2)
      val changed = p2.toSeq.sortBy(_._1).filter { case (k, img) =>
        !p1.get(k).exists(_.sameElements(img))
      }
      val wal = SqliteFixture.writeWal(Seq((changed, p2.size)))
      val mutants = (0 until 8).map { _ =>
        val m = wal.clone()
        val pos = rnd.nextInt(m.length)
        m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
        m
      } ++ Seq(wal.take(rnd.nextInt(wal.length + 1)))
      mutants.foreach { m =>
        scala.util.Try(SqliteSource.readTable(v1, "t", Some(m))) match {
          case scala.util.Success(t) =>
            parsed += 1
            assert(t.rows.size == n, s"seed $seed: ${t.rows.size} rows")
          case scala.util.Failure(_: IllegalArgumentException) => rejected += 1
          case scala.util.Failure(e) =>
            fail(s"seed $seed: non-contract exception $e", e)
        }
      }
    }
    assert(parsed > 0 && rejected > 0, s"parsed=$parsed rejected=$rejected")
  }

  test("mutation: byte flips and truncations decode or throw IllegalArgumentException") {
    var parsed = 0
    var rejected = 0
    for (seed <- 0 until 52) {
      // last 12 seeds: spilled dbs, so flips/truncations also land on
      // overflow page pointers and chain content
      val (bytes, table, _, _) =
        if (seed < 40) genDb(seed.toLong)
        else {
          val s = "z" * (4200 + seed * 311 % 12000)
          (SqliteFixture.write("docs", Seq(("body", "TEXT")), Seq(Seq(s))),
            "docs", Seq("body"), Seq(Seq(s)))
        }
      val rnd = new scala.util.Random(seed * 65537L)
      val mutants =
        (0 until 6).map { _ =>
          val m = bytes.clone()
          val pos = 16 + rnd.nextInt(math.max(1, m.length - 16))
          m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
          m
        } ++
          Seq(bytes.take(512 + rnd.nextInt(math.max(1, bytes.length - 512))))
      mutants.foreach { m =>
        scala.util.Try(SqliteSource.readTable(m, table)) match {
          case scala.util.Success(_) => parsed += 1
          case scala.util.Failure(_: IllegalArgumentException) => rejected += 1
          case scala.util.Failure(e) =>
            fail(s"seed $seed: non-contract exception $e", e)
        }
      }
    }
    assert(parsed > 0 && rejected > 0, s"parsed=$parsed rejected=$rejected")
  }
}
