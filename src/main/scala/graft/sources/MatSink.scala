package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import MatSource.{MatCell, MatNum, MatStr, MatValue}

/** MAT-5 write side (round-12): the reference's curation scripts WRITE
  * manual-annotation `.mat` files back into the MATLAB ecosystem —
  * `ifcb_create_class2use` and `ifcb_annotate_batch` at
  * code/annotations/annotate_whoi_data.R:48,64-73 — so a curation
  * round-trip was not expressible while [[MatSource]] stayed read-only.
  * This emits the same subset of the public "MAT-File Format" the
  * reader parses: little-endian, numeric (double) matrices
  * column-major, UTF-16 char arrays, cell arrays of strings, optional
  * zlib miCOMPRESSED framing per variable (the reference's
  * `do_compression = TRUE`; unpadded per the spec's one alignment
  * exception). Output is deterministic byte-for-byte (fixed header
  * text, no timestamps, fixed deflate level), so written files are
  * diffable and the write→read round-trip is pinned by spec.
  *
  * Spark shape: one `.mat` per sample — the reference's own unit of
  * work — serialized inside executors from a `groupByKey(sample)` and
  * published with the temp-file + atomic-rename discipline
  * ([[ZipSink]]'s), never collected to the driver.
  */
object MatSink {

  private val MiInt8 = 1
  private val MiUint16 = 4
  private val MiInt32 = 5
  private val MiUint32 = 6
  private val MiDouble = 9
  private val MiMatrix = 14
  private val MiCompressed = 15

  private val MxCell = 1
  private val MxChar = 4
  private val MxDouble = 6

  /** Serializes top-level variables to one MAT-5 byte stream.
    *
    * @param compress wrap each variable in a zlib miCOMPRESSED element
    *                 (the reference's `do_compression = TRUE`,
    *                 annotate_whoi_data.R:72 — what MATLAB's own `save`
    *                 does by default since v7). Deterministic: one
    *                 fixed-level deflate pass, no timestamps.
    */
  def write(vars: Seq[(String, MatValue)],
      compress: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val hdr = new Array[Byte](128)
    java.util.Arrays.fill(hdr, 0, 116, ' '.toByte)
    // fixed description text — a timestamp here would break the
    // deterministic-output contract the specs pin
    val desc = ("MATLAB 5.0 MAT-file, Platform: JVM, " +
      "Created by: graft.sources.MatSink").getBytes("US-ASCII")
    System.arraycopy(desc, 0, hdr, 0, math.min(desc.length, 116))
    // bytes 116-123: subsystem data offset (zeros = none);
    // 124-125: version 0x0100; 126-127: endian indicator
    hdr(124) = 0x00
    hdr(125) = 0x01
    hdr(126) = 'I'
    hdr(127) = 'M'
    out.write(hdr)
    vars.foreach { case (name, v) =>
      val e = element(MiMatrix, matrixPayload(name, v))
      // miCOMPRESSED elements are NOT padded to the 8-byte boundary
      // (the spec's one exception; MatSource.readElement relies on it,
      // and pad zeros after one would misalign the next element's tag)
      val framed =
        if (compress) {
          val z = deflate(e)
          val b = ByteBuffer.allocate(8 + z.length).order(ByteOrder.LITTLE_ENDIAN)
          b.putInt(MiCompressed)
          b.putInt(z.length)
          b.put(z)
          b.array()
        } else e
      out.write(framed, 0, framed.length)
    }
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(data)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val chunk = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(chunk)
      out.write(chunk, 0, n)
    }
    d.end()
    out.toByteArray
  }

  /** One tagged element (long form), padded to the 8-byte boundary. */
  private def element(tpe: Int, payload: Array[Byte]): Array[Byte] = {
    val pad = (8 - payload.length % 8) % 8
    val b = ByteBuffer.allocate(8 + payload.length + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(tpe)
    b.putInt(payload.length)
    b.put(payload)
    b.array()
  }

  private def dimsElement(dims: Seq[Int]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 * dims.length).order(ByteOrder.LITTLE_ENDIAN)
    dims.foreach(b.putInt)
    element(MiInt32, b.array())
  }

  private def matrixPayload(name: String, v: MatValue): Array[Byte] = {
    require(name.forall(c => c >= ' ' && c < 127),
      s"variable name '$name' is not plain ASCII")
    val (clazz, dims, dataBytes) = v match {
      case MatNum(ds, data) =>
        // Dims.product, not a bare fold: negative or wrapping dims must
        // fail HERE, not emit a corrupt file (round-12 review — the same
        // overflow class the reader-side helper exists for)
        val expect = Dims.product(ds.map(_.toLong), s"matrix '$name'")
        require(expect == data.length,
          s"matrix '$name' dims $ds (=$expect) vs ${data.length} values")
        val b = ByteBuffer.allocate(8 * data.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        data.foreach(b.putDouble)
        (MxDouble, ds, element(MiDouble, b.array()))
      case MatStr(s) =>
        // a 1×n char row vector is column-major trivially; empty = 0×0
        val dims = if (s.isEmpty) Seq(0, 0) else Seq(1, s.length)
        val b = ByteBuffer.allocate(2 * s.length).order(ByteOrder.LITTLE_ENDIAN)
        s.foreach(b.putChar)
        (MxChar, dims, element(MiUint16, b.array()))
      case MatCell(ds, items) =>
        val expect = Dims.product(ds.map(_.toLong), s"cell '$name'")
        require(expect == items.size,
          s"cell '$name' dims $ds (=$expect) vs ${items.size} items")
        // one output stream, not foldLeft(_ ++ _): the fold re-copies
        // the accumulated payload per item, O(n²) bytes for a large
        // class list (round-12 review)
        val nested = new java.io.ByteArrayOutputStream()
        items.foreach { it =>
          val e = element(MiMatrix, matrixPayload("", it))
          nested.write(e, 0, e.length)
        }
        (MxCell, ds, nested.toByteArray)
    }
    val flags = new Array[Byte](8)
    flags(0) = clazz.toByte
    element(MiUint32, flags) ++ dimsElement(dims) ++
      element(MiInt8, name.getBytes("US-ASCII")) ++ dataBytes
  }

  // --- MAT v7.3 write side (round-14) ---------------------------------------

  /** Serializes variables as a MAT v7.3 file: the 512-byte MAT userblock
    * (version 0x0200) followed by an HDF5 stream in the same subset
    * [[MatSource.parseV73]]/[[H5Source]] read — superblock v0,
    * symbol-table root group, v1 object headers, CONTIGUOUS layouts,
    * MATLAB_class/MATLAB_empty attributes, uint16 char datasets, and
    * true cell arrays as object-reference datasets into a `/#refs#`
    * group (the idiom MATLAB's own `-v7.3` writer uses for cellstr
    * class lists). Deterministic byte-for-byte: fixed header text,
    * sequential allocation, sorted symbol tables. Closes the write-side
    * symmetry so the v7.3 round-trip fuzz generates its own corpus
    * instead of hand-built fixtures (round-13 verdict task 7).
    */
  def write73(vars: Seq[(String, MatValue)]): Array[Byte] = {
    val userblock = new Array[Byte](512)
    java.util.Arrays.fill(userblock, 0, 116, ' '.toByte)
    val desc = ("MATLAB 7.3 MAT-file, Platform: JVM, " +
      "Created by: graft.sources.MatSink").getBytes("US-ASCII")
    System.arraycopy(desc, 0, userblock, 0, math.min(desc.length, 116))
    userblock(124) = 0x00
    userblock(125) = 0x02
    userblock(126) = 'I'
    userblock(127) = 'M'
    // a capacity-estimate miss must surface as the module's contract
    // exception with context, not a raw BufferOverflowException
    val h5 =
      try hdf5Stream(vars)
      catch {
        case e: java.nio.BufferOverflowException =>
          throw new IllegalArgumentException(
            "v7.3 writer capacity estimate undersized for these " +
              "variables (writer bug — report the shapes)", e)
      }
    userblock ++ h5
  }

  private def hdf5Stream(vars: Seq[(String, MatValue)]): Array[Byte] = {
    val Undef = -1L
    vars.foreach { case (name, _) =>
      require(name.nonEmpty && name.forall(c => c > ' ' && c < 127),
        s"variable name '$name' is not a plain ASCII identifier")
      // '#refs#' is the writer's own cell-target group: a variable by
      // that name would put duplicate keys in the root symbol table and
      // the reader silently resolves only one (round-14 review)
      require(name != "#refs#",
        "variable name '#refs#' collides with the cell-target group")
    }
    require(vars.map(_._1).distinct.size == vars.size,
      s"duplicate variable names: ${vars.map(_._1).diff(vars.map(_._1).distinct).distinct.mkString(",")}")
    // capacity: every value costs its data bytes PLUS a fixed per-
    // dataset overhead (v1 object header + dataspace/datatype/attr/
    // layout messages ≈ 250 B, /#refs# heap+SNOD bookkeeping ≈ 56 B per
    // cell target) — the round-14 review measured the old 64 B/value
    // budget crashing at ~140 cellstr entries, exactly the class-list
    // shape this writer exists for
    def payloadBytes(v: MatValue): Long = v match {
      case MatNum(_, data) => 8L * data.length + 512
      case MatStr(s) => 2L * s.length + 512
      case MatCell(_, items) => items.map(payloadBytes).sum + 64L * items.size + 512
    }
    val cap = 8192L + vars.map { case (_, v) => 1024L + 2 * payloadBytes(v) }.sum
    require(cap <= (1L << 30), s"v7.3 payload of $cap bytes exceeds the 1 GiB writer cap")
    val buf = ByteBuffer.allocate(cap.toInt).order(ByteOrder.LITTLE_ENDIAN)
    def pad8(): Unit = while (buf.position() % 8 != 0) buf.put(0.toByte)

    def message(tpe: Int, body: Array[Byte]): Array[Byte] = {
      val padded = body ++ new Array[Byte]((8 - body.length % 8) % 8)
      val m = ByteBuffer.allocate(8 + padded.length).order(ByteOrder.LITTLE_ENDIAN)
      m.putShort(tpe.toShort).putShort(padded.length.toShort)
      m.put(0.toByte).put(new Array[Byte](3)).put(padded)
      m.array()
    }
    def dataspace(h5dims: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + 8 * h5dims.size).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(h5dims.size.toByte).put(0.toByte).put(new Array[Byte](5))
      h5dims.foreach(b.putLong)
      b.array()
    }
    def objectHeader(msgs: Seq[Array[Byte]]): Long = {
      pad8()
      val addr = buf.position()
      buf.put(1.toByte).put(0.toByte)
      buf.putShort(msgs.size.toShort)
      buf.putInt(1)
      buf.putInt(msgs.map(_.length).sum)
      buf.put(new Array[Byte](4)) // align messages to 8
      msgs.foreach(buf.put)
      addr.toLong
    }
    def p8(a: Array[Byte]) = a ++ new Array[Byte]((8 - a.length % 8) % 8)
    // v1 attribute message bodies — the exact shapes MatSource's
    // attribute reader decodes (fixed string + uint8 scalar)
    def classAttr(mclass: String): Array[Byte] = {
      val aname = "MATLAB_class".getBytes("US-ASCII") :+ 0.toByte
      val adt = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      adt.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      adt.putInt(mclass.length)
      val ads = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)
      val ahdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      ahdr.put(1.toByte).put(0.toByte)
      ahdr.putShort(aname.length.toShort)
      ahdr.putShort(8.toShort)
      ahdr.putShort(8.toShort)
      ahdr.array() ++ p8(aname) ++ p8(adt.array()) ++ p8(ads) ++
        mclass.getBytes("US-ASCII")
    }
    def emptyAttr(): Array[Byte] = {
      val ename = "MATLAB_empty".getBytes("US-ASCII") :+ 0.toByte
      val edt = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      edt.put(0x10.toByte).put(0x00.toByte).put(0.toByte).put(0.toByte)
      edt.putInt(1).putShort(0.toShort).putShort(8.toShort)
      val ads = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)
      val ehdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      ehdr.put(1.toByte).put(0.toByte)
      ehdr.putShort(ename.length.toShort)
      ehdr.putShort(12.toShort)
      ehdr.putShort(8.toShort)
      ehdr.array() ++ p8(ename) ++ p8(edt.array()) ++ p8(ads) ++ Array[Byte](1)
    }
    def contiguous(dataAddr: Long, n: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte).put(1.toByte).putLong(dataAddr).putLong(n)
      b.array()
    }
    val dtDouble = {
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x11.toByte).put(0x20.toByte).put(0x3f.toByte).put(0.toByte)
      b.putInt(8).putShort(0.toShort).putShort(64.toShort)
      b.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte).putInt(1023)
      b.array()
    }
    def dtFixed(size: Int): Array[Byte] = { // unsigned little-endian
      val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x10.toByte).put(0x00.toByte).put(0.toByte).put(0.toByte)
      b.putInt(size).putShort(0.toShort).putShort((size * 8).toShort)
      b.array()
    }
    val dtRef = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x17.toByte).put(0x00.toByte).put(0.toByte).put(0.toByte)
      b.putInt(8)
      b.array()
    }

    // MATLAB_empty datasets hold the SIZE VECTOR (MATLAB order, uint64)
    def writeEmpty(mclass: String, matDims: Seq[Int]): Long = {
      pad8()
      val dataAddr = buf.position()
      matDims.foreach(d => buf.putLong(d.toLong))
      objectHeader(Seq(
        message(0x0001, dataspace(Seq(matDims.length.toLong))),
        message(0x0003, dtFixed(8)),
        message(0x000c, classAttr(mclass)),
        message(0x000c, emptyAttr()),
        message(0x0008, contiguous(dataAddr, 8L * matDims.length))))
    }

    // every cell target lands in /#refs#, depth-first so a nested cell's
    // own reference dataset is written AFTER its targets — addresses are
    // always known, no patching
    val refEntries = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def writeValue(v: MatValue): Long = v match {
      case MatNum(dims, data) if data.isEmpty =>
        // the v5 writer and the non-empty branches validate dims vs
        // length; an empty payload must claim a zero-product shape too,
        // or the reader hands consumers a self-contradictory
        // MATLAB_empty that dies with a raw AIOOBE downstream
        // (round-14 review)
        require(Dims.product(dims.map(_.toLong), "v7.3 empty matrix") == 0L,
          s"empty matrix claims non-empty dims $dims")
        writeEmpty("double", dims)
      case MatNum(dims, data) =>
        val expect = Dims.product(dims.map(_.toLong), "v7.3 matrix")
        require(expect == data.length,
          s"v7.3 matrix dims $dims (=$expect) vs ${data.length} values")
        pad8()
        val dataAddr = buf.position()
        data.foreach(buf.putDouble) // column-major flat == HDF5 row-major of reversed dims
        objectHeader(Seq(
          message(0x0001, dataspace(dims.reverse.map(_.toLong))),
          message(0x0003, dtDouble),
          message(0x000c, classAttr("double")),
          message(0x0008, contiguous(dataAddr, 8L * data.length))))
      case MatStr("") =>
        writeEmpty("char", Seq(0, 0))
      case MatStr(s) =>
        pad8()
        val dataAddr = buf.position()
        s.foreach(c => buf.putShort(c.toShort)) // uint16 code units
        objectHeader(Seq(
          message(0x0001, dataspace(Seq(s.length.toLong, 1L))), // MATLAB [1,n]
          message(0x0003, dtFixed(2)),
          message(0x000c, classAttr("char")),
          message(0x0008, contiguous(dataAddr, 2L * s.length))))
      case MatCell(dims, items) if items.isEmpty =>
        require(Dims.product(dims.map(_.toLong), "v7.3 empty cell") == 0L,
          s"empty cell claims non-empty dims $dims")
        writeEmpty("cell", dims)
      case MatCell(dims, items) =>
        val expect = Dims.product(dims.map(_.toLong), "v7.3 cell")
        require(expect == items.size,
          s"v7.3 cell dims $dims (=$expect) vs ${items.size} items")
        val addrs = items.map { it =>
          val a = writeValue(it)
          refEntries += ((f"r${refEntries.size + 1}%06d", a))
          a
        }
        pad8()
        val dataAddr = buf.position()
        addrs.foreach(buf.putLong)
        objectHeader(Seq(
          message(0x0001, dataspace(dims.reverse.map(_.toLong))),
          message(0x0003, dtRef),
          message(0x000c, classAttr("cell")),
          message(0x0008, contiguous(dataAddr, 8L * addrs.size))))
    }

    // reserve the superblock, then datasets (cells register refs),
    // then the /#refs# group, then the root group over everything
    buf.position(96)
    val varAddrs = vars.map { case (name, v) => name -> writeValue(v) }

    def writeGroup(entries: Seq[(String, Long)]): (Long, Long, Long) = {
      val sorted = entries.sortBy(_._1)
      pad8()
      val heapDataSize = 8L + sorted.map(_._1.length + 1).sum
      val heapAligned = (heapDataSize + 7) / 8 * 8
      val heapHeader = buf.position()
      val heapData = heapHeader + 32
      buf.put("HEAP".getBytes("US-ASCII")).put(0.toByte).put(new Array[Byte](3))
      buf.putLong(heapAligned)
      // free-list head: 1 = "no free block" (H5HL_FREE_NULL) — writing a
      // data offset here claims a phantom free block that external HDF5
      // readers would try to parse (round-14 review)
      buf.putLong(1L)
      buf.putLong(heapData.toLong)
      val nameOff = scala.collection.mutable.Map.empty[String, Long]
      val heapStart = buf.position()
      buf.put(new Array[Byte](8))
      for ((n, _) <- sorted) {
        nameOff(n) = buf.position() - heapStart
        buf.put(n.getBytes("US-ASCII")).put(0.toByte)
      }
      buf.position(heapStart + heapAligned.toInt)
      pad8()
      val btree = buf.position()
      buf.put("TREE".getBytes("US-ASCII"))
      buf.put(0.toByte).put(0.toByte)
      buf.putShort(1.toShort)
      buf.putLong(Undef).putLong(Undef)
      val snodPos = buf.position() + 8
      buf.putLong(0L) // key0
      buf.putLong(0L) // child0 -> patched to the SNOD
      buf.putLong(if (sorted.isEmpty) 0L else nameOff(sorted.last._1)) // keyN
      pad8()
      val snod = buf.position()
      buf.put("SNOD".getBytes("US-ASCII")).put(1.toByte).put(0.toByte)
      // the SNOD entry count (and the superblock's B-tree K derived from
      // the same group sizes) is a 2-byte field: the 1 GiB capacity gate
      // admits ~1M cell items, so an unbounded .toShort would silently
      // wrap past 32767 entries and emit a corrupt file (round-14 ADVICE)
      require(sorted.size <= 0x7fff,
        s"v7.3 writer: group holds ${sorted.size} entries " +
          "(max 32767 per symbol node): split the variable set")
      buf.putShort(sorted.size.toShort)
      val entryPos = buf.position()
      buf.position(entryPos + 40 * sorted.size)
      buf.putLong(snodPos, snod.toLong)
      for (((n, addr), k) <- sorted.zipWithIndex) {
        val e = entryPos + 40 * k
        buf.putLong(e, nameOff(n))
        buf.putLong(e + 8, addr)
        buf.putInt(e + 16, 0)
        buf.putInt(e + 20, 0)
      }
      val st = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      st.putLong(btree.toLong).putLong(heapHeader.toLong)
      (objectHeader(Seq(message(0x0011, st.array()))), btree.toLong, heapHeader.toLong)
    }

    val rootEntries =
      if (refEntries.isEmpty) varAddrs
      else varAddrs :+ ("#refs#" -> writeGroup(refEntries.toSeq)._1)
    val (rootHeader, rootBtree, rootHeap) = writeGroup(rootEntries)
    val eof = buf.position()

    // superblock v0
    buf.position(0)
    buf.put(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
    buf.put(0.toByte) // superblock v0
    buf.put(0.toByte).put(0.toByte).put(0.toByte)
    buf.put(0.toByte) // shared header version
    buf.put(8.toByte).put(8.toByte).put(0.toByte) // offset/length sizes
    // leaf/internal K sized to the widest symbol node this writer emits
    // (one SNOD per group), so count <= 2K always holds
    val k = math.max(4, rootEntries.size.max(refEntries.size))
    buf.putShort(k.toShort).putShort(16.toShort)
    buf.putInt(0)
    buf.putLong(0L) // base address
    buf.putLong(Undef)
    buf.putLong(eof.toLong)
    buf.putLong(Undef)
    buf.putLong(0L) // root link name offset
    buf.putLong(rootHeader)
    buf.putInt(1).putInt(0)
    buf.putLong(rootBtree).putLong(rootHeap)

    val out = new Array[Byte](eof)
    buf.position(0)
    buf.get(out)
    out
  }

  // --- curation file shapes ------------------------------------------------

  /** A class2use config file (`ifcb_create_class2use` shape): one cell
    * array of class-name strings under `varName`; readable back by
    * [[MatSource.class2use]] with 1-based MATLAB indices.
    */
  def class2useBytes(classes: Seq[String],
      varName: String = "class2use",
      compress: Boolean = true): Array[Byte] =
    write(Seq(varName -> MatCell(Seq(1, classes.size), classes.map(MatStr))),
      compress)

  /** A manual-annotation file (`ifcb_annotate_batch` shape): `classlist`
    * = nROI×3 column-major [roi, manual idx, auto idx] with NaN for
    * unannotated slots, plus the dataset's own `class2use_manual` cell —
    * the exact layout [[MatSource.manualClassList]] reads back.
    */
  def manualBytes(classlist: Seq[(Int, Option[Int], Option[Int])],
      classes: Seq[String], compress: Boolean = true): Array[Byte] = {
    val n = classlist.size
    val data = new Array[Double](n * 3)
    classlist.zipWithIndex.foreach { case ((roi, manual, auto), i) =>
      data(i) = roi.toDouble
      data(n + i) = manual.map(_.toDouble).getOrElse(Double.NaN)
      data(2 * n + i) = auto.map(_.toDouble).getOrElse(Double.NaN)
    }
    write(Seq(
      "classlist" -> MatNum(Seq(n, 3), data),
      "class2use_manual" -> MatCell(Seq(1, classes.size), classes.map(MatStr))),
      compress)
  }

  /** Writes one manual `.mat` per sample from the
    * [[graft.jobs.WhoiCuration.annotateBatch]] relational shape
    * (sample, roi_number, manual_idx) — serialization happens in
    * executors grouped by sample, published via temp file + atomic
    * rename so replayed/speculative attempts never leave a torn file.
    * ROIs are sorted by number inside each file (the ADC order real
    * manual files carry).
    */
  def writeManualFiles(annotations: DataFrame, classes: Seq[String],
      dir: String): Unit = {
    new java.io.File(dir).mkdirs()
    val spark = annotations.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(classes)
    annotations
      .select(col("sample").cast("string"), col("roi_number").cast("int"),
        col("manual_idx").cast("int"))
      .as[(String, Int, Int)]
      .groupByKey(_._1)
      .mapGroups { (sample, it) =>
        val rows = it.map { case (_, roi, m) =>
          (roi, Some(m): Option[Int], None: Option[Int])
        }.toSeq.sortBy(_._1)
        // fail loudly on CONFLICTING labels for one ROI (round-12
        // ADVICE): this is a public entry point, and a classlist with
        // two contradictory rows for the same roi_number is a corrupt
        // manual file no downstream reader can resolve —
        // WhoiCuration.annotateBatch dedups upstream, but other
        // callers must not be able to ship one silently. Agreeing
        // duplicates (an idempotent replay unioning overlapping
        // batches) collapse via distinct first — only genuine
        // contradictions abort (round-13 review).
        val uniq = rows.distinct
        val dups = uniq.groupBy(_._1).filter(_._2.size > 1).keys.toSeq.sorted
        require(dups.isEmpty,
          s"sample '$sample' carries conflicting labels for roi_number " +
            s"${dups.take(5).mkString(",")}${if (dups.size > 5) ",…" else ""}: " +
            "resolve before writing a manual file")
        (sample, manualBytes(uniq, bc.value))
      }
      .foreachPartition { (it: Iterator[(String, Array[Byte])]) =>
        it.foreach { case (sample, bytes) =>
          require(!sample.contains('/') && !sample.contains('\\'),
            s"sample id '$sample' is not a plain filename")
          val d = new java.io.File(dir)
          // fixed prefix padding: createTempFile requires >= 3 chars, and
          // a 1-char sample id must fail OUR checks, not its (r12 review)
          val tmp = java.io.File.createTempFile(s".graft-$sample", ".mat.tmp", d)
          java.nio.file.Files.write(tmp.toPath, bytes)
          java.nio.file.Files.move(tmp.toPath,
            new java.io.File(d, s"$sample.mat").toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
      }
  }
}
