package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Deflater

/** Minimal HDF5 v0 writer for H5SourceSpec fixtures, composing the same
  * public-spec structures the reader parses: superblock v0, symbol-table
  * root group (B-tree v1 + local heap + SNOD), v1 object headers,
  * contiguous and chunked(+deflate) layouts, fixed-point / IEEE-float /
  * variable-length-string datatypes with a global heap. Field layouts
  * follow the "HDF5 File Format Specification Version 3.0" so the fixture
  * bytes structurally match what libhdf5 writes in earliest-compatible
  * mode.
  */
object H5Fixture {

  sealed trait Ds { def name: String }
  /** `splitHeader` routes this dataset's messages through an object-header
    * continuation block (exercises the reader's continuation path).
    */
  final case class I32(name: String, values: Array[Int],
                       splitHeader: Boolean = false) extends Ds
  final case class F64(name: String, values: Array[Double]) extends Ds
  /** 2-D float32, chunked + deflate (`chunkRows` rows per chunk —
    * multiple chunks exercise the reader's chunk-reassembly path).
    * `shuffle` prepends the byte-shuffle filter (id 2) to the pipeline
    * before deflate, the h5py/Keras default (`shuffle=True` + gzip).
    * `rawChunks` stores every chunk UNcompressed with the deflate bit
    * set in the per-chunk filter mask — what libhdf5 does when an
    * optional deflate doesn't shrink an incompressible chunk.
    * `unwritten` allocates the dataset but writes no chunks (B-tree
    * address undefined) — libhdf5 reads such a dataset as fill-value.
    */
  /** `fletcher32` appends the HDF5 checksum filter (id 3) LAST in the
    * pipeline (over the deflated bytes, like h5py's `fletcher32=True`);
    * `corruptFletcher` stores a deliberately wrong checksum so specs can
    * assert the reader rejects the damage loudly.
    */
  final case class F32Matrix(name: String, rows: Int, cols: Int, values: Array[Float],
                             chunkRows: Int = Int.MaxValue,
                             shuffle: Boolean = false,
                             rawChunks: Boolean = false,
                             unwritten: Boolean = false,
                             fletcher32: Boolean = false,
                             corruptFletcher: Boolean = false) extends Ds
  final case class VStr(name: String, values: Array[String]) extends Ds
  /** int32 stored with the COMPACT data layout (class 0: data inline in
    * the object header) — exercises the reader's third layout path.
    */
  final case class I32Compact(name: String, values: Array[Int]) extends Ds
  /** Fixed-length (class 3) strings, NUL-padded to `size` bytes. */
  final case class FStr(name: String, size: Int, values: Array[String]) extends Ds
  /** uint16 dataset carrying a fixed-string scalar MATLAB_class
    * attribute — the shape real MATLAB `-v7.3` writes for char
    * variables (UTF-16 code units, transposed). `h5dims` in HDF5
    * (row-major) order.
    */
  /** `attrVersion` stamps the MATLAB_class attribute MESSAGE with a
    * non-v1 version byte — the reader skips such attributes and must
    * then refuse to type the variable (round-13 ADVICE).
    */
  final case class U16Attr(name: String, h5dims: Seq[Long], values: Array[Int],
                           matlabClass: String,
                           matlabEmpty: Boolean = false,
                           attrVersion: Int = 1) extends Ds
  /** A symbol-table group (B-tree v1 + local heap + SNOD, like the root)
    * holding child datasets — the `/#refs#` shape MATLAB's `-v7.3`
    * writer uses for cell-array targets. Children's header addresses
    * register as "group/child" for [[RefArray]] targets.
    */
  final case class Group(name: String, children: Seq[Ds]) extends Ds
  /** Object-reference (datatype class 7) dataset: 8-byte addresses of
    * the named targets' object headers, carrying a MATLAB_class
    * attribute — the real-MATLAB cell-array shape (references into
    * `/#refs#`). Sentinel targets for fuzz fixtures: `<self>` (cyclic —
    * the RefArray's own header), `<dangling>` (an address past EOF),
    * `<zero>` (a null address).
    */
  final case class RefArray(name: String, h5dims: Seq[Long],
                            targets: Seq[String],
                            matlabClass: String = "cell") extends Ds

  private val Undef = -1L

  def write(datasets: Seq[Ds]): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 << 20).order(ByteOrder.LITTLE_ENDIAN)

    def pad8(): Unit = while (buf.position() % 8 != 0) buf.put(0.toByte)

    // ---- reserve the superblock (96 bytes), fill at the end
    buf.position(96)

    // ---- local heap: header + data segment
    val heapDataSize = 8L * 8 + datasets.map(_.name.length + 1).sum
    val heapDataSizeAligned = (heapDataSize + 7) / 8 * 8
    val heapHeaderAddr = buf.position()
    val heapDataAddr = heapHeaderAddr + 32
    buf.put("HEAP".getBytes("US-ASCII")).put(0.toByte).put(new Array[Byte](3))
    buf.putLong(heapDataSizeAligned)
    buf.putLong(1L) // free-list head: 1 = no free block (H5HL_FREE_NULL)
    buf.putLong(heapDataAddr)
    // heap data: offset 0 = empty root link name; names from offset 8
    val nameOffsets = scala.collection.mutable.Map.empty[String, Long]
    val heapStart = buf.position()
    buf.put(new Array[Byte](8))
    for (ds <- datasets) {
      nameOffsets(ds.name) = buf.position() - heapStart
      buf.put(ds.name.getBytes("US-ASCII")).put(0.toByte)
    }
    buf.position(heapStart + heapDataSizeAligned.toInt)

    // ---- placeholder: group B-tree (1 level-0 node, 1 SNOD child)
    val btreeAddr = buf.position()
    buf.put("TREE".getBytes("US-ASCII"))
    buf.put(0.toByte) // node type 0 = group
    buf.put(0.toByte) // level
    buf.putShort(1.toShort) // entries used
    buf.putLong(Undef).putLong(Undef)
    val snodAddrPos = buf.position() + 8 // after key0
    buf.putLong(0L) // key0: heap offset of smallest name
    buf.putLong(0L) // child0 -> patched to SNOD
    buf.putLong(nameOffsets(datasets.last.name)) // keyN

    // ---- SNOD with one entry per dataset (alphabetical, like libhdf5)
    val sorted = datasets.sortBy(_.name)
    val snodAddr = buf.position()
    buf.put("SNOD".getBytes("US-ASCII"))
    buf.put(1.toByte).put(0.toByte)
    buf.putShort(sorted.size.toShort)
    val entryPos = buf.position()
    buf.position(entryPos + 40 * sorted.size)
    buf.putLong(snodAddrPos, snodAddr.toLong)

    // ---- datasets: object header + data
    val headerAddrs = scala.collection.mutable.Map.empty[String, Long]
    // global heap for all vlen strings
    val vstrs = sorted.collect { case v: VStr => v }
    val gheapAddr: Long = if (vstrs.isEmpty) Undef else {
      pad8()
      val a = buf.position()
      val objBytes = vstrs.flatMap(_.values).zipWithIndex.map { case (s, i) =>
        (i + 1, s.getBytes("UTF-8"))
      }
      val collSize = 16L + objBytes.map(o => 16L + (o._2.length + 7) / 8 * 8).sum + 16L
      buf.put("GCOL".getBytes("US-ASCII"))
      buf.put(1.toByte).put(new Array[Byte](3))
      buf.putLong(collSize)
      for ((idx, data) <- objBytes) {
        buf.putShort(idx.toShort)
        buf.putShort(1.toShort) // refcount
        buf.putInt(0)
        buf.putLong(data.length.toLong)
        buf.put(data)
        pad8()
      }
      buf.putShort(0.toShort) // free-space object terminator
      buf.putShort(0.toShort)
      buf.putInt(0)
      buf.putLong(0L)
      a.toLong
    }
    // global heap object index per (dataset, element)
    var gIdx = 0
    val gIndexOf = vstrs.flatMap(v => v.values.indices.map { i =>
      gIdx += 1; (v.name, i) -> gIdx
    }).toMap

    def message(tpe: Int, body: Array[Byte]): Array[Byte] = {
      val padded = body ++ new Array[Byte]((8 - body.length % 8) % 8)
      val m = ByteBuffer.allocate(8 + padded.length).order(ByteOrder.LITTLE_ENDIAN)
      m.putShort(tpe.toShort).putShort(padded.length.toShort)
      m.put(0.toByte).put(new Array[Byte](3)).put(padded)
      m.array()
    }

    def dataspace(dims: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + 8 * dims.size).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(dims.size.toByte).put(0.toByte).put(new Array[Byte](5))
      dims.foreach(b.putLong)
      b.array()
    }

    def objectHeader(msgs: Seq[Array[Byte]], split: Boolean = false): Long = {
      pad8()
      val addr = buf.position()
      if (!split) {
        val total = msgs.map(_.length).sum
        buf.put(1.toByte).put(0.toByte)
        buf.putShort(msgs.size.toShort)
        buf.putInt(1)
        buf.putInt(total)
        buf.put(new Array[Byte](4)) // align messages to 8
        msgs.foreach(buf.put)
      } else {
        // first block: first message + continuation message pointing at a
        // block holding the rest (continuation counts toward nMsgs)
        val contMsg = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
        contMsg.putShort(0x0010.toShort).putShort(16.toShort)
        contMsg.put(0.toByte).put(new Array[Byte](3))
        val contBodyPatch = addr + 16 + msgs.head.length + 8
        contMsg.putLong(0L).putLong(0L) // patched below
        buf.put(1.toByte).put(0.toByte)
        buf.putShort((msgs.size + 1).toShort)
        buf.putInt(1)
        buf.putInt(msgs.head.length + 24)
        buf.put(new Array[Byte](4))
        buf.put(msgs.head)
        buf.put(contMsg.array())
        pad8()
        val contAddr = buf.position()
        val rest = msgs.tail
        rest.foreach(buf.put)
        buf.putLong(contBodyPatch, contAddr.toLong)
        buf.putLong(contBodyPatch + 8, rest.map(_.length).sum.toLong)
      }
      addr.toLong
    }

    // attribute message v1: name (NUL-terminated, 8-padded), datatype
    // (class 3 fixed string sized to the value), dataspace (v1 rank-0
    // scalar), then the value bytes — MATLAB_class, shared by U16Attr
    // and RefArray
    def matlabClassAttr(mclass: String, version: Int = 1): Array[Byte] = {
      def p8(a: Array[Byte]) = a ++ new Array[Byte]((8 - a.length % 8) % 8)
      val aname = "MATLAB_class".getBytes("US-ASCII") :+ 0.toByte
      val adt = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      adt.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      adt.putInt(mclass.length)
      val ads = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)
      val ahdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      ahdr.put(version.toByte).put(0.toByte)
      ahdr.putShort(aname.length.toShort)
      ahdr.putShort(8.toShort) // datatype size (unpadded)
      ahdr.putShort(8.toShort) // dataspace size (unpadded)
      ahdr.array() ++ p8(aname) ++ p8(adt.array()) ++ p8(ads) ++
        mclass.getBytes("US-ASCII")
    }

    // reference-array data positions to patch once every header address
    // (incl. groups, written after their targets) is known
    val refPatches = Seq.newBuilder[(Int, String, Seq[String])]

    def writeOne(ds: Ds, key: String): Unit = ds match {
      case I32(name, values, splitHeader) =>
        pad8()
        val dataAddr = buf.position()
        values.foreach(buf.putInt)
        val dt = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
        dt.put(0x10.toByte).put(0x08.toByte).put(0.toByte).put(0.toByte)
        dt.putInt(4).putShort(0.toShort).putShort(32.toShort)
        val layout = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
        layout.put(3.toByte).put(1.toByte).putLong(dataAddr.toLong).putLong(4L * values.length)
        headerAddrs(key) = objectHeader(Seq(
          message(0x0001, dataspace(Seq(values.length.toLong))),
          message(0x0003, dt.array()),
          message(0x0008, layout.array())), split = splitHeader)
      case F64(name, values) =>
        pad8()
        val dataAddr = buf.position()
        values.foreach(buf.putDouble)
        val dt = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
        dt.put(0x11.toByte).put(0x20.toByte).put(0x3f.toByte).put(0.toByte)
        dt.putInt(8).putShort(0.toShort).putShort(64.toShort)
        dt.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte).putInt(1023)
        val layout = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
        layout.put(3.toByte).put(1.toByte).putLong(dataAddr.toLong).putLong(8L * values.length)
        headerAddrs(key) = objectHeader(Seq(
          message(0x0001, dataspace(Seq(values.length.toLong))),
          message(0x0003, dt.array()),
          message(0x0008, layout.array())))
      case U16Attr(name, h5dims, values, mclass, mempty, attrVersion) =>
        pad8()
        val dataAddr = buf.position()
        values.foreach(v => buf.putShort(v.toShort))
        val dt = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
        dt.put(0x10.toByte).put(0x00.toByte).put(0.toByte).put(0.toByte)
        dt.putInt(2).putShort(0.toShort).putShort(16.toShort)
        val layout = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
        layout.put(3.toByte).put(1.toByte).putLong(dataAddr.toLong)
          .putLong(2L * values.length)
        def p8(a: Array[Byte]) = a ++ new Array[Byte]((8 - a.length % 8) % 8)
        val ads = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)
        val attrBody = matlabClassAttr(mclass, attrVersion)
        // MATLAB_empty: a uint8 scalar attribute with value 1, like
        // MATLAB's -v7.3 writer stamps on empty variables
        val emptyAttr = if (!mempty) Seq.empty else {
          val ename = "MATLAB_empty".getBytes("US-ASCII") :+ 0.toByte
          val edt = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
          edt.put(0x10.toByte).put(0x00.toByte).put(0.toByte).put(0.toByte)
          edt.putInt(1).putShort(0.toShort).putShort(8.toShort)
          val ehdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          ehdr.put(1.toByte).put(0.toByte)
          ehdr.putShort(ename.length.toShort)
          ehdr.putShort(12.toShort) // datatype size (unpadded)
          ehdr.putShort(8.toShort) // dataspace size (unpadded)
          Seq(message(0x000c, ehdr.array() ++ p8(ename) ++ p8(edt.array()) ++
            p8(ads) ++ Array[Byte](1)))
        }
        headerAddrs(key) = objectHeader(Seq(
          message(0x0001, dataspace(h5dims)),
          message(0x0003, dt.array()),
          message(0x000c, attrBody)) ++ emptyAttr ++ Seq(
          message(0x0008, layout.array())))
      case F32Matrix(name, rows, cols, values, chunkRowsRaw, shuffle, rawChunks, unwritten, fletch, corruptFletch) =>
        require(!rawChunks || !fletch, "fixture: rawChunks + fletcher32 not modeled")
        // independent transcription of HDF5's H5_checksum_fletcher32
        // (big-endian 16-bit word sums, 360-word modular reduction) so
        // the spec doesn't test the reader against its own code
        def checksum(d: Array[Byte]): Long = {
          var s1 = 0L; var s2 = 0L; var k = 0
          var words = d.length / 2
          while (words > 0) {
            var run = math.min(words, 360); words -= run
            while (run > 0) {
              s1 += ((d(k) & 0xff) << 8) | (d(k + 1) & 0xff); s2 += s1
              k += 2; run -= 1
            }
            s1 = (s1 & 0xffff) + (s1 >> 16); s2 = (s2 & 0xffff) + (s2 >> 16)
          }
          if (d.length % 2 == 1) {
            s1 += (d(d.length - 1) & 0xff) << 8; s2 += s1
            s1 = (s1 & 0xffff) + (s1 >> 16); s2 = (s2 & 0xffff) + (s2 >> 16)
          }
          s1 = (s1 & 0xffff) + (s1 >> 16); s2 = (s2 & 0xffff) + (s2 >> 16)
          (s2 << 16) | s1
        }
        def withChecksum(d: Array[Byte]): Array[Byte] = {
          val c = checksum(d) ^ (if (corruptFletch) 0x5aL else 0L)
          val b = ByteBuffer.allocate(d.length + 4).order(ByteOrder.LITTLE_ENDIAN)
          b.put(d).putInt(c.toInt)
          b.array()
        }
        val chunkRows = math.min(chunkRowsRaw, rows)
        // per-chunk raw bytes (edge chunks zero-padded to full chunk size,
        // like libhdf5), deflate-compressed
        val chunkStarts = if (unwritten) Seq.empty[Int] else (0 until rows by chunkRows)
        val chunks = chunkStarts.map { r0 =>
          val raw = ByteBuffer.allocate(4 * chunkRows * cols).order(ByteOrder.LITTLE_ENDIAN)
          for (r <- r0 until r0 + chunkRows; c <- 0 until cols)
            raw.putFloat(if (r < rows) values(r * cols + c) else 0.0f)
          // write-order pipeline: shuffle (byte-transpose: byte 0 of
          // every element, then byte 1, …) BEFORE deflate, like h5py
          val filtered =
            if (!shuffle) raw.array()
            else {
              val in = raw.array()
              val n = in.length / 4
              val out = new Array[Byte](in.length)
              for (j <- 0 until n; i <- 0 until 4)
                out(i * n + j) = in(j * 4 + i)
              out
            }
          // rawChunks: store unfiltered, mask bit marks EVERY pipeline
          // filter skipped (deflate bit, and shuffle's too when present
          // — libhdf5 sets the skipped-filter bit per filter index)
          if (rawChunks) {
            val mask = if (shuffle) 3 else 1
            (r0, raw.array().clone(), mask)
          } else {
            val deflater = new Deflater()
            deflater.setInput(filtered); deflater.finish()
            val compBuf = new Array[Byte](raw.array().length + 64)
            val compLen = deflater.deflate(compBuf)
            deflater.end()
            val comp = compBuf.take(compLen)
            (r0, if (fletch) withChecksum(comp) else comp, 0)
          }
        }
        val chunkAddrs = chunks.map { case (r0, data, mask) =>
          pad8()
          val a = buf.position()
          buf.put(data)
          (r0, a, data.length, mask)
        }
        // chunk B-tree: one level-0 node, node type 1, N children
        // (unwritten: no B-tree at all — address stays undefined)
        pad8()
        val cbtree = if (unwritten) Undef else buf.position().toLong
        if (!unwritten) {
          buf.put("TREE".getBytes("US-ASCII"))
          buf.put(1.toByte).put(0.toByte)
          buf.putShort(chunkAddrs.size.toShort)
          buf.putLong(Undef).putLong(Undef)
          for ((r0, addr, len, mask) <- chunkAddrs) {
            buf.putInt(len).putInt(mask) // key: nbytes, filter mask
            buf.putLong(r0.toLong).putLong(0L).putLong(0L) // chunk offset + dtype dim
            buf.putLong(addr.toLong) // child
          }
          buf.putInt(0).putInt(0) // keyN
        }
        buf.putLong(rows.toLong).putLong(cols.toLong).putLong(0L)
        val dt = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
        dt.put(0x11.toByte).put(0x20.toByte).put(0x1f.toByte).put(0.toByte)
        dt.putInt(4).putShort(0.toShort).putShort(32.toShort)
        dt.put(23.toByte).put(8.toByte).put(0.toByte).put(23.toByte).putInt(127)
        val layout = ByteBuffer.allocate(23).order(ByteOrder.LITTLE_ENDIAN)
        layout.put(3.toByte).put(2.toByte).put(3.toByte) // v3, chunked, rank+1
        layout.putLong(cbtree.toLong)
        layout.putInt(chunkRows).putInt(cols).putInt(4) // chunk dims + elem size
        val nFilters = 1 + (if (shuffle) 1 else 0) + (if (fletch) 1 else 0)
        val filters = ByteBuffer.allocate(8 + (if (shuffle) 16 else 0) + 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        filters.put(1.toByte).put(nFilters.toByte).put(new Array[Byte](6))
        if (shuffle) { // listed FIRST: write application order
          filters.putShort(2.toShort) // shuffle
          filters.putShort(0.toShort) // name length
          filters.putShort(0.toShort) // flags
          filters.putShort(1.toShort) // 1 client value (element size)
          filters.putInt(4) // element size
          filters.putInt(0) // odd client-value count → pad to 8
        }
        filters.putShort(1.toShort) // deflate
        filters.putShort(0.toShort) // name length
        filters.putShort(1.toShort) // flags: optional
        filters.putShort(1.toShort) // 1 client value
        // (level) + pad handled by message padding; fletcher32 listed
        // LAST (applied after deflate on write, verified first on read)
        val filterBody = filters.array() ++ Array[Byte](6, 0, 0, 0) ++
          // deflate's odd client-value count pads to 8 BEFORE the next
          // descriptor (id 3, no name, no client values)
          (if (fletch) Array[Byte](0, 0, 0, 0, 3, 0, 0, 0, 0, 0, 0, 0)
           else Array.empty[Byte])
        headerAddrs(key) = objectHeader(Seq(
          message(0x0001, dataspace(Seq(rows.toLong, cols.toLong))),
          message(0x0003, dt.array()),
          message(0x000b, filterBody),
          message(0x0008, layout.array())))
      case I32Compact(name, values) =>
        // layout message body: version(3) class(0) size(2 LE) + data
        val dataBytes = {
          val b = ByteBuffer.allocate(4 * values.length).order(ByteOrder.LITTLE_ENDIAN)
          values.foreach(b.putInt)
          b.array()
        }
        val dt = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
        dt.put(0x10.toByte).put(0x08.toByte).put(0.toByte).put(0.toByte)
        dt.putInt(4).putShort(0.toShort).putShort(32.toShort)
        val layout = ByteBuffer.allocate(4 + dataBytes.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        layout.put(3.toByte).put(0.toByte)
        layout.putShort(dataBytes.length.toShort)
        layout.put(dataBytes)
        headerAddrs(key) = objectHeader(Seq(
          message(0x0001, dataspace(Seq(values.length.toLong))),
          message(0x0003, dt.array()),
          message(0x0008, layout.array())))
      case FStr(name, size, values) =>
        pad8()
        val dataAddr = buf.position()
        for (v <- values) {
          val b = v.getBytes("UTF-8")
          require(b.length <= size, s"fixed string '$v' exceeds $size bytes")
          buf.put(b).put(new Array[Byte](size - b.length)) // NUL pad
        }
        val dt = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        dt.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        dt.putInt(size)
        val layout = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
        layout.put(3.toByte).put(1.toByte).putLong(dataAddr.toLong)
          .putLong(size.toLong * values.length)
        headerAddrs(key) = objectHeader(Seq(
          message(0x0001, dataspace(Seq(values.length.toLong))),
          message(0x0003, dt.array()),
          message(0x0008, layout.array())))
      case VStr(name, values) =>
        pad8()
        val dataAddr = buf.position()
        for (i <- values.indices) {
          buf.putInt(values(i).getBytes("UTF-8").length)
          buf.putLong(gheapAddr)
          buf.putInt(gIndexOf((name, i)))
        }
        val dt = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        dt.put(0x19.toByte).put(0x01.toByte).put(0.toByte).put(0.toByte)
        dt.putInt(16)
        // embedded base type: 1-byte string
        dt.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(1)
        val layout = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
        layout.put(3.toByte).put(1.toByte).putLong(dataAddr.toLong).putLong(16L * values.length)
        headerAddrs(key) = objectHeader(Seq(
          message(0x0001, dataspace(Seq(values.length.toLong))),
          message(0x0003, dt.array()),
          message(0x0008, layout.array())))
      case RefArray(_, h5dims, targets, mclass) =>
        pad8()
        val dataAddr = buf.position()
        targets.foreach(_ => buf.putLong(0L)) // patched once headers exist
        refPatches += ((dataAddr, key, targets))
        val dt = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        dt.put(0x17.toByte) // version 1, class 7 (reference)
        dt.put(0x00.toByte).put(0.toByte).put(0.toByte) // rtype 0 = object ref
        dt.putInt(8)
        val layout = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
        layout.put(3.toByte).put(1.toByte).putLong(dataAddr.toLong)
          .putLong(8L * targets.length)
        headerAddrs(key) = objectHeader(Seq(
          message(0x0001, dataspace(h5dims)),
          message(0x0003, dt.array()),
          message(0x000c, matlabClassAttr(mclass)),
          message(0x0008, layout.array())))
      case Group(gname, children) =>
        val kids = children.sortBy(_.name)
        kids.foreach(c => writeOne(c, s"$gname/${c.name}"))
        // the group's own local heap + B-tree + SNOD, mirroring the root
        pad8()
        val gHeapDataSize = 8L + kids.map(_.name.length + 1).sum
        val gHeapAligned = (gHeapDataSize + 7) / 8 * 8
        val gHeapHeader = buf.position()
        val gHeapData = gHeapHeader + 32
        buf.put("HEAP".getBytes("US-ASCII")).put(0.toByte).put(new Array[Byte](3))
        buf.putLong(gHeapAligned)
        buf.putLong(1L) // no free block
        buf.putLong(gHeapData.toLong)
        val gNameOff = scala.collection.mutable.Map.empty[String, Long]
        val gHeapStart = buf.position()
        buf.put(new Array[Byte](8))
        for (c <- kids) {
          gNameOff(c.name) = buf.position() - gHeapStart
          buf.put(c.name.getBytes("US-ASCII")).put(0.toByte)
        }
        buf.position(gHeapStart + gHeapAligned.toInt)
        pad8()
        val gBtree = buf.position()
        buf.put("TREE".getBytes("US-ASCII"))
        buf.put(0.toByte).put(0.toByte)
        buf.putShort(1.toShort)
        buf.putLong(Undef).putLong(Undef)
        val gSnodPos = buf.position() + 8
        buf.putLong(0L) // key0
        buf.putLong(0L) // child0 -> patched to the SNOD
        buf.putLong(gNameOff(kids.last.name)) // keyN
        pad8()
        val gSnod = buf.position()
        buf.put("SNOD".getBytes("US-ASCII")).put(1.toByte).put(0.toByte)
        buf.putShort(kids.size.toShort)
        val gEntryPos = buf.position()
        buf.position(gEntryPos + 40 * kids.size)
        buf.putLong(gSnodPos, gSnod.toLong)
        for ((c, k) <- kids.zipWithIndex) {
          val e = gEntryPos + 40 * k
          buf.putLong(e, gNameOff(c.name))
          buf.putLong(e + 8, headerAddrs(s"$gname/${c.name}"))
          buf.putInt(e + 16, 0)
          buf.putInt(e + 20, 0)
        }
        val st = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        st.putLong(gBtree.toLong).putLong(gHeapHeader.toLong)
        headerAddrs(key) = objectHeader(Seq(message(0x0011, st.array())))
    }

    for (ds <- sorted) writeOne(ds, ds.name)

    // ---- patch reference-array payloads (targets may be group children
    // written after the RefArray; sentinels exercise the reader's
    // dangling/cyclic rejects)
    for ((dataAddr, ownKey, targets) <- refPatches.result();
         (t, i) <- targets.zipWithIndex) {
      val addr = t match {
        case "<self>" => headerAddrs(ownKey)
        case "<dangling>" => 0x7ffffff0L
        case "<zero>" => 0L
        case other => headerAddrs(other)
      }
      buf.putLong(dataAddr + 8 * i, addr)
    }

    // ---- SNOD entries now that header addresses are known
    for ((ds, k) <- sorted.zipWithIndex) {
      val e = entryPos + 40 * k
      buf.putLong(e, nameOffsets(ds.name))
      buf.putLong(e + 8, headerAddrs(ds.name))
      buf.putInt(e + 16, 0) // cache type 0
      buf.putInt(e + 20, 0)
      // scratch already zero
    }

    // ---- root group object header (symbol table message)
    val st = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    st.putLong(btreeAddr.toLong).putLong(heapHeaderAddr.toLong)
    val rootHeaderAddr = objectHeader(Seq(message(0x0011, st.array())))

    val eof = buf.position()

    // ---- superblock
    buf.position(0)
    buf.put(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
    buf.put(0.toByte) // superblock v0
    buf.put(0.toByte).put(0.toByte).put(0.toByte) // fs, root-group, reserved
    buf.put(0.toByte) // shared header version
    buf.put(8.toByte).put(8.toByte).put(0.toByte) // offset/length sizes
    buf.putShort(4.toShort).putShort(16.toShort) // leaf/internal k
    buf.putInt(0) // consistency flags
    buf.putLong(0L) // base address
    buf.putLong(Undef) // free-space
    buf.putLong(eof.toLong)
    buf.putLong(Undef) // driver info
    // root symbol table entry
    buf.putLong(0L) // link name offset
    buf.putLong(rootHeaderAddr)
    buf.putInt(1) // cache type 1
    buf.putInt(0)
    buf.putLong(btreeAddr.toLong).putLong(heapHeaderAddr.toLong)

    val out = new Array[Byte](eof)
    buf.position(0)
    buf.get(out)
    out
  }
}
