package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5 HDF5 `.h5` source (SURVEY.md §2.1): CNN classifier results arrive
  * as flat HDF5 files — root-group datasets `classifier_name`,
  * `class_labels`, `output_scores`, `roi_numbers`, `thresholds` &c.
  * (reference: code/convert_h5_to_irfcb_format.R:38-66).
  *
  * Minimal HDF5 reader implemented from the public "HDF5 File Format
  * Specification Version 3.0" for the subset those files use:
  * superblock v0, v1 object headers, symbol-table root group (B-tree v1 +
  * local heap + SNOD), contiguous / compact / chunked(+deflate) data
  * layouts, little-endian fixed-point and IEEE-float datatypes,
  * fixed-length strings, and variable-length strings via the global heap.
  * This matches what rhdf5 / hdf5r / h5py write in their default
  * ("earliest-compatible") mode; v2+ superblocks are out of scope and
  * rejected loudly.
  *
  * Spark shape: same as [[MatSource]] — per-bin files via `binaryFile`,
  * parsed inside executors (one file = one task), exploded to relational
  * rows; nothing HDF5-shaped leaks past this module.
  */
object H5Source {

  sealed trait H5Value
  final case class H5Num(dims: Seq[Long], data: Array[Double]) extends H5Value
  final case class H5Str(dims: Seq[Long], data: Array[String]) extends H5Value
  /** An object-reference dataset (datatype class 7), resolved: each
    * referenced object header is read as a dataset and carried with its
    * own attributes — the shape MATLAB's `-v7.3` writer uses for cell
    * arrays (references into the `/#refs#` group, each target typed by
    * its own MATLAB_class). Resolution follows the reference ADDRESS,
    * so targets parse wherever they live; the `/#refs#` group entry
    * itself is just a root-group member this reader already skips
    * (groups carry no dataspace).
    */
  final case class H5Cell(dims: Seq[Long],
      items: Seq[(H5Value, Map[String, String])]) extends H5Value
  /** Raw unresolved reference addresses — internal decode product only;
    * [[readDataset]] resolves it to [[H5Cell]] before returning.
    */
  private final case class H5Ref(dims: Seq[Long], addrs: Array[Long]) extends H5Value

  private val Signature = Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte)
  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF as signed

  /** Parses every root-group dataset of an HDF5 byte stream.
    *
    * Fail-loudly contract: structural damage surfaces as
    * [[IllegalArgumentException]] — never a raw buffer/index exception,
    * an unbounded-recursion stack overflow (cyclic B-tree pointers), or
    * an allocation sized from a corrupted length field (round-10 fuzz
    * hardening; exercised by H5FuzzSpec's byte-mutation corpus).
    */
  def parse(bytes: Array[Byte]): Map[String, H5Value] =
    parseWithAttrs(bytes).map { case (k, (v, _)) => k -> v }

  /** Like [[parse]], but each dataset also carries its fixed-string
    * scalar attributes — the subset MATLAB's `-v7.3` writer uses to
    * type variables (`MATLAB_class` = "char"/"double"/"cell"/…), which
    * [[MatSource]] needs to decode real v7.3 files correctly.
    *
    * `offset` positions the superblock inside `bytes` without copying
    * (HDF5 userblocks, e.g. MAT v7.3's 512-byte MAT header): every HDF5
    * address is relative to the superblock base, so a zero-copy slice
    * view parses identically — copying the multi-GB-capable v7.3 tail
    * just to rebase addresses doubled executor peak memory (round-13
    * review).
    */
  def parseWithAttrs(bytes: Array[Byte], offset: Int = 0): Map[String, (H5Value, Map[String, String])] = {
    require(offset >= 0 && bytes.length - offset > 96, "not an HDF5 file: too short")
    val buf = ByteBuffer.wrap(bytes, offset, bytes.length - offset)
      .slice().order(ByteOrder.LITTLE_ENDIAN)
    require((0 until 8).forall(i => buf.get(i) == Signature(i)),
      "not an HDF5 file: bad signature")
    try parseBody(buf)
    catch {
      case e: IllegalArgumentException => throw e
      case e: RuntimeException =>
        throw new IllegalArgumentException(s"malformed HDF5 file: $e", e)
    }
  }

  private def parseBody(buf: ByteBuffer): Map[String, (H5Value, Map[String, String])] = {
    val sbVersion = buf.get(8) & 0xff
    require(sbVersion == 0,
      s"unsupported superblock version $sbVersion (reader covers the v0 " +
        "earliest-compatible layout rhdf5/h5py write by default)")
    require((buf.get(13) & 0xff) == 8 && (buf.get(14) & 0xff) == 8,
      "unsupported offset/length size (only 8/8)")
    // root group symbol table entry at offset 24 + 32
    val rootEntry = 56
    val rootHeader = buf.getLong(rootEntry + 8)
    val (btreeAddr, heapAddr) = symbolTableOf(buf, rootHeader)
    // insertion-ordered: MatSource's class2use fallback documents "the
    // file's first cell variable" (SNOD entries are name-sorted, so
    // "first" = alphabetical here — but deterministically so)
    val out = scala.collection.immutable.VectorMap
      .newBuilder[String, (H5Value, Map[String, String])]
    for (snod <- btreeChildren(buf, btreeAddr)) {
      // the child address must actually hold a symbol node: a corrupt
      // pointer whose low 32 bits land on unrelated in-file bytes would
      // otherwise read a garbage count and garbage entries (the
      // heapString/contiguous-extent guard class, round-14 review)
      require(sig(buf, snod) == "SNOD", s"expected SNOD at $snod")
      val n = buf.getShort(snod.toInt + 6) & 0xffff
      require(snod + 8 + 40L * n <= buf.limit(),
        s"symbol node at $snod claims $n entries past file end")
      for (k <- 0 until n) {
        val e = snod.toInt + 8 + 40 * k
        val nameOff = buf.getLong(e)
        val objAddr = buf.getLong(e + 8)
        val name = heapString(buf, heapAddr, nameOff)
        readDatasetAndAttrs(buf, objAddr).foreach(out += name -> _)
      }
    }
    out.result()
  }

  /** Marker key in an attribute map: an attribute message of a version
    * this reader doesn't decode was skipped (value = that version).
    * Consumers that TYPE data by attribute ([[MatSource]]'s
    * MATLAB_class) must treat its presence without a readable
    * MATLAB_class as un-typeable — a v7.3 uint16 char variable whose
    * MATLAB_class hid in a v2+ attribute message would otherwise fall
    * through to the numeric path and silently read as numbers
    * (round-13 ADVICE).
    */
  val SkippedAttr = "__skipped_attribute_version__"

  /** Fixed-string scalar attributes of an object header (message type
    * 0x000C, v1) — the subset MATLAB's v7.3 writer uses (MATLAB_class).
    * Attributes of any other datatype class or message version are
    * SKIPPED, not rejected: attributes are auxiliary metadata, and an
    * exotic one must not refuse a file whose datasets parse (the
    * dataset path keeps its own fail-loudly contract). Skipped message
    * VERSIONS are surfaced under [[SkippedAttr]] so typing consumers
    * can refuse rather than guess.
    */
  private def stringAttrs(buf: ByteBuffer, msgs: Seq[(Int, Int, Int)]): Map[String, String] = {
    def pad8(n: Int): Int = (n + 7) / 8 * 8
    msgs.flatMap {
      case (0x000c, off, _) if (buf.get(off) & 0xff) == 1 =>
        val nameSize = buf.getShort(off + 2) & 0xffff
        val dtSize = buf.getShort(off + 4) & 0xffff
        val dsSize = buf.getShort(off + 6) & 0xffff
        var p = off + 8
        val rawName = Array.tabulate(nameSize)(i => buf.get(p + i))
        val name = new String(rawName, "US-ASCII").takeWhile(_ != 0.toChar)
        p += pad8(nameSize)
        val clazz = buf.get(p) & 0x0f
        val vSize = buf.getInt(p + 4)
        p += pad8(dtSize) + pad8(dsSize)
        // class 3 = fixed string (MATLAB_class); class 0 = fixed-point
        // scalar (MATLAB_empty is a uint8 flag), rendered as its decimal
        // value. The 4 KiB cap bounds the copy on a corrupt size field
        // (a real MATLAB_class value is ~6 bytes).
        if (clazz == 3 && vSize > 0 && vSize <= 4096) {
          val v = Array.tabulate(vSize)(i => buf.get(p + i))
          Some(name -> new String(v, "US-ASCII").takeWhile(_ != 0.toChar))
        } else if (clazz == 0 && Seq(1, 2, 4, 8).contains(vSize)) {
          val v = vSize match {
            case 1 => (buf.get(p) & 0xff).toLong
            case 2 => (buf.getShort(p) & 0xffff).toLong
            case 4 => buf.getInt(p) & 0xffffffffL
            case 8 => buf.getLong(p)
          }
          Some(name -> v.toString)
        } else
          // a v1 attribute of an UNDECODED datatype class is as opaque
          // to a typing consumer as an unknown message version: without
          // the marker, a MATLAB_class stored as e.g. a vlen string
          // (h5py str attrs) silently reaches the untyped numeric
          // fallback (round-14 review)
          Some(SkippedAttr -> s"v1-class-$clazz")
      case (0x000c, off, _) =>
        Some(SkippedAttr -> ((buf.get(off) & 0xff).toString))
      case _ => None
    }.toMap
  }

  /** One header walk serving both the dataset decode and its attributes
    * (round-14 review: readDataset + a second stringAttrs pass parsed
    * every header — and every /#refs# cell target — twice).
    */
  private def readDatasetAndAttrs(buf: ByteBuffer, addr: Long,
      depth: Int = 0): Option[(H5Value, Map[String, String])] = {
    val msgs = messages(buf, addr)
    readDataset(buf, addr, depth, Some(msgs)).map(v => (v, stringAttrs(buf, msgs)))
  }

  /** Walks a v1 group B-tree, returning SNOD addresses left to right.
    * Depth-capped: a corrupted child pointer can form a cycle, and the
    * format's own node levels bound any genuine tree far below 64.
    */
  private def btreeChildren(buf: ByteBuffer, addr: Long, depth: Int = 0): Seq[Long] = {
    require(depth < 64, s"group B-tree deeper than 64 at $addr: cyclic node pointers")
    require(sig(buf, addr) == "TREE", s"expected TREE at $addr")
    val level = buf.get(addr.toInt + 5) & 0xff
    val used = buf.getShort(addr.toInt + 6) & 0xffff
    val kids = (0 until used).map { i =>
      // entries: key0(8) child0(8) key1(8) ... — children at +8 skip key0
      buf.getLong(addr.toInt + 24 + 8 + i * 16)
    }
    if (level == 0) kids else kids.flatMap(btreeChildren(buf, _, depth + 1))
  }

  private def sig(buf: ByteBuffer, addr: Long): String = {
    // range-check the FULL Long before the Int truncation: a corrupt
    // address like 0x1_00000200 would otherwise wrap mod 2^32 and read
    // a signature from an unrelated in-file position (round-14 review)
    require(addr >= 0 && addr + 4 <= buf.limit(),
      s"structure address $addr outside file of ${buf.limit()} bytes")
    new String(Array(buf.get(addr.toInt), buf.get(addr.toInt + 1),
      buf.get(addr.toInt + 2), buf.get(addr.toInt + 3)), "US-ASCII")
  }

  private def heapString(buf: ByteBuffer, heapAddr: Long, off: Long): String = {
    require(sig(buf, heapAddr) == "HEAP", s"expected HEAP at $heapAddr")
    val dataAddr = buf.getLong(heapAddr.toInt + 24)
    // Long-range bound BEFORE the Int truncation: a corrupt heap data
    // address or name offset above 2³² would otherwise wrap mod 2³²,
    // scan NUL-terminated bytes at some unrelated in-file position and
    // return a silently wrong name (round-12 review — the contiguous
    // layout's guard class, applied here)
    val start = dataAddr + off
    require(dataAddr >= 0 && off >= 0 && start >= 0 && start < buf.limit(),
      s"heap string at $dataAddr+$off outside file of ${buf.limit()} bytes")
    var p = start.toInt
    val sb = new StringBuilder
    while (buf.get(p) != 0) { sb.append(buf.get(p).toChar); p += 1 }
    sb.toString
  }

  /** All (type, body-offset, body-size) messages of a v1 object header,
    * following continuation blocks: the first block ends at prefix +
    * header-size; when the cursor would cross a block boundary, reading
    * resumes at the pending continuation's address.
    */
  private def messages(buf: ByteBuffer, addr: Long): Seq[(Int, Int, Int)] = {
    require(addr >= 0 && addr + 16 <= buf.limit(),
      s"object header address $addr outside file of ${buf.limit()} bytes")
    val version = buf.get(addr.toInt) & 0xff
    require(version == 1, s"unsupported object header version $version")
    val nMsgs = buf.getShort(addr.toInt + 2) & 0xffff
    val headerSize = buf.getInt(addr.toInt + 8)
    val out = Seq.newBuilder[(Int, Int, Int)]
    var p = addr.toInt + 16 // 12-byte prefix + 4 pad: messages are 8-aligned
    var limit = p + headerSize
    var remaining = nMsgs
    var continuation: Option[(Long, Long)] = None
    while (remaining > 0) {
      if (p + 8 > limit) {
        val (ca, cs) = continuation.getOrElse(
          throw new IllegalArgumentException(
            s"object header at $addr: ran past block end with $remaining messages left"))
        // Long-range check BEFORE truncating to Int (the sig/heapString
        // guard class, round-15 review): a corrupt continuation address
        // past 2^31 whose low 32 bits land in-file would silently parse
        // unrelated bytes as header messages. Overflow-safe form
        // (round-16 advice): `ca + cs <= limit` wraps negative when
        // both sit near 2^62 and PASSES — bound each term first, then
        // the sum via subtraction on the already-bounded side.
        require(ca >= 0 && cs >= 0 && ca <= buf.limit() &&
            cs <= buf.limit() - ca,
          s"object header at $addr: continuation block [$ca, +$cs) " +
            s"outside file of ${buf.limit()} bytes")
        p = ca.toInt
        limit = (ca + cs).toInt
        continuation = None
      }
      val tpe = buf.getShort(p) & 0xffff
      val size = buf.getShort(p + 2) & 0xffff
      if (tpe == 0x0010) { // continuation: body = address(8) + length(8)
        continuation = Some((buf.getLong(p + 8), buf.getLong(p + 16)))
      } else {
        out += ((tpe, p + 8, size))
      }
      p += 8 + size
      remaining -= 1
    }
    out.result()
  }

  private def symbolTableOf(buf: ByteBuffer, headerAddr: Long): (Long, Long) =
    messages(buf, headerAddr).collectFirst {
      case (0x0011, off, _) => (buf.getLong(off), buf.getLong(off + 8))
    }.getOrElse(throw new IllegalArgumentException("root group: no symbol table message"))

  private final case class Datatype(clazz: Int, size: Int, signed: Boolean)

  /** Max depth of object-reference chains: a corrupt or hostile file can
    * make a reference dataset point at itself (or form a longer cycle);
    * genuine MATLAB cell nesting is far shallower than 16.
    */
  private val MaxRefDepth = 16

  private def readDataset(buf: ByteBuffer, addr: Long, depth: Int = 0,
      preParsed: Option[Seq[(Int, Int, Int)]] = None): Option[H5Value] = {
    require(depth < MaxRefDepth,
      s"object-reference chain deeper than $MaxRefDepth at $addr: cyclic references")
    val msgs = preParsed.getOrElse(messages(buf, addr))
    val dims: Seq[Long] = msgs.collectFirst { case (0x0001, off, _) =>
      // version gate (round-15 review): a v2 dataspace drops the
      // reserved bytes, so dims start at off+4 — reading the v1 layout
      // against it straddles dim values into silently-garbage shapes
      val dsVersion = buf.get(off) & 0xff
      require(dsVersion == 1,
        s"unsupported dataspace message version $dsVersion (v1 only)")
      val rank = buf.get(off + 1) & 0xff
      (0 until rank).map(i => buf.getLong(off + 8 + 8 * i))
    }.getOrElse(return None)
    val dt: Datatype = msgs.collectFirst { case (0x0003, off, _) =>
      val cv = buf.get(off) & 0xff
      val clazz = cv & 0x0f
      val bits0 = buf.get(off + 1) & 0xff
      val size = buf.getInt(off + 4)
      // byte-order bit (round-12 review): decode() reads through a
      // LITTLE_ENDIAN buffer, so a big-endian dataset ('>f8') would
      // silently decode to garbage (1.0 reads as ~3e-319) — reject
      // loudly per the module's out-of-scope contract
      require(clazz > 1 || (bits0 & 0x01) == 0,
        s"big-endian datatype (class $clazz): only little-endian " +
          "fixed/float datasets are in scope")
      Datatype(clazz, size, (bits0 & 0x08) != 0)
    }.getOrElse(return None)
    val filters: Seq[Int] = msgs.collectFirst { case (0x000b, off, _) =>
      // v2 drops the reserved bytes and the name-length field for
      // standard filters — parsing it with the v1 layout misreads every
      // filter id (round-15 review)
      val fpVersion = buf.get(off) & 0xff
      require(fpVersion == 1,
        s"unsupported filter pipeline version $fpVersion (v1 only)")
      val n = buf.get(off + 1) & 0xff
      // v1 filter pipeline: 8-byte header then filter descriptions; we
      // only need the filter ids (deflate = 1)
      var p = off + 8
      (0 until n).map { _ =>
        val id = buf.getShort(p) & 0xffff
        val nameLen = buf.getShort(p + 2) & 0xffff
        val nVals = buf.getShort(p + 6) & 0xffff
        var sz = 8 + nameLen + 4 * nVals
        if (nVals % 2 == 1) sz += 4 // pad to 8
        p += sz
        id
      }
    }.getOrElse(Seq.empty)
    val raw: Array[Byte] = msgs.collectFirst { case (0x0008, off, _) =>
      val version = buf.get(off) & 0xff
      require(version == 3, s"unsupported data layout version $version")
      (buf.get(off + 1) & 0xff) match {
        case 0 => // compact: size(2) + data
          val n = buf.getShort(off + 2) & 0xffff
          val a = new Array[Byte](n)
          for (i <- 0 until n) a(i) = buf.get(off + 4 + i)
          a
        case 1 => // contiguous: address(8) + size(8)
          val dataAddr = buf.getLong(off + 2)
          val n = buf.getLong(off + 10)
          // deferred allocation leaves the address undefined while the
          // dataspace still claims the full shape; an empty array here
          // would make consumers index past the data — reject loudly
          require(dataAddr != Undef || Dims.product(dims, "dataset") == 0L,
            s"dataset has undefined data address but claims dims $dims")
          if (dataAddr == Undef) new Array[Byte](0)
          else {
            // a corrupted size field must not drive a multi-GiB
            // allocation before the read even fails — contiguous data
            // cannot exceed the file itself, and the full extent
            // [dataAddr, dataAddr+n) must lie inside it (address checked
            // too, or the element loop would only die later with a raw
            // IndexOutOfBounds whose message reports a buffer index
            // instead of this diagnostic)
            require(n >= 0 && n <= buf.limit() &&
                dataAddr >= 0 && dataAddr <= buf.limit() - n,
              s"contiguous data extent [$dataAddr, ${dataAddr + n}) " +
                s"exceeds file size ${buf.limit()}")
            val a = new Array[Byte](n.toInt)
            // one memcpy, not tens of millions of per-index get()
            // calls on the per-file hot path (round-12 review)
            System.arraycopy(buf.array(), buf.arrayOffset() + dataAddr.toInt, a, 0, n.toInt)
            a
          }
        case 2 => // chunked: dimensionality(1) btree(8) dims(4 each) elem(4)
          // deflate (1), shuffle (2) and fletcher32 (3) are implemented —
          // h5py/Keras write chunked CNN-scores datasets with
          // shuffle=True + gzip by default, fletcher32 opt-in (the shape
          // the reference converts at convert_h5_to_irfcb_format.R:38-66);
          // silently skipping an unknown filter would decode shifted
          // bytes, so anything else still rejects loudly
          require(filters.forall(f => f == 1 || f == 2 || f == 3),
            s"unsupported filter pipeline $filters " +
              "(deflate + shuffle + fletcher32 are implemented)")
          val ndims = buf.get(off + 2) & 0xff // rank + 1
          val btree = buf.getLong(off + 3)
          val chunkDims = (0 until ndims - 1).map(i => buf.getInt(off + 11 + 4 * i).toLong)
          readChunked(buf, btree, dims, chunkDims, dt.size, filters)
        case c => throw new IllegalArgumentException(s"unsupported layout class $c")
      }
    }.getOrElse(return None)
    decode(buf, dt, dims, raw) match {
      case H5Ref(rdims, addrs) => Some(resolveRefs(buf, rdims, addrs, depth))
      case v => Some(v)
    }
  }

  /** Resolves each object-reference address to (dataset value, string
    * attributes). Fail-loudly contract for the reference chain:
    * - dangling reference (address 0/undefined, outside the file, or not
    *   a parseable object header) → IllegalArgumentException;
    * - target that is not a dataset (e.g. a group header) → reject with
    *   the address — a cell element must be data, silently skipping it
    *   would shift every later element's index;
    * - cyclic references → the [[MaxRefDepth]] cap fires.
    */
  private def resolveRefs(buf: ByteBuffer, dims: Seq[Long],
      addrs: Array[Long], depth: Int): H5Cell = {
    val items = addrs.toSeq.map { a =>
      // a full v1 header PREFIX (12 bytes + alignment pad) must fit, not
      // just the address byte: a near-EOF reference otherwise dies in
      // messages() with a buffer-index diagnostic instead of this one
      require(a > 0 && a <= buf.limit() - 16L,
        s"dangling object reference: address $a outside file of ${buf.limit()} bytes")
      readDatasetAndAttrs(buf, a, depth + 1).getOrElse(
        throw new IllegalArgumentException(
          s"object reference target at $a is not a dataset (a group or " +
            "dataless header): corrupt cell element"))
    }
    H5Cell(dims, items)
  }

  /** Reassembles a chunked dataset from its v1 raw-data B-tree (node type
    * 1), inflating deflate-filtered chunks. Chunk keys carry the chunk's
    * logical offset; data is copied element-wise into the row-major
    * output (edge chunks may overhang).
    */
  private def readChunked(buf: ByteBuffer, btree: Long, dims: Seq[Long],
                          chunkDims: Seq[Long], elemSize: Int,
                          filters: Seq[Int]): Array[Byte] = {
    // overflow-safe product (Dims.product): a bare dims.product can wrap
    // a Long in ONE step (dims [2, 2^62]) and slip a negative or small
    // "total" under this cap, deferring the failure to a raw AIOOBE in
    // copyChunk — outside the fail-loudly contract (round-12 ADVICE)
    val count = Dims.product(dims, "chunked dataset")
    // per-bin datasets are tens of MB; the reference's own oversize-bin
    // guard skips files past 1 GiB (extract_features.R:61), so a claimed
    // shape above that is corruption, not data — reject before allocating
    // (divide-form bound so count*elemSize itself cannot wrap)
    require(elemSize > 0 && count <= (1L << 30) / elemSize,
      s"chunked dataset claims $count x $elemSize bytes (dims $dims): corrupt shape")
    val totalL = count * elemSize
    val total = totalL.toInt
    val out = new Array[Byte](total)
    // chunk dims come from the (untrusted) layout message too — the
    // same overflow-safe product + cap before any chunk-sized math
    val chunkPayload = {
      val c = Dims.product(chunkDims, "chunk")
      require(c <= (1L << 30) / elemSize,
        s"chunk claims $c x $elemSize bytes (chunk dims $chunkDims): corrupt shape")
      (c * elemSize).toInt
    }
    // a chunked dataset allocated but never written stores an undefined
    // B-tree address (chunks allocate lazily); libhdf5 reads it as all
    // fill-value — mirror that instead of crashing on sig(buf, -1) and
    // rejecting a valid file (round-13 review)
    if (btree == Undef) return out
    def walk(addr: Long, depth: Int): Unit = {
      require(depth < 64, s"chunk B-tree deeper than 64 at $addr: cyclic node pointers")
      require(sig(buf, addr) == "TREE", s"expected TREE at $addr")
      val level = buf.get(addr.toInt + 5) & 0xff
      val used = buf.getShort(addr.toInt + 6) & 0xffff
      // node type 1 keys: size(4) mask(4) + (rank+1) offsets of 8
      val keySize = 8 + 8 * (chunkDims.size + 1)
      var p = addr.toInt + 24
      for (_ <- 0 until used) {
        val chunkBytes = buf.getInt(p)
        // per-chunk filter mask: bit i set = pipeline filter i was
        // SKIPPED for this chunk (libhdf5 stores an incompressible
        // chunk raw when deflate is registered optional — the fixture
        // itself writes flags=1 "optional"); ignoring the mask would
        // inflate raw bytes and reject a valid file (round-13 review)
        val filterMask = buf.getInt(p + 4)
        val offsets = (0 until chunkDims.size).map(i => buf.getLong(p + 8 + 8 * i))
        val child = buf.getLong(p + keySize)
        if (level > 0) walk(child, depth + 1)
        else {
          require(chunkBytes >= 0 && chunkBytes <= buf.limit(),
            s"chunk size $chunkBytes exceeds file size ${buf.limit()}")
          // Long-range check on the chunk address BEFORE the Int
          // truncation: a corrupt child pointer with its low 32 bits
          // in-file would otherwise copy unrelated bytes as the chunk
          // and decode plausible-looking garbage (round-12 review —
          // the contiguous layout applies exactly this guard)
          require(child >= 0 && child <= buf.limit().toLong - chunkBytes,
            s"chunk data extent [$child, ${child + chunkBytes}) " +
              s"exceeds file size ${buf.limit()}")
          var data = new Array[Byte](chunkBytes)
          System.arraycopy(buf.array(), buf.arrayOffset() + child.toInt, data, 0, chunkBytes)
          // the pipeline message lists filters in WRITE application
          // order (shuffle, then deflate); reading inverts each in
          // reverse order — inflate first, then un-shuffle — skipping
          // any filter whose mask bit marks it skipped at write time
          for (i <- filters.indices.reverse if (filterMask & (1 << i)) == 0)
            filters(i) match {
              case 1 => data = inflate(data)
              case 2 => data = unshuffle(data, elemSize)
              case 3 => data = defletcher(data)
              case f => throw new IllegalArgumentException(s"filter $f") // unreachable: guarded at layout parse
            }
          // a full chunk payload is stored even for edge chunks; a
          // short filter-chain result (truncated deflate stream,
          // hostile chunkDims) would otherwise die in copyChunk with
          // a raw AIOOBE outside the fail-loudly contract
          require(data.length >= chunkPayload,
            s"chunk decodes to ${data.length} bytes, " +
              s"needs $chunkPayload (chunk dims $chunkDims x $elemSize)")
          copyChunk(out, data, dims, chunkDims, offsets, elemSize)
        }
        p += keySize + 8
      }
    }
    walk(btree, 0)
    out
  }

  private def copyChunk(out: Array[Byte], chunk: Array[Byte], dims: Seq[Long],
                        chunkDims: Seq[Long], offs: Seq[Long], elemSize: Int): Unit = {
    val rank = dims.size
    if (rank == 1) {
      val n = math.min(chunkDims(0), dims(0) - offs(0)).toInt
      System.arraycopy(chunk, 0, out, offs(0).toInt * elemSize, n * elemSize)
    } else if (rank == 2) {
      val rows = math.min(chunkDims(0), dims(0) - offs(0)).toInt
      val cols = math.min(chunkDims(1), dims(1) - offs(1)).toInt
      for (r <- 0 until rows) {
        val src = (r * chunkDims(1)).toInt * elemSize
        val dst = ((offs(0) + r) * dims(1) + offs(1)).toInt * elemSize
        System.arraycopy(chunk, src, out, dst, cols * elemSize)
      }
    } else throw new IllegalArgumentException(s"chunked rank $rank unsupported")
  }

  private def inflate(data: Array[Byte]): Array[Byte] =
    Zlib.inflate(data, "HDF5 deflate chunk")

  /** Verifies and strips the fletcher32 filter (id 3): the chunk carries
    * a trailing 4-byte little-endian Fletcher-32 checksum over the
    * preceding bytes. A mismatch IS detected corruption — the filter's
    * whole purpose — so it rejects loudly rather than decoding damaged
    * data.
    */
  private def defletcher(data: Array[Byte]): Array[Byte] = {
    require(data.length >= 4,
      s"fletcher32 chunk of ${data.length} bytes: no room for the checksum")
    val payload = java.util.Arrays.copyOfRange(data, 0, data.length - 4)
    val stored = (data(data.length - 4) & 0xffL) |
      ((data(data.length - 3) & 0xffL) << 8) |
      ((data(data.length - 2) & 0xffL) << 16) |
      ((data(data.length - 1) & 0xffL) << 24)
    val computed = fletcher32(payload)
    require(computed == stored,
      f"fletcher32 checksum mismatch: stored 0x$stored%08x, " +
        f"computed 0x$computed%08x — corrupt chunk")
    payload
  }

  /** HDF5's Fletcher-32 variant (public H5_checksum_fletcher32): running
    * sums over big-endian 16-bit words, modular 16-bit reduction every
    * 360 words (the largest run that cannot overflow 32 bits), an odd
    * trailing byte treated as the high byte of a final word, and a
    * closing double reduction of each sum.
    */
  private def fletcher32(data: Array[Byte]): Long = {
    var sum1 = 0L
    var sum2 = 0L
    var i = 0
    var remaining = data.length / 2
    while (remaining > 0) {
      var tlen = math.min(remaining, 360)
      remaining -= tlen
      while (tlen > 0) {
        sum1 += ((data(i) & 0xff) << 8) | (data(i + 1) & 0xff)
        sum2 += sum1
        i += 2
        tlen -= 1
      }
      sum1 = (sum1 & 0xffff) + (sum1 >> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    }
    if (data.length % 2 == 1) {
      sum1 += (data(data.length - 1) & 0xff) << 8
      sum2 += sum1
      sum1 = (sum1 & 0xffff) + (sum1 >> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    }
    sum1 = (sum1 & 0xffff) + (sum1 >> 16)
    sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    (sum2 << 16) | sum1
  }

  /** Inverse of the HDF5 shuffle filter (id 2): the filter stores byte 0
    * of every element, then byte 1 of every element, … (a plain
    * byte-matrix transpose); the inverse interleaves them back. No-op
    * for 1-byte elements, matching the filter's definition.
    */
  private def unshuffle(data: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return data
    require(data.length % elemSize == 0,
      s"shuffled chunk of ${data.length} bytes is not a multiple of element size $elemSize")
    val n = data.length / elemSize
    val out = new Array[Byte](data.length)
    var i = 0
    while (i < elemSize) {
      val base = i * n
      var j = 0
      while (j < n) {
        out(j * elemSize + i) = data(base + j)
        j += 1
      }
      i += 1
    }
    out
  }

  private def decode(buf: ByteBuffer, dt: Datatype, dims: Seq[Long], raw: Array[Byte]): H5Value = {
    // cross-check the dataspace's claimed shape against the
    // independently-sized raw data HERE, inside the parse wrapper:
    // consumers (classScores) index by dims, and a dataset whose layout
    // stores fewer bytes than dims x element-size would otherwise die
    // with a raw AIOOBE in the executor (round-11 review). Division
    // form avoids overflow on corrupt sizes.
    require(dt.size > 0, s"datatype element size ${dt.size}")
    val claimed = Dims.product(dims, "dataset")
    val elemBytes = if (dt.clazz == 9) 16L else dt.size.toLong
    require(claimed <= raw.length / elemBytes,
      s"dataset claims dims $dims ($claimed elements x $elemBytes B) " +
        s"but the data layout holds ${raw.length} bytes")
    val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    dt.clazz match {
      case 0 => // fixed-point
        val n = raw.length / dt.size
        val out = new Array[Double](n)
        for (i <- 0 until n) out(i) = dt.size match {
          case 1 => if (dt.signed) raw(i).toDouble else (raw(i) & 0xff).toDouble
          case 2 => if (dt.signed) b.getShort(i * 2).toDouble else (b.getShort(i * 2) & 0xffff).toDouble
          case 4 => if (dt.signed) b.getInt(i * 4).toDouble else (b.getInt(i * 4).toLong & 0xffffffffL).toDouble
          case 8 =>
            val v = b.getLong(i * 8)
            // uint64 past 2^63 must not wrap negative (round-15 review;
            // the sizes-1/2/4 branches already honor the signed flag)
            if (dt.signed || v >= 0) v.toDouble
            else v.toDouble + 1.8446744073709552E19
          case s => throw new IllegalArgumentException(s"fixed-point size $s")
        }
        H5Num(dims, out)
      case 1 => // IEEE float
        val n = raw.length / dt.size
        val out = new Array[Double](n)
        for (i <- 0 until n) out(i) =
          if (dt.size == 4) b.getFloat(i * 4).toDouble else b.getDouble(i * 8)
        H5Num(dims, out)
      case 3 => // fixed-length string
        val n = if (dims.isEmpty) 1 else dims.product.toInt
        val out = Array.tabulate(n) { i =>
          val s = new String(raw, i * dt.size, dt.size, "UTF-8")
          val z = s.indexOf('\u0000')
          if (z >= 0) s.substring(0, z) else s
        }
        H5Str(dims, out)
      case 7 => // reference: 8-byte object-header addresses (rtype 0).
        // Region references (rtype 1) are 12 bytes — the size check
        // rejects them loudly rather than mis-framing the address array.
        require(dt.size == 8,
          s"reference datatype of ${dt.size} bytes: only 8-byte object " +
            "references (the MATLAB v7.3 cell shape) are in scope")
        val nr = raw.length / 8
        H5Ref(dims, Array.tabulate(nr)(i => b.getLong(i * 8)))
      case 9 => // variable-length string: len(4) + gheap addr(8) + index(4)
        val n = raw.length / 16
        val out = Array.tabulate(n) { i =>
          val len = b.getInt(i * 16)
          val gaddr = b.getLong(i * 16 + 4)
          val idx = b.getInt(i * 16 + 12)
          globalHeapObject(buf, gaddr, idx, len)
        }
        H5Str(dims, out)
      case c => throw new IllegalArgumentException(s"unsupported datatype class $c")
    }
  }

  private def globalHeapObject(buf: ByteBuffer, addr: Long, index: Int, len: Int): String = {
    require(sig(buf, addr) == "GCOL", s"expected GCOL at $addr")
    val collSize = buf.getLong(addr.toInt + 8)
    var p = addr.toInt + 16
    val end = (addr + collSize).toInt
    while (p < end) {
      val idx = buf.getShort(p) & 0xffff
      val size = buf.getLong(p + 8)
      if (idx == index) {
        // the full extent [p+16, p+16+len) must be in-file, not just the
        // length — otherwise the byte loop dies with a raw
        // IndexOutOfBounds instead of this diagnostic
        require(len >= 0 && len <= buf.limit() && p + 16 <= buf.limit() - len,
          s"vlen string extent [${p + 16}, ${p + 16 + len}) " +
            s"exceeds file size ${buf.limit()}")
        val bytes = new Array[Byte](len)
        for (i <- 0 until len) bytes(i) = buf.get(p + 16 + i)
        return new String(bytes, "UTF-8")
      }
      if (idx == 0)
        throw new IllegalArgumentException( // free space ends the walk:
          s"global heap object $index not found before free space at $addr")
      // size must be non-negative (round-12 review): a corrupt size in
      // [-30, -23] rounds the padded advance to exactly 0 and the walk
      // would SPIN FOREVER — the hang/DoS failure mode every other walk
      // in this file caps against. Size 0 is legal (an empty vlen
      // string's object) and still advances the 16-byte header.
      require(size >= 0,
        s"global heap object at $p claims size $size: corrupt collection")
      p += 16 + ((size + 7) / 8 * 8).toInt
    }
    throw new IllegalArgumentException(s"global heap object $index not found at $addr")
  }

  // --- relational views ----------------------------------------------------

  /** CNN class-score files → long form: one row per (ROI, class) with the
    * score and per-class threshold (convert_h5_to_irfcb_format.R:47-55
    * schema: `output_scores` [nROI × nClass] row-major, `roi_numbers`,
    * `class_labels`, `thresholds`, scalar `classifier_name`).
    */
  def classScores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.h5").load(dir)
      .select(col("path"), col("content"))
    val rows = files.as[(String, Array[Byte])].flatMap { case (path, bytes) =>
      val sample = HdrSource.SampleIdPattern.r.findFirstIn(path).getOrElse(path)
      val vars = parse(bytes)
      val labels = vars.get("class_labels") match {
        case Some(H5Str(_, v)) => v
        case _ => Array.empty[String]
      }
      val thresholds = vars.get("thresholds") match {
        case Some(H5Num(_, v)) => v
        case _ => Array.empty[Double]
      }
      val classifier = vars.get("classifier_name") match {
        case Some(H5Str(_, v)) if v.nonEmpty => v(0)
        case _ => ""
      }
      val rois = vars.get("roi_numbers") match {
        case Some(H5Num(_, v)) => v.map(_.toInt)
        case _ => Array.empty[Int]
      }
      vars.get("output_scores") match {
        case Some(H5Num(Seq(nRoi, nClass), data)) =>
          for {
            r <- 0 until nRoi.toInt
            c <- 0 until nClass.toInt
          } yield (sample, classifier,
            if (r < rois.length) rois(r) else r + 1,
            if (c < labels.length) labels(c) else s"class_$c",
            data(r * nClass.toInt + c),
            if (c < thresholds.length) thresholds(c) else Double.NaN)
        case _ => Seq.empty
      }
    }
    rows.toDF("sample", "classifier", "roi_number", "class_name", "score", "threshold")
  }

  /** Top-scoring class per ROI, gated by the per-class threshold — the
    * `class_labels_above_threshold` view downstream deliveries consume.
    * The window keys on classifier too: a directory holding two
    * classifiers' result files for the same bin must yield each
    * classifier's own winner, not silently drop one.
    */
  def topClassPerRoi(scores: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NaN scores (a failed feature upstream) must neither WIN the window
    // nor pass the threshold gate: Spark orders NaN as the LARGEST
    // double, so a raw score.desc ranked a NaN first and nanSafeCompare
    // made `NaN >= threshold` true — the ROI delivered as that class
    // "above threshold" (round-14 review). NaN maps to null, which
    // desc_nulls_last ranks after every real score; an all-NaN ROI
    // still yields its row, gated to "unclassified".
    val cleanScore = when(!isnan(col("score")), col("score"))
    val w = Window.partitionBy(col("classifier"), col("sample"), col("roi_number"))
      .orderBy(cleanScore.desc_nulls_last, col("class_name").asc)
    scores
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("class_above_threshold",
        when(cleanScore >= col("threshold"), col("class_name"))
          .otherwise(lit("unclassified")))
      .drop("rn")
  }
}
