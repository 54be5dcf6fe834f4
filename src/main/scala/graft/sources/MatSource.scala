package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4 MATLAB `.mat` (Level 5) source (SURVEY.md §2.1): the reference
  * consumes `.mat` for classifier class lists, per-ROI score matrices and
  * manual annotations (`ifcb_get_mat_variable` call sites at
  * ifcb-data-pipeline.Rmd:859; code/annotations/compare_classlists.R:6-8).
  *
  * This is a minimal MAT-5 parser for the subset those files use —
  * numeric matrices (stored column-major), char arrays, cell arrays of
  * strings, zlib-compressed elements — implemented from the public
  * "MAT-File Format" specification. Little-endian files only (the
  * format's `IM` endian tag is checked).
  *
  * Spark shape: `.mat` files are small (per-bin); they arrive via
  * `binaryFile` and parse inside executors — one file = one task, the
  * same unit as the reference. Parsed variables explode to relational
  * rows; nothing MATLAB-shaped leaks past this module.
  */
object MatSource {

  sealed trait MatValue
  final case class MatNum(dims: Seq[Int], data: Array[Double]) extends MatValue
  final case class MatStr(value: String) extends MatValue
  final case class MatCell(dims: Seq[Int], items: Seq[MatValue]) extends MatValue

  /** Parses all top-level variables of a MAT-5 byte stream.
    *
    * Fail-loudly contract: any structural damage surfaces as
    * [[IllegalArgumentException]] — never a raw buffer-underflow /
    * index / decode exception, and never silently-wrong data the parser
    * could detect (round-10 fuzz hardening; exercised by MatFuzzSpec's
    * byte-mutation corpus).
    */
  def parse(bytes: Array[Byte]): Map[String, MatValue] = {
    require(bytes.length > 128, "not a MAT-5 file: too short")
    val endian = new String(bytes, 126, 2, "US-ASCII")
    require(endian == "IM", s"unsupported endianness tag: $endian")
    // header version field (bytes 124-125, file byte order): 0x0100 =
    // Level 5, 0x0200 = v7.3 (MATLAB writes -v7.3 for >2 GB variables:
    // an HDF5 container behind the same 128-byte text header)
    val version = ((bytes(125) & 0xff) << 8) | (bytes(124) & 0xff)
    version match {
      case 0x0100 =>
        try parseBody(bytes)
        catch {
          case e: IllegalArgumentException => throw e
          case e: RuntimeException =>
            throw new IllegalArgumentException(s"malformed MAT-5 file: $e", e)
        }
      case 0x0200 => parseV73(bytes)
      case v => throw new IllegalArgumentException(
        f"unsupported MAT header version 0x$v%04x (Level 5 and v7.3 are implemented)")
    }
  }

  /** MAT v7.3 = HDF5 container: the first 512 bytes are the HDF5
    * userblock carrying the MAT text header (version 0x0200), with the
    * HDF5 superblock at offset 512. HDF5 addresses are relative to the
    * superblock base, so the tail slice parses as a standalone HDF5
    * stream through the existing [[H5Source]] walker. MATLAB stores
    * arrays transposed (HDF5 row-major = MATLAB column-major), so dims
    * reverse on the way back while the flat data order is already the
    * column-major order [[MatNum]] consumers index. Subset: root
    * numeric/string datasets AND object-reference cell arrays (cellstr
    * class lists reference `/#refs#` targets, resolved by
    * [[H5Source.H5Cell]]) — the class-list/score shapes this module
    * serves; anything else rejects loudly inside the HDF5 walker.
    */
  private def parseV73(bytes: Array[Byte]): Map[String, MatValue] = {
    require(bytes.length > 512 + 96,
      "not a MAT v7.3 file: too short for the HDF5 payload at offset 512")
    H5Source.parseWithAttrs(bytes, offset = 512).map { case (name, (value, attrs)) =>
      // real MATLAB types its variables via the MATLAB_class attribute:
      // char arrays are stored as uint16 code-unit datasets (NOT HDF5
      // strings — decoding them as numbers would silently empty every
      // label consumer, round-13 review), cellstr as object-reference
      // datasets resolved through H5Cell (round-14)
      name -> v73Value(name, value, attrs)
    }
  }

  /** Types one v7.3 value by its MATLAB_class attribute — applied to the
    * root variables AND, recursively, to each object-reference target of
    * a cell array (cellstr class lists reference uint16 char datasets in
    * `/#refs#`, each carrying its own MATLAB_class — reference read
    * sites: code/annotations/ifcb_merge_classifiers.R:15-31,
    * compare_classlists.R:6-8, which accept class lists saved either
    * `-v7` or `-v7.3`).
    */
  private def v73Value(name: String, value: H5Source.H5Value,
      attrs: Map[String, String]): MatValue = {
    val matDims = (dims: Seq[Long]) => {
      require(dims.forall(_ <= Int.MaxValue),
        s"variable '$name' claims a dim past Int range: $dims")
      dims.reverse.map(_.toInt)
    }
    (attrs.get("MATLAB_class"), value) match {
      // MATLAB_empty=1: the dataset holds the SIZE VECTOR (MATLAB
      // order, uint64), not data — an empty variable must read as an
      // empty value, not as a tiny numeric matrix of its own dims
      // (round-13 ADVICE)
      case (Some(cls), H5Source.H5Num(_, data))
          if attrs.get("MATLAB_empty").contains("1") =>
        cls match {
          case "char" => MatStr("")
          case "cell" => MatCell(data.map(_.toInt), Nil)
          case _      => MatNum(data.map(_.toInt), Array.empty[Double])
        }
      case (Some("char"), H5Source.H5Num(dims, data)) =>
        // uint16 code units; flat HDF5 row-major over [n,m] IS the
        // MATLAB column-major order of [m,n] — same transpose rule
        // as numeric data, re-linearized through the v5 helper
        MatStr(rowMajor(data.map(_.toInt.toChar).mkString, matDims(dims)))
      case (_, H5Source.H5Cell(dims, items)) =>
        // a true MATLAB cell: object references, each target typed by
        // its OWN MATLAB_class (cellstr items are char datasets). HDF5
        // stores the cell's shape transposed like every other array;
        // the flat reference order is already MATLAB's column-major.
        MatCell(matDims(dims),
          items.map { case (v, a) => v73Value(name, v, a) })
      case (Some("cell"), _) =>
        throw new IllegalArgumentException(
          s"variable '$name' claims MATLAB_class cell array but its " +
            "dataset is not object references: corrupt v7.3 file")
      case (None, _) if attrs.contains(H5Source.SkippedAttr) =>
        // the variable HAS attributes, but in a message version the
        // reader skips — its MATLAB_class may be hiding there, and the
        // numeric fallback would silently read a uint16 char variable
        // as numbers (round-13 ADVICE): refuse rather than guess
        throw new IllegalArgumentException(
          s"variable '$name' carries an attribute message of unsupported " +
            s"version ${attrs(H5Source.SkippedAttr)} and no readable " +
            "MATLAB_class: refusing the untyped fallback")
      case (_, H5Source.H5Num(dims, data)) =>
        MatNum(matDims(dims), data)
      case (_, H5Source.H5Str(_, data)) =>
        // no MATLAB_class: a generic HDF5-written twin (the fixture
        // path) — one string ≙ a char array, several ≙ a cell list
        if (data.length == 1) MatStr(data(0))
        else MatCell(Seq(1, data.length), data.toSeq.map(MatStr))
      case (_, other) =>
        // unreachable by construction (H5Source resolves its private
        // H5Ref before returning) — defensive, keeps the match total
        throw new IllegalArgumentException(
          s"variable '$name': unexpected HDF5 value shape ${other.getClass.getSimpleName}")
    }
  }

  private def parseBody(bytes: Array[Byte]): Map[String, MatValue] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(128)
    // insertion-ordered map (round-15 review): the class2use fallback
    // documents "the file's FIRST cell variable", and a HashMap's
    // iteration order stops being file order past 4 entries — the
    // chosen variable then depended on name hashing
    val out = scala.collection.immutable.VectorMap.newBuilder[String, MatValue]
    // a miMATRIX whose INNER framing is broken (flags/dims/name
    // sub-element truncated) must fail like the outer framing does —
    // parseMatrix = None used to silently drop the variable, reading a
    // corrupt file as "variable missing" (round-15 review; the same
    // class the round-12 outer fix eliminated)
    def addMatrix(data: Array[Byte]): Unit =
      out += parseMatrix(data).getOrElse(throw new IllegalArgumentException(
        "corrupt MAT-5 variable: truncated flags/dims/name sub-element"))
    while (buf.remaining() >= 8) {
      readElement(buf) match {
        case Some((tpe, data)) if tpe == MiMatrix =>
          addMatrix(data)
        case Some((tpe, data)) if tpe == MiCompressed =>
          val inflated = inflate(data)
          val ib = ByteBuffer.wrap(inflated).order(ByteOrder.LITTLE_ENDIAN)
          readElement(ib) match {
            case Some((t2, d2)) if t2 == MiMatrix => addMatrix(d2)
            case Some((t2, _)) => throw new IllegalArgumentException(
              s"compressed MAT-5 element wraps mi type $t2, not miMATRIX")
            case None => throw new IllegalArgumentException(
              "compressed MAT-5 element wraps a truncated inner element")
          }
        case Some(_) => () // skip other top-level element kinds
        case None =>
          // readElement returns None mid-stream only when an element's
          // claimed length is negative or runs past the file (the
          // remaining>=8 loop guard covers normal end): silently
          // stopping here dropped every LATER variable — a truncated
          // file read as "TBscores missing" with zero rows and no
          // error (round-12 review; the documented contract forbids it)
          throw new IllegalArgumentException(
            s"corrupt MAT-5 element at byte ${buf.position() - 8}: " +
              "claimed length runs past the file")
      }
    }
    out.result()
  }

  // --- element framing -----------------------------------------------------

  private val MiMatrix = 14
  private val MiCompressed = 15

  /** Reads one tagged element: returns (type, payload) and advances past
    * padding. Handles the small-element (packed) format.
    */
  private def readElement(buf: ByteBuffer): Option[(Int, Array[Byte])] = {
    if (buf.remaining() < 8) return None
    val tpeWord = buf.getInt()
    val small = (tpeWord >>> 16) != 0
    if (small) {
      val tpe = tpeWord & 0xffff
      val n = tpeWord >>> 16
      // a small element's packed payload is AT MOST 4 bytes; a larger
      // claimed size would silently truncate ('TBscores' -> 'TBsc', so
      // the variable reads as missing with zero rows and no error —
      // round-12 review, the documented fail-loudly contract)
      require(n <= 4,
        s"MAT-5 small element claims $n bytes (max 4): corrupt tag")
      val data = new Array[Byte](4)
      buf.get(data)
      Some((tpe, data.take(n)))
    } else {
      val n = buf.getInt()
      if (n < 0 || n > buf.remaining()) return None
      val data = new Array[Byte](n)
      buf.get(data)
      // elements are padded to 8-byte boundaries (compressed ones are not)
      if (tpeWord != MiCompressed) {
        val pad = (8 - (n % 8)) % 8
        buf.position(math.min(buf.limit(), buf.position() + pad))
      }
      Some((tpeWord, data))
    }
  }

  private def inflate(data: Array[Byte]): Array[Byte] =
    Zlib.inflate(data, "MAT-5 compressed element")

  // --- miMATRIX ------------------------------------------------------------

  /** Max nesting of mxCELL matrices: a hostile file of deeply nested
    * cells would otherwise recurse to StackOverflowError, an Error that
    * escapes the RuntimeException→IllegalArgumentException wrapper and
    * breaks the fail-loudly contract (same cap pattern as
    * H5Source.btreeChildren / SqliteSource.walkTable).
    */
  private val MaxCellDepth = 64

  private def parseMatrix(data: Array[Byte], depth: Int = 0): Option[(String, MatValue)] = {
    require(depth < MaxCellDepth,
      s"mxCELL nesting deeper than $MaxCellDepth: refusing to recurse")
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val flags = readElement(buf).getOrElse(return None)._2
    val clazz = flags(0) & 0xff
    val dims = {
      val d = readElement(buf).getOrElse(return None)._2
      val db = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
      (0 until d.length / 4).map(_ => db.getInt())
    }
    val name = new String(readElement(buf).getOrElse(return None)._2, "US-ASCII")
    val value: MatValue = clazz match {
      case 1 => // mxCELL_CLASS: sequence of nested miMATRIX elements
        val items = Seq.newBuilder[MatValue]
        // overflow-safe dims product + a decoded-count cross-check, the
        // numeric branch's discipline (round-12 review): corrupt cell
        // dims (a negative element) made `dims.product` skip the loop
        // and return a silently EMPTY cell — class2use read as an empty
        // class list with no error
        val expect = Dims.product(dims.map(_.toLong), s"cell '$name'")
        var n = expect
        while (n > 0 && buf.remaining() >= 8) {
          readElement(buf) match {
            case Some((MiMatrix, d)) =>
              // a corrupt ITEM must fail loudly, not read back as an
              // empty string that passes the count cross-check below —
              // class2use would silently emit "" as a class name
              // (round-15 review; the fail-loudly contract)
              items += parseMatrix(d, depth + 1).map(_._2)
                .getOrElse(throw new IllegalArgumentException(
                  s"cell '$name': corrupt item (truncated sub-element)"))
            case _ => ()
          }
          n -= 1
        }
        val cell = items.result()
        require(cell.size == expect,
          s"cell '$name' claims dims $dims ($expect items) " +
            s"but holds ${cell.size}")
        MatCell(dims, cell)
      case 4 => // mxCHAR_CLASS
        val (tpe, d) = readElement(buf).getOrElse(return None)
        MatStr(rowMajor(decodeChars(tpe, d), dims))
      case c if c >= 6 && c <= 15 => // mxDOUBLE..mxUINT64: numeric classes
        // a complex variable stores TWO data elements (real then
        // imaginary); decoding only the first would silently drop the
        // imaginary half — reject by name instead (flags byte 1 bit 3;
        // round-14 verdict: the old catch-all ignored this flag)
        require((flags(1) & 0x08) == 0,
          s"variable '$name': complex numeric data is not supported " +
            "(the pipeline's class-list/score files are real-valued)")
        val (tpe, d) = readElement(buf).getOrElse(return None)
        val data = decodeNumeric(tpe, d)
        // cross-check dims against the decoded length HERE, inside the
        // parse wrapper: consumers (classScores/manualClassList) index
        // column-major by dims and a truncated data element would
        // otherwise die with a raw AIOOBE in the executor, outside the
        // fail-loudly contract (round-11 review)
        val expect = Dims.product(dims.map(_.toLong), s"matrix '$name'")
        require(data.length >= expect,
          s"matrix '$name' claims dims $dims ($expect values) but holds ${data.length}")
        MatNum(dims, data)
      case other =>
        // mxSTRUCT/mxOBJECT/mxSPARSE/mxFUNCTION/mxOPAQUE store field-name
        // or index elements where a numeric matrix stores data: the old
        // numeric catch-all decoded a 1×1 struct's field-name-length
        // element as the number 32 (it even passed the length
        // cross-check) and rejected m×n structs with a misleading dims
        // message (round-14 verdict). Real classifier saves carry
        // struct/options variables beside TBclass/TBscores — name the
        // class and refuse.
        val className = other match {
          case 2  => "mxSTRUCT_CLASS"
          case 3  => "mxOBJECT_CLASS"
          case 5  => "mxSPARSE_CLASS"
          case 16 => "mxFUNCTION_CLASS"
          case 17 => "mxOPAQUE_CLASS"
          case c  => s"unknown mxClass $c"
        }
        throw new IllegalArgumentException(
          s"variable '$name' has unsupported MATLAB class $className " +
            "(numeric, char and cell variables are implemented)")
    }
    Some(name -> value)
  }

  /** MAT-5 stores char matrices column-major; a multi-row matrix
    * (rows 'AB'/'CD' stored A,C,B,D) must read back row-wise
    * ("ABCD"), not interleaved.
    */
  private def rowMajor(s: String, dims: Seq[Int]): String =
    if (dims.length == 2 && dims(0) > 1 && dims(0).toLong * dims(1) == s.length) {
      val (rows, cols) = (dims(0), dims(1))
      val out = new Array[Char](s.length)
      var i = 0
      while (i < rows) {
        var j = 0
        while (j < cols) { out(i * cols + j) = s(j * rows + i); j += 1 }
        i += 1
      }
      new String(out)
    } else s

  private def decodeChars(tpe: Int, d: Array[Byte]): String = tpe match {
    case 16 => new String(d, "UTF-8") // miUTF8
    case 4 | 17 => // miUINT16 / miUTF16
      val b = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
      val sb = new StringBuilder
      while (b.remaining() >= 2) sb.append(b.getChar())
      sb.toString
    case _ => new String(d, "US-ASCII")
  }

  private def decodeNumeric(tpe: Int, d: Array[Byte]): Array[Double] = {
    val b = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
    tpe match {
      case 1 => d.map(_.toDouble) // miINT8
      case 2 => d.map(x => (x & 0xff).toDouble) // miUINT8
      case 3 => Array.fill(d.length / 2)(b.getShort().toDouble)
      case 4 => Array.fill(d.length / 2)((b.getShort() & 0xffff).toDouble)
      case 5 => Array.fill(d.length / 4)(b.getInt().toDouble)
      case 6 => Array.fill(d.length / 4)((b.getInt().toLong & 0xffffffffL).toDouble)
      case 7 => Array.fill(d.length / 4)(b.getFloat().toDouble)
      case 9 => Array.fill(d.length / 8)(b.getDouble())
      case 12 => Array.fill(d.length / 8)(b.getLong().toDouble)
      case 13 => Array.fill(d.length / 8) {
        // miUINT64: values past 2^63 must not wrap negative (round-15
        // review); the standard unsigned widening loses only the
        // precision any double conversion loses
        val v = b.getLong()
        if (v >= 0) v.toDouble else v.toDouble + 1.8446744073709552E19
      }
      case t => throw new IllegalArgumentException(s"numeric mi type $t")
    }
  }

  // --- relational views ----------------------------------------------------

  /** Class-score files → (sample, roi_number, scores array) plus the class
    * label list: expects variables `TBscores` (nROI × nClass, column-major)
    * and `class2useTB` (cell of strings) — the layout the reference's
    * classified `.mat` results carry.
    */
  def classScores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.mat").load(dir)
      .select(col("path"), col("content"))
    val rows = files.as[(String, Array[Byte])].flatMap { case (path, bytes) =>
      val sample = HdrSource.SampleIdPattern.r.findFirstIn(path).getOrElse(path)
      val vars = parse(bytes)
      val labels = vars.get("class2useTB") match {
        case Some(MatCell(_, items)) => items.collect { case MatStr(s) => s }
        case _ => Seq.empty[String]
      }
      vars.get("TBscores") match {
        case Some(MatNum(Seq(nRoi, nClass), data)) =>
          (0 until nRoi).map { r =>
            // column-major: score(r, c) = data(c*nRoi + r)
            val scores = Array.tabulate(nClass)(c => data(c * nRoi + r))
            (sample, r + 1, scores, labels)
          }
        case _ => Seq.empty
      }
    }
    rows.toDF("sample", "roi_number", "scores", "class_labels")
  }

  /** class2use config file → (class_idx, class_name), 1-based MATLAB
    * indices (the cell-of-strings layout `ifcb_get_mat_variable` reads —
    * reference: code/annotations/compare_classlists.R:6-8, merge inputs
    * at ifcb_merge_classifiers.R:15-21). Looks for `varName`, falling
    * back to the file's first cell variable (configs differ between
    * `class2use` and `class2use_manual` in the wild).
    */
  def class2use(spark: SparkSession, path: String,
      varName: String = "class2use"): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.mat").load(path)
      .select(col("content"))
    files.as[Array[Byte]].flatMap { bytes =>
      val vars = parse(bytes)
      val cell = vars.get(varName) match {
        case Some(c: MatCell) => Some(c)
        case _ => vars.valuesIterator.collectFirst { case c: MatCell => c }
      }
      cell.toSeq.flatMap(_.items.collect { case MatStr(s) => s }
        .zipWithIndex.map { case (n, i) => (i + 1, n) })
    }.toDF("class_idx", "class_name")
  }

  /** Manual-annotation files → (sample, roi_number, manual_idx, auto_idx):
    * the ifcb-analysis manual layout, a `classlist` nROI×3 numeric matrix
    * of [roi number, manual class idx, auto class idx] with NaN where a
    * ROI is unannotated (reference consumption: ifcb-data-pipeline.Rmd:859
    * and the ifcb_merge_classifiers.R manual folders). Indices refer to
    * the dataset's own class2use list — [[graft.operators.ManualMerge]]
    * remaps them across datasets.
    */
  def manualClassList(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.mat").load(dir)
      .select(col("path"), col("content"))
    files.as[(String, Array[Byte])].flatMap { case (path, bytes) =>
      val sample = HdrSource.SampleIdPattern.r.findFirstIn(path).getOrElse(
        new java.io.File(path).getName.stripSuffix(".mat"))
      parse(bytes).get("classlist") match {
        case Some(MatNum(Seq(nRoi, nCol), data)) if nCol >= 2 =>
          (0 until nRoi).map { r =>
            def cell(c: Int): Option[Int] = {
              val v = data(c * nRoi + r) // column-major
              if (v.isNaN) None else Some(v.toInt)
            }
            (sample, cell(0).getOrElse(r + 1), cell(1),
              if (nCol >= 3) cell(2) else None)
          }
        case _ => Seq.empty
      }
    }.toDF("sample", "roi_number", "manual_idx", "auto_idx")
  }
}
