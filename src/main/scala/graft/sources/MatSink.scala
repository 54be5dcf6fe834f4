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
