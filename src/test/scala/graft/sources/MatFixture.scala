package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal MAT-5 writer (test fixtures only), following the same public
  * format spec the [[MatSource]] parser implements — shared by
  * MatSourceSpec and ManualMergeSpec.
  */
object MatFixture {

  def pad8(n: Int): Int = (8 - (n % 8)) % 8

  def element(tpe: Int, data: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(8 + data.length + pad8(data.length))
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(tpe).putInt(data.length).put(data)
    out.array()
  }

  def matrix(name: String, clazz: Int, dims: Seq[Int],
      payload: Array[Byte], payloadType: Int,
      cells: Seq[Array[Byte]] = Nil,
      flagBits: Int = 0): Array[Byte] = {
    // flags word byte 0 = class, byte 1 = flag bits (0x08 = complex)
    val flags = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(clazz | (flagBits << 8)).putInt(0).array()
    val dimBytes = {
      val b = ByteBuffer.allocate(dims.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      dims.foreach(b.putInt)
      b.array()
    }
    val body = new ByteArrayOutputStream()
    body.write(element(6, flags)) // miUINT32 array flags
    body.write(element(5, dimBytes)) // miINT32 dims
    body.write(element(1, name.getBytes("US-ASCII"))) // miINT8 name
    if (cells.nonEmpty) cells.foreach(c => body.write(element(14, c)))
    else body.write(element(payloadType, payload))
    element(14, body.toByteArray)
  }

  def doubles(xs: Seq[Double]): Array[Byte] = {
    val b = ByteBuffer.allocate(xs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach(b.putDouble)
    b.array()
  }

  def matFile(vars: Array[Byte]*): Array[Byte] = {
    val header = new Array[Byte](128)
    val desc = "MATLAB 5.0 MAT-file, graft test fixture".getBytes("US-ASCII")
    System.arraycopy(desc, 0, header, 0, desc.length)
    header(124) = 0; header(125) = 1 // version 0x0100
    header(126) = 'I'; header(127) = 'M'
    val out = new ByteArrayOutputStream()
    out.write(header)
    vars.foreach(out.write)
    out.toByteArray
  }

  /** A v7.3-shaped file: the 128-byte MAT text header with version
    * 0x0200 padded to a 512-byte HDF5 userblock, then the HDF5 stream
    * (superblock at offset 512, like MATLAB's `-v7.3` output).
    */
  def mat73File(h5: Array[Byte]): Array[Byte] = {
    val userblock = new Array[Byte](512)
    val desc = "MATLAB 7.3 MAT-file, graft test fixture".getBytes("US-ASCII")
    System.arraycopy(desc, 0, userblock, 0, desc.length)
    userblock(124) = 0; userblock(125) = 2 // version 0x0200
    userblock(126) = 'I'; userblock(127) = 'M'
    userblock ++ h5
  }

  def charMatrix(name: String, s: String): Array[Byte] =
    matrix(name, 4, Seq(1, s.length), s.getBytes("UTF-8"), 16)

  /** A real-MATLAB-shaped `-v7.3` cellstr variable: an object-reference
    * dataset (MATLAB_class "cell") whose 8-byte references point into a
    * `/#refs#` group of uint16 char datasets — the idiom MATLAB uses
    * when a class2use cell list is saved `-v7.3`. A MATLAB [n,1] cell is
    * HDF5 [1,n]; each [1,len] char target is HDF5 [len,1].
    */
  def cellstrV73(varName: String, items: Seq[String]): Array[Byte] = {
    def refName(i: Int): String = ('a' + i).toChar.toString
    val kids = items.zipWithIndex.map { case (s, i) =>
      H5Fixture.U16Attr(refName(i), Seq(s.length.toLong, 1L),
        s.map(_.toInt).toArray, "char"): H5Fixture.Ds
    }
    mat73File(H5Fixture.write(Seq(
      H5Fixture.Group("#refs#", kids),
      H5Fixture.RefArray(varName, Seq(1L, items.length.toLong),
        items.indices.map(i => s"#refs#/${refName(i)}")))))
  }

  def stripTag(e: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.wrap(e).order(ByteOrder.LITTLE_ENDIAN)
    b.getInt(); val n = b.getInt()
    val out = new Array[Byte](n)
    b.get(out)
    out
  }

  /** Cell-of-strings variable — the class2use layout. */
  def cellOfStrings(name: String, items: Seq[String]): Array[Byte] =
    matrix(name, 1, Seq(items.length, 1), Array.empty, 0,
      cells = items.map(s => stripTag(charMatrix("", s))))

  /** Column-major numeric matrix of doubles. */
  def numMatrix(name: String, rows: Int, cols: Int, colMajor: Seq[Double]): Array[Byte] = {
    require(colMajor.length == rows * cols)
    matrix(name, 6, Seq(rows, cols), doubles(colMajor), 9)
  }
}
