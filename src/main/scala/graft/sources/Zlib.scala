package graft.sources

import java.util.zip.Inflater

/** One zlib-stream inflater for the binary readers ([[MatSource]],
  * [[H5Source]]) — the loop's termination handling (inflate returning 0
  * on a truncated stream) is subtle enough that two copies had already
  * diverged on it.
  */
private[sources] object Zlib {
  def inflate(data: Array[Byte], what: String): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val chunk = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(chunk)
      if (n > 0) out.write(chunk, 0, n) else if (n == 0 && !inf.finished()) {
        inf.end(); throw new IllegalArgumentException(s"bad zlib stream in $what")
      }
    }
    inf.end()
    out.toByteArray
  }
}
