package graft.sources

import java.util.zip.Inflater

/** One zlib-stream inflater for the binary readers ([[MatSource]],
  * [[H5Source]]) — the loop's termination handling (inflate returning 0
  * on a truncated stream) is subtle enough that two copies had already
  * diverged on it.
  *
  * `maxOut` caps the inflated size (default 1 GiB, the same bound the
  * readers put on claimed dataset shapes, matching the reference's own
  * oversize-bin guard at extract_features.R:61): deflate compresses up
  * to ~1000:1, so a few-MB "compressed element" in a hostile file could
  * otherwise commit GBs of heap before any shape check runs.
  */
private[sources] object Zlib {
  def inflate(data: Array[Byte], what: String,
      maxOut: Long = 1L << 30): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    // Long math then clamp: data.length * 4 wraps negative past 512 MiB
    // and ByteArrayOutputStream(negative) rejects a VALID stream with a
    // misleading "Negative initial size" (round-12 review)
    val initial = math.min(data.length.toLong * 4, math.min(maxOut, 1L << 26)).toInt
    val out = new java.io.ByteArrayOutputStream(initial)
    val chunk = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        if (out.size() > maxOut)
          throw new IllegalArgumentException(
            s"zlib stream in $what inflates past the $maxOut-byte cap")
        // corrupted (non-truncated) streams surface as the checked
        // DataFormatException — rethrow as the one exception type the
        // fail-loudly reader contract uses everywhere else
        val n =
          try inf.inflate(chunk)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"bad zlib stream in $what", e)
          }
        if (n > 0) out.write(chunk, 0, n)
        else if (!inf.finished() && !inf.needsInput())
          throw new IllegalArgumentException(s"bad zlib stream in $what")
      }
      // A truncated stream exits the loop via needsInput() with the
      // deflate stream unfinished — that is silent partial data, which
      // the decode-right-or-fail-loudly contract forbids.
      if (!inf.finished())
        throw new IllegalArgumentException(s"truncated zlib stream in $what")
      out.toByteArray
    } finally inf.end()
  }
}
