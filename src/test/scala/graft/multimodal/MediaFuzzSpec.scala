package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip + byte-mutation fuzzing for the multimodal decoders
  * (round-11 extension of the MatFuzz/H5Fuzz/SqliteFuzz/RoiFuzz family):
  * the WAV and container-image decoders parse untrusted bytes, so they
  * carry the same contract as every other binary reader — decode right
  * or throw IllegalArgumentException, never a raw buffer/arithmetic
  * exception, an unbounded loop, or silently-wrong samples.
  */
class MediaFuzzSpec extends AnyFunSuite {

  /** Spec-faithful RIFF/WAVE writer: PCM fmt chunk, optional junk
    * chunks (odd sizes exercise word-alignment), interleaved frames.
    */
  private def wav(channels: Int, bits: Int, rate: Int,
      frames: Seq[Seq[Int]], junkBefore: Int = 0): Array[Byte] = {
    val dataBytes = frames.length * channels * bits / 8
    val body = new ByteArrayOutputStream()
    def chunk(id: String, payload: Array[Byte]): Unit = {
      body.write(id.getBytes("US-ASCII"))
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(payload.length)
      body.write(b.array()); body.write(payload)
      if (payload.length % 2 == 1) body.write(0) // word alignment pad
    }
    if (junkBefore > 0) chunk("LIST", Array.fill[Byte](junkBefore)(0x7f))
    val fmt = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    fmt.putShort(1.toShort).putShort(channels.toShort).putInt(rate)
    fmt.putInt(rate * channels * bits / 8)
    fmt.putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    chunk("fmt ", fmt.array())
    val data = ByteBuffer.allocate(dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    for (f <- frames; s <- f) {
      if (bits == 16) data.putShort(s.toShort) else data.put((s + 128).toByte)
    }
    chunk("data", data.array())
    val payload = body.toByteArray
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val sz = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    sz.putInt(4 + payload.length)
    out.write(sz.array())
    out.write("WAVE".getBytes("US-ASCII"))
    out.write(payload)
    out.toByteArray
  }

  test("WAV round-trip: 60 generated files decode to the generated mono mix") {
    val rnd = new scala.util.Random(37L)
    for (seed <- 0 until 60) {
      val channels = 1 + rnd.nextInt(2)
      val bits = if (rnd.nextBoolean()) 8 else 16
      val rate = 8000 + rnd.nextInt(40000)
      val n = 40 + rnd.nextInt(300) // > 44 bytes total always
      val lim = if (bits == 16) 32768 else 128
      val frames = Seq.fill(n)(Seq.fill(channels)(rnd.nextInt(2 * lim) - lim))
      val junk = if (seed % 3 == 0) 1 + rnd.nextInt(9) else 0
      val (got, gotRate) = Media.decodeWav(wav(channels, bits, rate, frames, junk))
      assert(gotRate == rate, s"seed $seed")
      assert(got.length == n, s"seed $seed: ${got.length} vs $n frames")
      frames.zip(got).zipWithIndex.foreach { case ((f, g), i) =>
        val want = f.map(s =>
          if (bits == 16) s / 32768.0 else s / 128.0).sum / channels
        assert(math.abs(g - want) < 1e-12, s"seed $seed frame $i: $g vs $want")
      }
    }
  }

  test("WAV mutation: flips and truncations decode or throw the contract exception") {
    var parsed = 0
    var rejected = 0
    for (seed <- 0 until 40) {
      val rnd = new scala.util.Random(seed * 7907L)
      val bytes = wav(1 + seed % 2, if (seed % 3 == 0) 8 else 16,
        44100, Seq.fill(100)(Seq.fill(1 + seed % 2)(seed)), junkBefore = seed % 5)
      val mutants =
        (0 until 6).map { _ =>
          val m = bytes.clone()
          val pos = rnd.nextInt(m.length)
          m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
          m
        } ++ Seq(bytes.take(45 + rnd.nextInt(math.max(1, bytes.length - 45))))
      mutants.foreach { m =>
        scala.util.Try(Media.decodeWav(m)) match {
          case scala.util.Success(_) => parsed += 1
          case scala.util.Failure(_: IllegalArgumentException) => rejected += 1
          case scala.util.Failure(e) =>
            fail(s"seed $seed: non-contract exception $e", e)
        }
      }
    }
    assert(parsed > 0 && rejected > 0, s"parsed=$parsed rejected=$rejected")
  }

  test("container-image mutation: corrupted PNGs decode or throw the contract exception") {
    var parsed = 0
    var rejected = 0
    for (seed <- 0 until 30) {
      val rnd = new scala.util.Random(seed * 104729L)
      val w = 4 + rnd.nextInt(12); val h = 4 + rnd.nextInt(12)
      val px = Array.fill(w * h)(rnd.nextInt(256))
      val png = Media.encodePng(px, w, h)
      // the clean encode round-trips exactly
      val (back, bw, bh) = Media.decodeImage(png, 0, 0)
      assert(bw == w && bh == h && back.sameElements(px), s"seed $seed round-trip")
      val mutants =
        (0 until 6).map { _ =>
          val m = png.clone()
          // flip past the magic so isContainerImage still routes ImageIO
          val pos = 4 + rnd.nextInt(m.length - 4)
          m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
          m
        } ++ Seq(png.take(8 + rnd.nextInt(math.max(1, png.length - 8))))
      mutants.foreach { m =>
        scala.util.Try(Media.decodeImage(m, 0, 0)) match {
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
