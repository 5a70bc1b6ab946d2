package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RawMedia
import graft.operators.RawMedia.{BmpImage, WavAudio}

/** Real uncompressed-media codecs: WAV/PCM16 and BMP24 round-trips
  * (incl. container quirks: extra RIFF chunks, BMP row padding,
  * top-down negative height), and the pixel/signal feature math
  * against brute-force recomputation.
  */
class RawMediaSpec extends AnyFunSuite {

  test("WAV PCM16 round-trip preserves samples, rate, channels") {
    val rnd = new scala.util.Random(7)
    for (ch <- Seq(1, 2); n <- Seq(1, 7, 256)) {
      val samples = Array.fill(n * ch)(rnd.nextInt(65536).toShort)
      val wav = RawMedia.decodeWav(RawMedia.encodeWavPcm16(samples, 16000, ch))
      assert(wav.sampleRate === 16000 && wav.channels === ch)
      assert(wav.samples.toSeq === samples.toSeq)
    }
  }

  test("WAV decoder walks and skips unknown chunks") {
    val samples = Array[Short](100, -100, 3000)
    val canonical = RawMedia.encodeWavPcm16(samples, 8000, 1)
    // splice a LIST chunk (5 bytes + 1 pad) between fmt and data
    val head = canonical.slice(0, 36) // RIFF..fmt chunk end
    val tail = canonical.slice(36, canonical.length) // data chunk
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = head ++ extra ++ tail
    val wav = RawMedia.decodeWav(spliced)
    assert(wav.samples.toSeq === samples.toSeq)
  }

  test("audio frame features match brute force") {
    val samples = Array.tabulate(400)(i =>
      (((i * 37 + 11) % 2003 - 1001) * 16).toShort)
    val wav = WavAudio(16000, 1, samples)
    val feats = RawMedia.audioFrameFeatures(wav, 100)
    assert(feats.size === 4)
    for ((fr, k) <- samples.grouped(100).zipWithIndex) {
      val xs = fr.map(_ / 32768.0)
      val rms = math.sqrt(xs.map(x => x * x).sum / 100)
      val zc = (1 until 100).count(i => fr(i) * fr(i - 1) < 0)
      assert(math.abs(feats(k)._1 - rms) < 1e-12)
      assert(feats(k)._2 === zc.toLong)
    }
  }

  test("BMP24 round-trip incl. row padding (w not multiple of 4)") {
    for ((w, h) <- Seq((9, 7), (4, 4), (1, 1), (5, 3))) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte)
      val img = BmpImage(w, h, rgb)
      val back = RawMedia.decodeBmp(RawMedia.encodeBmp24(img))
      assert(back.width === w && back.height === h)
      assert(back.rgb.toSeq === rgb.toSeq, s"$w x $h")
    }
  }

  test("BMP top-down (negative height) decodes identically") {
    val w = 3; val h = 2
    val rgb = Array.tabulate(w * h * 3)(i => (i * 11 % 256).toByte)
    val img = BmpImage(w, h, rgb)
    val bytes = RawMedia.encodeBmp24(img)
    // flip to top-down: negate height, reverse row order of pixel data
    val buf = java.nio.ByteBuffer.wrap(bytes.clone())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -h)
    val stride = (w * 3 + 3) & ~3
    val td = buf.array()
    for (row <- 0 until h; k <- 0 until stride)
      td(54 + row * stride + k) = bytes(54 + (h - 1 - row) * stride + k)
    val back = RawMedia.decodeBmp(td)
    assert(back.rgb.toSeq === rgb.toSeq)
  }

  test("nearest-neighbor resize and channel means match brute force") {
    val w = 9; val h = 7
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 131 + 17) % 256).toByte)
    val img = BmpImage(w, h, rgb)
    val rz = RawMedia.resizeNearest(img, 3, 3)
    for (y <- 0 until 3; x <- 0 until 3) {
      val sx = x * w / 3; val sy = y * h / 3
      assert(rz.r(x, y) === img.r(sx, sy))
      assert(rz.g(x, y) === img.g(sx, sy))
      assert(rz.b(x, y) === img.b(sx, sy))
    }
    val (mr, mg, mb) = RawMedia.meanRgb(img)
    val n = w * h
    assert(math.abs(mr - (0 until n).map(i => rgb(i * 3) & 0xff).sum.toDouble / n) < 1e-12)
    assert(math.abs(mg - (0 until n).map(i => rgb(i * 3 + 1) & 0xff).sum.toDouble / n) < 1e-12)
    assert(math.abs(mb - (0 until n).map(i => rgb(i * 3 + 2) & 0xff).sum.toDouble / n) < 1e-12)
  }
}
