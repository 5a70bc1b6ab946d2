package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM codecs for the uncompressed media containers a
  * training pipeline meets (WAV/PCM RIFF audio, BMP 24-bit images) plus
  * genuine signal/pixel feature extraction — no external codec library
  * involved, so this replaces the environmental stub for every
  * uncompressed payload; compressed formats (JPEG/MP3/H.264) remain the
  * declared stub in [[Multimodal]].
  *
  * Formats follow the public container specs:
  *  - WAV: RIFF header, `fmt ` chunk (PCM=1, 16-bit LE), `data` chunk;
  *    arbitrary extra chunks are walked and skipped.
  *  - BMP: BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, BI_RGB 24bpp,
  *    bottom-up row order, rows padded to 4-byte boundaries, BGR byte
  *    order.
  */
object RawMedia {

  // ---------------- WAV / PCM16 ----------------

  final case class WavAudio(sampleRate: Int, channels: Int,
                            samples: Array[Short]) {
    def nFrames: Int = samples.length / channels
  }

  /** Encode interleaved PCM16 samples as a canonical RIFF/WAVE file. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int,
                     channels: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a RIFF/WAVE PCM16 payload: walks chunks, tolerates extra
    * chunks before/after `data`, validates the PCM/16-bit format. */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    buf.getInt // riff size
    require(tag() == "WAVE", "not a WAVE file")
    var sampleRate = -1; var channels = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (samples == null || sampleRate < 0)) {
      val id = tag(); val len = buf.getInt
      id match {
        case "fmt " =>
          val fmt = buf.getShort; channels = buf.getShort
          sampleRate = buf.getInt; buf.getInt; buf.getShort
          val bits = buf.getShort
          require(fmt == 1 && bits == 16, s"unsupported wav fmt=$fmt bits=$bits")
          buf.position(buf.position() + (len - 16))
        case "data" =>
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
        case _ => // skip unknown chunk (word-aligned)
          buf.position(buf.position() + len + (len & 1))
      }
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    WavAudio(sampleRate, channels, samples)
  }

  /** Per-frame audio features over REAL decoded samples: RMS of the
    * [-1,1) float signal and zero-crossing count (strict sign product
    * < 0) per non-overlapping frame of `frameLen` mono samples. */
  def audioFrameFeatures(wav: WavAudio, frameLen: Int): Seq[(Double, Long)] = {
    require(wav.channels == 1, "frame features expect mono")
    wav.samples.grouped(frameLen).filter(_.length == frameLen).map { fr =>
      var sq = 0.0; var zc = 0L; var i = 0
      while (i < fr.length) {
        val x = fr(i) / 32768.0
        sq += x * x
        if (i > 0 && fr(i) * fr(i - 1) < 0) zc += 1
        i += 1
      }
      (math.sqrt(sq / fr.length), zc)
    }.toSeq
  }

  // ---------------- BMP 24-bit ----------------

  final case class BmpImage(width: Int, height: Int, rgb: Array[Byte]) {
    /** top-down row-major (x, y) -> packed RGB */
    def r(x: Int, y: Int): Int = rgb((y * width + x) * 3) & 0xff
    def g(x: Int, y: Int): Int = rgb((y * width + x) * 3 + 1) & 0xff
    def b(x: Int, y: Int): Int = rgb((y * width + x) * 3 + 2) & 0xff
  }

  /** Encode top-down RGB pixels as a canonical bottom-up BI_RGB 24bpp
    * BMP with 4-byte row padding. */
  def encodeBmp24(img: BmpImage): Array[Byte] = {
    val stride = (img.width * 3 + 3) & ~3
    val dataLen = stride * img.height
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(img.width).putInt(img.height)
      .putShort(1).putShort(24).putInt(0).putInt(dataLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = img.height - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < img.width) { // BGR order
        buf.put(img.b(x, y).toByte).put(img.g(x, y).toByte)
          .put(img.r(x, y).toByte)
        x += 1
      }
      var pad = stride - img.width * 3
      while (pad > 0) { buf.put(0: Byte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode a BI_RGB 24bpp BMP to top-down RGB. Handles bottom-up AND
    * top-down (negative height) files and row padding. */
  def decodeBmp(bytes: Array[Byte]): BmpImage = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B' && buf.get() == 'M', "not a BMP")
    buf.getInt; buf.getShort; buf.getShort
    val dataOff = buf.getInt
    val hdrSize = buf.getInt
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    val width = buf.getInt
    val rawH = buf.getInt
    val topDown = rawH < 0
    val height = math.abs(rawH)
    buf.getShort
    val bpp = buf.getShort
    val compression = buf.getInt
    require(bpp == 24 && compression == 0, s"unsupported BMP bpp=$bpp comp=$compression")
    val stride = (width * 3 + 3) & ~3
    val rgb = new Array[Byte](width * height * 3)
    var row = 0
    while (row < height) {
      val srcY = if (topDown) row else height - 1 - row
      var x = 0
      buf.position(dataOff + srcY * stride)
      while (x < width) {
        val b = buf.get(); val g = buf.get(); val r = buf.get()
        val o = (row * width + x) * 3
        rgb(o) = r; rgb(o + 1) = g; rgb(o + 2) = b
        x += 1
      }
      row += 1
    }
    BmpImage(width, height, rgb)
  }

  /** Nearest-neighbor resize over REAL pixels: out(x,y) samples
    * in(floor(x*w/ow), floor(y*h/oh)). */
  def resizeNearest(img: BmpImage, ow: Int, oh: Int): BmpImage = {
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = y * img.height / oh
      var x = 0
      while (x < ow) {
        val sx = x * img.width / ow
        val si = (sy * img.width + sx) * 3
        val di = (y * ow + x) * 3
        out(di) = img.rgb(si); out(di + 1) = img.rgb(si + 1)
        out(di + 2) = img.rgb(si + 2)
        x += 1
      }
      y += 1
    }
    BmpImage(ow, oh, out)
  }

  /** Channel means over all pixels (real pixel statistics). */
  def meanRgb(img: BmpImage): (Double, Double, Double) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    val n = img.width * img.height
    while (i < n) {
      sr += img.rgb(i * 3) & 0xff
      sg += img.rgb(i * 3 + 1) & 0xff
      sb += img.rgb(i * 3 + 2) & 0xff
      i += 1
    }
    (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }
}
