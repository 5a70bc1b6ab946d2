package graft.codec

/** 8-bit float codec, semantics-equal to the reference's
  * `lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:78-98`
  * (floatToByte315 / byte315ToFloat: 3 mantissa bits, zero exponent 15).
  * The quantization drives BM25 norm bytes and therefore tie patterns —
  * it must match bit-for-bit (SURVEY.md §7.4).
  */
object SmallFloat {

  def floatToByte315(f: Float): Byte = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val smallfloat = bits >> (24 - 3)
    if (smallfloat <= ((63 - 15) << 3)) {
      if (bits <= 0) 0.toByte else 1.toByte
    } else if (smallfloat >= ((63 - 15) << 3) + 0x100) {
      -1 // 0xFF: overflow maps to largest
    } else {
      (smallfloat - ((63 - 15) << 3)).toByte
    }
  }

  def byte315ToFloat(b: Byte): Float = {
    if (b == 0) return 0.0f
    var bits = (b & 0xff) << (24 - 3)
    bits += (63 - 15) << 24
    java.lang.Float.intBitsToFloat(bits)
  }

  /** BM25 norm decode table: NORM_TABLE[i] = 1/f^2 (gives field length back
    * since the norm byte encodes 1/sqrt(dl)); reference:
    * search/similarities/BM25Similarity.java:127-134. */
  val Bm25NormTable: Array[Float] = {
    val t = new Array[Float](256)
    var i = 0
    while (i < 256) { val f = byte315ToFloat(i.toByte); t(i) = 1.0f / (f * f); i += 1 }
    t
  }

  /** BM25 norm byte for a field of length `dl` tokens with boost 1:
    * floatToByte315(1f / sqrt(dl)); reference: BM25Similarity.java:95-97. */
  def normByte(dl: Int): Byte =
    floatToByte315(1f / math.sqrt(dl.toDouble).toFloat)
}
