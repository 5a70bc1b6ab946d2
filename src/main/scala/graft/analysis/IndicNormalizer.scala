package graft.analysis

/** Indic script normalization (reference in/IndicNormalizer.java:32-294):
  * composes "broken" vowel/consonant sequences — independent-vowel +
  * matra pairs, nukta consonants, Malayalam chillus (consonant + virama +
  * ZWJ), Bengali khanda-ta — into their standard composed codepoints,
  * per script block. The decomposition table is the reference's verbatim
  * (offsets into each script's codepage; 0xFF = ZWJ, -1 = absent third
  * char; flags select the applicable scripts). Runs BEFORE the
  * language-specific normalizer in the reference chains
  * (hi/HindiAnalyzer.java:129: IndicNormalizationFilter ->
  * HindiNormalizationFilter -> HindiStemFilter).
  */
object IndicNormalizer {

  // script flag + block base, keyed by Character.UnicodeBlock
  private val DEV = 1; private val BEN = 2; private val GUR = 4
  private val GUJ = 8; private val ORI = 16; private val TAM = 32
  private val TEL = 64; private val KAN = 128; private val MAL = 256

  private val scripts: Map[Character.UnicodeBlock, (Int, Int)] = {
    import Character.UnicodeBlock._
    Map(DEVANAGARI -> ((DEV, 0x0900)), BENGALI -> ((BEN, 0x0980)),
      GURMUKHI -> ((GUR, 0x0A00)), GUJARATI -> ((GUJ, 0x0A80)),
      ORIYA -> ((ORI, 0x0B00)), TAMIL -> ((TAM, 0x0B80)),
      TELUGU -> ((TEL, 0x0C00)), KANNADA -> ((KAN, 0x0C80)),
      MALAYALAM -> ((MAL, 0x0D00)))
  }

  /** (ch1, ch2, ch3, res, flags) rows — IndicNormalizer.java:77-233. */
  private val decomp: Array[(Int, Int, Int, Int, Int)] = Array(
    (0x05, 0x3E, 0x45, 0x11, DEV | GUJ),
    (0x05, 0x3E, 0x46, 0x12, DEV),
    (0x05, 0x3E, 0x47, 0x13, DEV | GUJ),
    (0x05, 0x3E, 0x48, 0x14, DEV | GUJ),
    (0x05, 0x3E, -1, 0x06, DEV | BEN | GUR | GUJ | ORI),
    (0x05, 0x45, -1, 0x72, DEV),
    (0x05, 0x45, -1, 0x0D, GUJ),
    (0x05, 0x46, -1, 0x04, DEV),
    (0x05, 0x47, -1, 0x0F, GUJ),
    (0x05, 0x48, -1, 0x10, GUR | GUJ),
    (0x05, 0x49, -1, 0x11, DEV | GUJ),
    (0x05, 0x4A, -1, 0x12, DEV),
    (0x05, 0x4B, -1, 0x13, DEV | GUJ),
    (0x05, 0x4C, -1, 0x14, DEV | GUR | GUJ),
    (0x06, 0x45, -1, 0x11, DEV | GUJ),
    (0x06, 0x46, -1, 0x12, DEV),
    (0x06, 0x47, -1, 0x13, DEV | GUJ),
    (0x06, 0x48, -1, 0x14, DEV | GUJ),
    (0x07, 0x57, -1, 0x08, MAL),
    (0x09, 0x41, -1, 0x0A, DEV),
    (0x09, 0x57, -1, 0x0A, TAM | MAL),
    (0x0E, 0x46, -1, 0x10, MAL),
    (0x0F, 0x45, -1, 0x0D, DEV),
    (0x0F, 0x46, -1, 0x0E, DEV),
    (0x0F, 0x47, -1, 0x10, DEV),
    (0x0F, 0x57, -1, 0x10, ORI),
    (0x12, 0x3E, -1, 0x13, MAL),
    (0x12, 0x4C, -1, 0x14, TEL | KAN),
    (0x12, 0x55, -1, 0x13, TEL),
    (0x12, 0x57, -1, 0x14, TAM | MAL),
    (0x13, 0x57, -1, 0x14, ORI),
    (0x15, 0x3C, -1, 0x58, DEV),
    (0x16, 0x3C, -1, 0x59, DEV | GUR),
    (0x17, 0x3C, -1, 0x5A, DEV | GUR),
    (0x1C, 0x3C, -1, 0x5B, DEV | GUR),
    (0x21, 0x3C, -1, 0x5C, DEV | BEN | ORI),
    (0x22, 0x3C, -1, 0x5D, DEV | BEN | ORI),
    (0x23, 0x4D, 0xFF, 0x7A, MAL),
    (0x24, 0x4D, 0xFF, 0x4E, BEN),
    (0x28, 0x3C, -1, 0x29, DEV),
    (0x28, 0x4D, 0xFF, 0x7B, MAL),
    (0x2B, 0x3C, -1, 0x5E, DEV | GUR),
    (0x2F, 0x3C, -1, 0x5F, DEV | BEN),
    (0x2C, 0x41, 0x41, 0x0B, TEL),
    (0x30, 0x3C, -1, 0x31, DEV),
    (0x30, 0x4D, 0xFF, 0x7C, MAL),
    (0x32, 0x4D, 0xFF, 0x7D, MAL),
    (0x33, 0x3C, -1, 0x34, DEV),
    (0x33, 0x4D, 0xFF, 0x7E, MAL),
    (0x35, 0x41, -1, 0x2E, TEL),
    (0x3E, 0x45, -1, 0x49, DEV | GUJ),
    (0x3E, 0x46, -1, 0x4A, DEV),
    (0x3E, 0x47, -1, 0x4B, DEV | GUJ),
    (0x3E, 0x48, -1, 0x4C, DEV | GUJ),
    (0x3F, 0x55, -1, 0x40, KAN),
    (0x41, 0x41, -1, 0x42, GUR),
    (0x46, 0x3E, -1, 0x4A, TAM | MAL),
    (0x46, 0x42, 0x55, 0x4B, KAN),
    (0x46, 0x42, -1, 0x4A, KAN),
    (0x46, 0x46, -1, 0x48, MAL),
    (0x46, 0x55, -1, 0x47, TEL | KAN),
    (0x46, 0x56, -1, 0x48, TEL | KAN),
    (0x46, 0x57, -1, 0x4C, TAM | MAL),
    (0x47, 0x3E, -1, 0x4B, BEN | ORI | TAM | MAL),
    (0x47, 0x57, -1, 0x4C, BEN | ORI),
    (0x4A, 0x55, -1, 0x4B, KAN),
    (0x72, 0x3F, -1, 0x07, GUR),
    (0x72, 0x40, -1, 0x08, GUR),
    (0x72, 0x47, -1, 0x0F, GUR),
    (0x73, 0x41, -1, 0x09, GUR),
    (0x73, 0x42, -1, 0x0A, GUR),
    (0x73, 0x4B, -1, 0x13, GUR))

  /** Per-script bitset of first-char offsets that can start a composition. */
  private val decompMask: Map[Int, java.util.BitSet] =
    scripts.values.map(_._1).map { f =>
      val bs = new java.util.BitSet(0x7F)
      decomp.foreach { case (c1, _, _, _, flags) =>
        if ((flags & f) != 0) bs.set(c1)
      }
      f -> bs
    }.toMap

  /** normalize(char[], len) -> String (IndicNormalizer.java:244-258). */
  def normalize(s: String): String = {
    val text = s.toCharArray
    var len = text.length
    var i = 0
    while (i < len) {
      scripts.get(Character.UnicodeBlock.of(text(i))) match {
        case Some((fl, base)) =>
          val ch = text(i) - base
          if (ch >= 0 && ch < 0x7F && decompMask(fl).get(ch))
            len = compose(ch, fl, base, text, i, len)
        case None =>
      }
      i += 1
    }
    new String(text, 0, len)
  }

  private def compose(ch0: Int, fl: Int, base: Int,
                      text: Array[Char], pos: Int, len0: Int): Int = {
    var len = len0
    if (pos + 1 >= len) return len
    val block0 = Character.UnicodeBlock.of(text(pos))
    val ch1 = text(pos + 1) - base
    if (Character.UnicodeBlock.of(text(pos + 1)) ne block0) return len
    var ch2 = -1
    if (pos + 2 < len) {
      ch2 = text(pos + 2) - base
      if (text(pos + 2) == '\u200D') ch2 = 0xFF // zero-width joiner
      else if (Character.UnicodeBlock.of(text(pos + 2)) ne block0) ch2 = -1
    }
    var i = 0
    while (i < decomp.length) {
      val (c1, c2, c3, res, flags) = decomp(i)
      if (c1 == ch0 && (flags & fl) != 0 && c2 == ch1 &&
          (c3 < 0 || c3 == ch2)) {
        text(pos) = (base + res).toChar
        System.arraycopy(text, pos + 2, text, pos + 1, len - pos - 2)
        len -= 1
        if (c3 >= 0) {
          System.arraycopy(text, pos + 2, text, pos + 1, len - pos - 2)
          len -= 1
        }
        return len
      }
      i += 1
    }
    len
  }
}
