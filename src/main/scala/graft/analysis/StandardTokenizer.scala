package graft.analysis

/** One emitted token.
  *
  * @param term       raw matched text (pre-lowercase)
  * @param startOffset char offset of first char
  * @param endOffset   char offset one past last char
  * @param posInc      position increment (>=1; >1 when too-long tokens were
  *                    skipped just before this one)
  * @param tokenType   one of ALPHANUM/NUM/IDEOGRAPHIC/HIRAGANA/KATAKANA/
  *                    HANGUL/SOUTHEAST_ASIAN (reference:
  *                    lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizer.java TOKEN_TYPES)
  */
final case class Token(term: String, startOffset: Int, endOffset: Int,
                       posInc: Int, tokenType: String)

/** UAX#29 word-break tokenizer, behavior-equal (for the scripts we support)
  * to the reference's JFlex-generated
  * `lucene/analysis/common/src/java/org/apache/lucene/analysis/standard/StandardTokenizerImpl.java`
  * as specified by the golden vectors in
  * `lucene/analysis/common/src/test/org/apache/lucene/analysis/standard/TestStandardAnalyzer.java:224-374`.
  *
  * Implemented from the public UAX#29 (Unicode 6.3) rule set, not ported:
  * a two-pass scan (attach Extend/Format per WB4, then pairwise break rules
  * WB5-WB14 with one-base lookahead/lookbehind for the Mid* rules).
  *
  * Too-long tokens (> maxTokenLength chars) are skipped but still advance
  * the position counter (reference: StandardTokenizer.java:156-166).
  */
object StandardTokenizer {

  final val DefaultMaxTokenLength = 255 // StandardAnalyzer.java:42

  // word-break classes (Unicode 6.3 subset relevant to the reference corpus)
  private final val OTHER = 0
  private final val ALETTER = 1      // incl. Hangul + Hebrew letters
  private final val NUMERIC = 2
  private final val KATAKANA = 3
  private final val MIDLETTER = 4
  private final val MIDNUM = 5
  private final val MIDNUMLET = 6    // incl. Single_Quote
  private final val EXTENDNUMLET = 7
  private final val EXTEND = 8
  private final val FORMAT = 9
  private final val NEWLINE = 10
  private final val HAN = 11         // one token per codepoint (IDEOGRAPHIC)
  private final val HIRAGANA = 12    // one token per codepoint
  private final val SEASIAN = 13     // complex-context runs (SOUTHEAST_ASIAN)

  private val SeaScripts: java.util.EnumSet[Character.UnicodeScript] = {
    import Character.UnicodeScript._
    java.util.EnumSet.of(THAI, LAO, KHMER, MYANMAR, NEW_TAI_LUE, TAI_LE,
      TAI_THAM, TAI_VIET, BALINESE, BATAK, BUGINESE, CHAM, JAVANESE,
      KAYAH_LI, LEPCHA, LIMBU, SAURASHTRA, SUNDANESE)
  }

  private def wbClass(cp: Int): Int = {
    if (cp < 128) { // fast ASCII path (dominant for source code)
      if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) return ALETTER
      if (cp >= '0' && cp <= '9') return NUMERIC
      (cp: @annotation.switch) match {
        case ':' => return MIDLETTER
        case ',' | ';' => return MIDNUM
        case '.' | '\'' => return MIDNUMLET
        case '_' => return EXTENDNUMLET
        case '\r' | '\n' | 0x0B | 0x0C => return NEWLINE
        case _ => return OTHER
      }
    }
    cp match {
      case 0x85 | 0x2028 | 0x2029 => NEWLINE
      case 0xB7 | 0x387 | 0x5F4 | 0x2027 | 0xFE13 | 0xFE55 | 0xFF1A => MIDLETTER
      case 0x37E | 0x589 | 0x60C | 0x60D | 0x66C | 0x7F8 | 0x2044 |
           0xFE10 | 0xFE14 | 0xFE50 | 0xFE54 | 0xFF0C | 0xFF1B => MIDNUM
      case 0x2018 | 0x2019 | 0x2024 | 0xFE52 | 0xFF07 | 0xFF0E => MIDNUMLET
      case 0x200C | 0x200D => EXTEND // ZWNJ/ZWJ
      case _ =>
        val t = Character.getType(cp)
        if (t == Character.NON_SPACING_MARK || t == Character.ENCLOSING_MARK ||
            t == Character.COMBINING_SPACING_MARK) EXTEND
        else if (t == Character.FORMAT) FORMAT
        else if (t == Character.CONNECTOR_PUNCTUATION) EXTENDNUMLET
        else if (t == Character.DECIMAL_DIGIT_NUMBER) NUMERIC
        else if (Character.isLetter(cp)) {
          val us = Character.UnicodeScript.of(cp)
          if (us == Character.UnicodeScript.HAN) HAN
          else if (us == Character.UnicodeScript.HIRAGANA) HIRAGANA
          else if (us == Character.UnicodeScript.KATAKANA) KATAKANA
          else if (SeaScripts.contains(us)) SEASIAN
          else ALETTER
        } else OTHER
    }
  }

  // AHLetter per UAX#29 (ALetter | Hebrew_Letter; we fold Hebrew into ALETTER)
  @inline private def isAH(c: Int): Boolean = c == ALETTER
  @inline private def isMidAH(c: Int): Boolean = c == MIDLETTER || c == MIDNUMLET
  @inline private def isMidNum(c: Int): Boolean = c == MIDNUM || c == MIDNUMLET
  @inline private def joinable(c: Int): Boolean =
    c == ALETTER || c == NUMERIC || c == KATAKANA || c == EXTENDNUMLET

  /** Per-thread scratch for the three pass-1 arrays: executor threads
    * tokenize millions of docs, and per-doc allocation of 3 text-length
    * arrays is pure GC/DRAM traffic (measured: it caps multi-core build
    * scaling before CPU does). Grown geometrically, never shrunk. */
  private final class Scratch {
    var cls: Array[Byte] = new Array[Byte](1024)
    var starts: Array[Int] = new Array[Int](1024)
    var ends: Array[Int] = new Array[Int](1024)
    def ensure(n: Int): Unit = if (cls.length < n) {
      // next pow2 >= n, clamped: highestOneBit<<1 overflows past 2^30
      val pow2 = Integer.highestOneBit(n - 1) << 1
      val cap = if (pow2 < n) Int.MaxValue - 8 else pow2
      cls = new Array[Byte](cap)
      starts = new Array[Int](cap)
      ends = new Array[Int](cap)
    }
  }
  private val scratch = ThreadLocal.withInitial[Scratch](() => new Scratch)

  /** Tokenize `text`; returns tokens with offsets, posIncs and types. */
  def tokenize(text: String,
               maxTokenLength: Int = DefaultMaxTokenLength): Vector[Token] = {
    val n = text.length
    // pass 1: base codepoints with WB4 (Extend|Format attach to previous base)
    val sc = scratch.get()
    sc.ensure(n)
    val cls = sc.cls       // per base index
    val starts = sc.starts // char offset of base cp
    val ends = sc.ends     // char offset AFTER base cp + its extends
    var nb = 0
    var i = 0
    while (i < n) {
      val cp = text.codePointAt(i)
      val w = cp >= 0x10000
      val len = if (w) 2 else 1
      val c = wbClass(cp)
      if ((c == EXTEND || c == FORMAT) && nb > 0 && cls(nb - 1) != NEWLINE) {
        ends(nb - 1) = i + len // WB4: attach to previous base
      } else if (c == EXTEND || c == FORMAT) {
        // leading extend/format: its own OTHER-ish base (never joins)
        cls(nb) = OTHER.toByte; starts(nb) = i; ends(nb) = i + len; nb += 1
      } else {
        cls(nb) = c.toByte; starts(nb) = i; ends(nb) = i + len; nb += 1
      }
      i += len
    }
    // pass 2: pairwise break decisions over bases
    @inline def noBreak(k: Int): Boolean = { // between base k and k+1
      val a = cls(k); val b = cls(k + 1)
      if (a == NEWLINE || b == NEWLINE) return false // WB3a/3b
      if (isAH(a) && isAH(b)) return true            // WB5
      if (isAH(a) && isMidAH(b) && k + 2 < nb && isAH(cls(k + 2))) return true // WB6
      if (isMidAH(a) && isAH(b) && k - 1 >= 0 && isAH(cls(k - 1))) return true // WB7
      if (a == NUMERIC && b == NUMERIC) return true  // WB8
      if (isAH(a) && b == NUMERIC) return true       // WB9
      if (a == NUMERIC && isAH(b)) return true       // WB10
      if (isMidNum(a) && b == NUMERIC && k - 1 >= 0 && cls(k - 1) == NUMERIC) return true // WB11
      if (a == NUMERIC && isMidNum(b) && k + 2 < nb && cls(k + 2) == NUMERIC) return true // WB12
      if (a == KATAKANA && b == KATAKANA) return true // WB13
      if (joinable(a) && b == EXTENDNUMLET) return true // WB13a
      if (a == EXTENDNUMLET && joinable(b)) return true // WB13b
      if (a == SEASIAN && b == SEASIAN) return true  // reference ComplexContext runs
      false
    }
    val out = Vector.newBuilder[Token]
    var skipped = 0
    var segStart = 0
    var k = 0
    while (k < nb) {
      val break = k == nb - 1 || !noBreak(k)
      if (break) {
        // segment = bases [segStart..k]
        var hasAH = false; var hasNum = false; var hasKat = false
        var hasHan = false; var hasHira = false; var hasSEA = false
        var hasHangul = false
        var j = segStart
        while (j <= k) {
          cls(j) match {
            case ALETTER =>
              hasAH = true
              // Hangul detection for token type only
              val cp0 = text.codePointAt(starts(j))
              if (Character.UnicodeScript.of(cp0) == Character.UnicodeScript.HANGUL)
                hasHangul = true
            case NUMERIC => hasNum = true
            case KATAKANA => hasKat = true
            case HAN => hasHan = true
            case HIRAGANA => hasHira = true
            case SEASIAN => hasSEA = true
            case _ =>
          }
          j += 1
        }
        if (hasAH || hasNum || hasKat || hasHan || hasHira || hasSEA) {
          val so = starts(segStart); val eo = ends(k)
          if (eo - so <= maxTokenLength) {
            val tpe =
              if (hasHan) "<IDEOGRAPHIC>"
              else if (hasHira) "<HIRAGANA>"
              else if (hasSEA) "<SOUTHEAST_ASIAN>"
              else if (hasAH && !hasHangul) "<ALPHANUM>"
              else if (hasHangul) "<HANGUL>"
              else if (hasKat) "<KATAKANA>"
              else "<NUM>"
            out += Token(text.substring(so, eo), so, eo, skipped + 1, tpe)
            skipped = 0
          } else {
            skipped += 1 // too-long: skip but count position
          }
        }
        segStart = k + 1
      }
      k += 1
    }
    out.result()
  }
}
