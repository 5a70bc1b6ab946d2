package graft.analysis

/** UTR#30-style character foldings (reference icu/ICUFoldingFilter.java:63,
  * which applies the precompiled utr30 Normalizer2 set): accent removal
  * (NFKD + nonspacing/enclosing mark removal), default-ignorable removal
  * (ZWJ/ZWNJ and other format chars), full case folding (per code point,
  * so final sigma folds to σ and İ to i; ß expands to ss), decimal digit
  * folding to ASCII, and the Latin diacritic folds NFKD cannot reach
  * (æ -> ae, đ -> d, ø -> o, ...). The pipeline is applied repeatedly
  * until a fixed point, matching the recursive closure the compiled
  * utr30.nrm bakes in (e.g. ẞ -> ß -> ss). Verified against the
  * reference's TestICUFoldingFilter vectors (Greek, Deseret, Arabic
  * presentation forms, Bengali digits, Turkish dotted I). */
object IcuFolding {

  private val latinFold: Map[Int, String] = Map(
    'æ'.toInt -> "ae", 'œ'.toInt -> "oe", 'ø'.toInt -> "o",
    'đ'.toInt -> "d", 'ð'.toInt -> "d", 'þ'.toInt -> "th",
    'ł'.toInt -> "l", 'ħ'.toInt -> "h", 'ŧ'.toInt -> "t",
    'ĸ'.toInt -> "q", 'ı'.toInt -> "i")

  def fold(s: String): String = {
    var cur = s
    var prev: String = null
    var guard = 0
    while (cur != prev && guard < 4) {
      prev = cur
      cur = foldOnce(cur)
      guard += 1
    }
    cur
  }

  private def foldOnce(s: String): String = {
    val de = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(de.length)
    var i = 0
    while (i < de.length) {
      val cp = de.codePointAt(i)
      val t = Character.getType(cp)
      if (t == Character.NON_SPACING_MARK || t == Character.ENCLOSING_MARK ||
          t == Character.FORMAT) {
        // accent / default-ignorable removal
      } else if (cp == 'ß') sb.append("ss")
      else if (cp == 'ς') sb.append('σ') // full case folding: final sigma
      else {
        val lower = Character.toLowerCase(cp)
        latinFold.get(lower) match {
          case Some(r) => sb.append(r)
          case None =>
            if (t == Character.DECIMAL_DIGIT_NUMBER) {
              val d = Character.digit(cp, 10)
              if (d >= 0) sb.append(('0' + d).toChar)
              else sb.appendCodePoint(lower)
            } else sb.appendCodePoint(lower)
        }
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }
}
