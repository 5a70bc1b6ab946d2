package graft.analysis

/** Phonetic encoders (reference surface: Solr PhoneticFilterFactory,
  * solr/core/src/java/org/apache/solr/analysis/... + lucene/analysis/
  * phonetic backed by commons-codec). */
object Phonetic {

  /** US-census Soundex code (the classic 4-char letter+3-digit form the
    * reference exposes via Solr's PhoneticFilterFactory + commons-codec
    * Soundex; algorithm is public — Knuth TAOCP vol. 3 §5.4): consonant
    * classes b f p v=1, c g j k q s x z=2, d t=3, l=4, m n=5, r=6;
    * adjacent same-code letters collapse; h/w are transparent between
    * same-code consonants; vowels reset; pad with zeros. Empty/non-letter
    * leading input returns "" (filter passes the token through). */
  def soundex(w: String): String = {
    var i = 0
    while (i < w.length && !w.charAt(i).isLetter) i += 1
    if (i == w.length) return ""
    @inline def code(c: Char): Int = c match {
      case 'b' | 'f' | 'p' | 'v' => 1
      case 'c' | 'g' | 'j' | 'k' | 'q' | 's' | 'x' | 'z' => 2
      case 'd' | 't' => 3
      case 'l' => 4
      case 'm' | 'n' => 5
      case 'r' => 6
      case _ => 0 // vowels + h/w/y
    }
    val sb = new java.lang.StringBuilder(4)
    val first = Character.toLowerCase(w.charAt(i))
    sb.append(Character.toUpperCase(first))
    var last = code(first)
    i += 1
    while (i < w.length && sb.length < 4) {
      val c = Character.toLowerCase(w.charAt(i))
      val k = code(c)
      if (k > 0 && k != last) { sb.append(k); last = k }
      else if (c != 'h' && c != 'w') last = k // vowel (incl. y) resets
      i += 1
    }
    while (sb.length < 4) sb.append('0')
    sb.toString
  }
}
