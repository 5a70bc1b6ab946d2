package graft.analysis

/** Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980 — a public-domain algorithm), including
  * the two standard departures the reference ships (abli->able folded into
  * bli->ble, and logi->log; see
  * lucene/analysis/common/src/java/org/apache/lucene/analysis/en/PorterStemmer.java:23-44
  * for the reference's statement of the same departures). Behavior is
  * verified against Martin Porter's public 23,531-word test vocabulary
  * (PorterStemSpec), which is also what the reference's
  * TestPorterStemFilter asserts against.
  *
  * Words of length <= 2 are returned unchanged, as in the reference.
  * Input is assumed lowercase (the filter runs after LowerCaseFilter in
  * the English chain, en/EnglishAnalyzer.java:101-116).
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    val s = new Stem(word)
    s.run()
    s.result(word)
  }

  /** Mutable stemming state over a char buffer; `len` is the current word
    * length and `stemLen` the length of the stem left of the suffix most
    * recently matched by `ends`. */
  private final class Stem(word: String) {
    private val b: Array[Char] = word.toCharArray
    private var len: Int = b.length
    private var stemLen: Int = 0

    def result(orig: String): String = {
      if (len == orig.length) {
        // same length can still differ (step 1c rewrites y -> i in place)
        var i = 0
        while (i < len && b(i) == orig.charAt(i)) i += 1
        if (i == len) return orig
      }
      new String(b, 0, len)
    }

    // consonant test: aeiou are vowels; y is a consonant at position 0 or
    // after a vowel (i.e. y is a vowel exactly when preceded by a consonant)
    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** The measure m of b[0, stemLen): the number of vowel->consonant
      * sequence transitions, i.e. m in [C](VC)^m[V]. */
    private def m: Int = {
      var n = 0
      var i = 0
      while (i < stemLen && cons(i)) i += 1
      while (i < stemLen) {
        while (i < stemLen && !cons(i)) i += 1
        if (i < stemLen) {
          n += 1
          while (i < stemLen && cons(i)) i += 1
        }
      }
      n
    }

    private def vowelInStem: Boolean = {
      var i = 0
      while (i < stemLen) { if (!cons(i)) return true; i += 1 }
      false
    }

    private def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    // c-v-c ending at i where the final consonant is not w, x or y
    // (the *o condition used to restore a final e on short words)
    private def cvc(i: Int): Boolean =
      i >= 2 && cons(i) && !cons(i - 1) && cons(i - 2) &&
        b(i) != 'w' && b(i) != 'x' && b(i) != 'y'

    /** True when the current word ends with `s`; on success `stemLen` is
      * set to the length of the word with the suffix removed. */
    private def ends(s: String): Boolean = {
      val l = s.length
      if (l > len) return false
      var i = 0
      while (i < l) {
        if (b(len - l + i) != s.charAt(i)) return false
        i += 1
      }
      stemLen = len - l
      true
    }

    private def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(stemLen + i) = s.charAt(i); i += 1 }
      len = stemLen + s.length
    }

    private def replaceIfM(s: String): Boolean = { if (m > 0) setTo(s); true }

    /** First-match rewrite over (suffix, replacement) pairs, applied when
      * the remaining stem has m > 0. Suffix penultimate/last characters
      * are pairwise group-distinct, so a flat ordered list is equivalent
      * to the paper's dispatch tables. */
    private def rewriteRules(rules: Array[(String, String)]): Unit = {
      var i = 0
      while (i < rules.length) {
        if (ends(rules(i)._1)) { replaceIfM(rules(i)._2); return }
        i += 1
      }
    }

    // Step 1a: plurals — sses->ss, ies->i, ss->ss, s->()
    private def step1a(): Unit =
      if (b(len - 1) == 's') {
        if (ends("sses")) len -= 2
        else if (ends("ies")) setTo("i")
        else if (len >= 2 && b(len - 2) != 's') len -= 1
      }

    // Step 1b: (m>0) eed->ee; (*v*) ed/ing -> () with e-restoration
    private def step1b(): Unit = {
      if (ends("eed")) { if (m > 0) len -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem) {
        len = stemLen
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(len - 1)) {
          val ch = b(len - 1)
          if (ch != 'l' && ch != 's' && ch != 'z') len -= 1
        } else {
          stemLen = len // m over the whole truncated word
          if (m == 1 && cvc(len - 1)) setTo("e")
        }
      }
    }

    // Step 1c: (*v*) y -> i
    private def step1c(): Unit =
      if (ends("y") && vowelInStem) b(len - 1) = 'i'

    private val Step2 = Array(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
      "anci" -> "ance", "izer" -> "ize", "bli" -> "ble", "alli" -> "al",
      "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
      "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
      "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
      "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble", "logi" -> "log")

    private val Step3 = Array(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")

    private val Step4 = Array("al", "ance", "ence", "er", "ic", "able",
      "ible", "ant", "ement", "ment", "ent", "ion", "ou", "ism", "ate",
      "iti", "ous", "ive", "ize")

    // Step 4: drop the suffix when the remaining stem has m > 1; -ion
    // additionally requires the stem to end in s or t
    private def step4(): Unit = {
      if (len <= 1) return
      var i = 0
      while (i < Step4.length) {
        val s = Step4(i)
        if (ends(s)) {
          val ok = s != "ion" ||
            (stemLen >= 1 && (b(stemLen - 1) == 's' || b(stemLen - 1) == 't'))
          if (ok && m > 1) len = stemLen
          return
        }
        i += 1
      }
    }

    // Step 5a: (m>1) e -> (); (m=1 and not *o) e -> ()
    // Step 5b: (m>1 and *d and *L) single letter
    private def step5(): Unit = {
      stemLen = len
      if (b(len - 1) == 'e') {
        val a = m
        if (a > 1 || (a == 1 && !cvc(len - 2))) len -= 1
      }
      if (b(len - 1) == 'l' && doubleC(len - 1)) {
        stemLen = len
        if (m > 1) len -= 1
      }
    }

    def run(): Unit = {
      step1a(); step1b(); step1c()
      if (len > 1) rewriteRules(Step2)
      if (len > 1) rewriteRules(Step3)
      step4(); step5()
    }
  }
}
