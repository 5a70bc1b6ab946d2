package graft.analysis

/** Brazilian Portuguese stemmer (reference
  * analysis/common/src/java/org/apache/lucene/analysis/br/BrazilianStemmer.java:25).
  * "Very similar to the snowball portuguese algorithm but not exactly the
  * same" — it deaccents FIRST (changeTerm), so stems differ from Snowball pt
  * on every accented word, and the reference's published vectors
  * (TestBrazilianAnalyzer.java:41ff) depend on several literal quirks that
  * are preserved here on purpose:
  *
  *  - step1's "logias" (length-6) branch DISCARDS the replaceSuffix result
  *    (BrazilianStemmer.java:425 `replaceSuffix(CT,"logias","log") ;` — no
  *    assignment) yet still returns "altered", so "...logias" words skip
  *    step2/step4 with CT unchanged;
  *  - step2's first length-3 "ira" branch removes suffix "ava" instead of
  *    "ira" (BrazilianStemmer.java:872 `removeSuffix(CT,"ava")`), a no-op
  *    that still marks the term altered;
  *  - R1/R2/RV are captured from the ORIGINAL changed term and never
  *    recomputed as CT shrinks (stem() at BrazilianStemmer.java:46-78) —
  *    all later region checks test those stale strings;
  *  - getR1 scans only indices [0, len-1) so a vowel/non-vowel found at the
  *    last position never opens a region (BrazilianStemmer.java:124-155).
  *
  * stem() returns None for unindexable terms (length outside (2,30) after
  * punctuation trim) — the filter keeps the original; a term with any
  * non-letter returns just the deaccented form (BrazilianStemFilter.java:59-67
  * replaces the token whenever the result is non-null and differs).
  */
object BrazilianStemmer {

  /** Filter-level entry: reference br/BrazilianStemFilter.java:59-67. */
  def filter(term: String): String = stem(term).getOrElse(term)

  def stem(term: String): Option[String] = {
    val ct0 = createCT(term)
    if (!isIndexable(ct0)) return None
    if (!isStemmable(ct0)) return Some(ct0)

    // regions captured once from the original CT (never recomputed)
    val r1 = getR1(ct0)
    val r2 = getR1(r1)
    val rv = getRV(ct0)

    var ct = ct0
    var altered = false

    // ---- step1: standard suffix removal (BrazilianStemmer.java:404-548)
    def step1(): Boolean = {
      if (ct == null) return false
      def del(sfx: String, region: String): Boolean =
        if (suffix(ct, sfx) && suffix(region, sfx)) { ct = removeSuffix(ct, sfx); true }
        else false
      def rep(sfx: String, to: String, region: String): Boolean =
        if (suffix(ct, sfx) && suffix(region, sfx)) { ct = replaceSuffix(ct, sfx, to); true }
        else false

      // suffix length = 7
      if (rep("uciones", "u", r2)) return true
      // suffix length = 6
      if (ct.length >= 6) {
        if (del("imentos", r2)) return true
        if (del("amentos", r2)) return true
        if (del("adores", r2)) return true
        if (del("adoras", r2)) return true
        // reference quirk: result discarded, still "altered"
        if (suffix(ct, "logias") && suffix(r2, "logias")) { replaceSuffix(ct, "logias", "log"); return true }
        if (rep("encias", "ente", r2)) return true
        if (del("amente", r1)) return true
        if (del("idades", r2)) return true
      }
      // suffix length = 5
      if (ct.length >= 5) {
        if (del("acoes", r2)) return true
        if (del("imento", r2)) return true
        if (del("amento", r2)) return true
        if (del("adora", r2)) return true
        if (del("ismos", r2)) return true
        if (del("istas", r2)) return true
        if (rep("logia", "log", r2)) return true
        if (rep("ucion", "u", r2)) return true
        if (rep("encia", "ente", r2)) return true
        if (del("mente", r2)) return true
        if (del("idade", r2)) return true
      }
      // suffix length = 4
      if (ct.length >= 4) {
        if (del("acao", r2)) return true
        if (del("ezas", r2)) return true
        if (del("icos", r2)) return true
        if (del("icas", r2)) return true
        if (del("ismo", r2)) return true
        if (del("avel", r2)) return true
        if (del("ivel", r2)) return true
        if (del("ista", r2)) return true
        if (del("osos", r2)) return true
        if (del("osas", r2)) return true
        if (del("ador", r2)) return true
        if (del("ivas", r2)) return true
        if (del("ivos", r2)) return true
        if (suffix(ct, "iras") && suffix(rv, "iras") && suffixPreceded(ct, "iras", "e")) {
          ct = replaceSuffix(ct, "iras", "ir"); return true
        }
      }
      // suffix length = 3
      if (ct.length >= 3) {
        if (del("eza", r2)) return true
        if (del("ico", r2)) return true
        if (del("ica", r2)) return true
        if (del("oso", r2)) return true
        if (del("osa", r2)) return true
        if (del("iva", r2)) return true
        if (del("ivo", r2)) return true
        if (suffix(ct, "ira") && suffix(rv, "ira") && suffixPreceded(ct, "ira", "e")) {
          ct = replaceSuffix(ct, "ira", "ir"); return true
        }
      }
      false
    }

    // ---- step2: verb suffixes in RV (BrazilianStemmer.java:568-973)
    def step2(): Boolean = {
      if (rv == null) return false
      // removes from CT when the (stale) RV carries the suffix
      def del(sfx: String): Boolean =
        if (suffix(rv, sfx)) { ct = removeSuffix(ct, sfx); true } else false

      if (rv.length >= 7) {
        for (s <- Seq("issemos", "essemos", "assemos", "ariamos", "eriamos", "iriamos"))
          if (del(s)) return true
      }
      if (rv.length >= 6) {
        for (s <- Seq("iremos", "eremos", "aremos", "avamos", "iramos", "eramos",
                      "aramos", "asseis", "esseis", "isseis", "arieis", "erieis", "irieis"))
          if (del(s)) return true
      }
      if (rv.length >= 5) {
        for (s <- Seq("irmos", "iamos", "armos", "ermos", "areis", "ereis", "ireis",
                      "asses", "esses", "isses", "astes", "assem", "essem", "issem",
                      "ardes", "erdes", "irdes", "ariam", "eriam", "iriam", "arias",
                      "erias", "irias", "estes", "istes", "areis", "aveis"))
          if (del(s)) return true
      }
      if (rv.length >= 4) {
        for (s <- Seq("aria", "eria", "iria", "asse", "esse", "isse", "aste", "este",
                      "iste", "arei", "erei", "irei", "aram", "eram", "iram", "avam",
                      "arem", "erem", "irem", "ando", "endo", "indo", "arao", "erao",
                      "irao", "adas", "idas", "aras", "eras", "iras", "avas", "ares",
                      "eres", "ires", "ados", "idos", "amos", "emos", "imos", "iras",
                      "ieis"))
          if (del(s)) return true
      }
      if (rv.length >= 3) {
        for (s <- Seq("ada", "ida", "ara", "era")) if (del(s)) return true
        // reference quirk (BrazilianStemmer.java:872): matches "ira" but
        // removes "ava" — a no-op that still reports "altered"
        if (suffix(rv, "ira")) { ct = removeSuffix(ct, "ava"); return true }
        for (s <- Seq("iam", "ado", "ido", "ias", "ais", "eis", "ira", "ear"))
          if (del(s)) return true
      }
      if (rv.length >= 2) {
        for (s <- Seq("ia", "ei", "am", "em", "ar", "er", "ir", "as", "es", "is",
                      "eu", "iu", "ou"))
          if (del(s)) return true
      }
      false
    }

    // ---- step3: 'i' preceded by 'c' in RV (BrazilianStemmer.java:979-987)
    def step3(): Unit =
      if (rv != null && suffix(rv, "i") && suffixPreceded(rv, "i", "c"))
        ct = removeSuffix(ct, "i")

    // ---- step4: residual suffix (BrazilianStemmer.java:996-1012)
    def step4(): Unit = {
      if (rv == null) return
      if (suffix(rv, "os")) { ct = removeSuffix(ct, "os"); return }
      if (suffix(rv, "a")) { ct = removeSuffix(ct, "a"); return }
      if (suffix(rv, "i")) { ct = removeSuffix(ct, "i"); return }
      if (suffix(rv, "o")) { ct = removeSuffix(ct, "o") }
    }

    // ---- step5: final e / gue / cie (BrazilianStemmer.java:1022-1040)
    def step5(): Unit = {
      if (rv == null) return
      if (suffix(rv, "e")) {
        if (suffixPreceded(rv, "e", "gu")) {
          ct = removeSuffix(ct, "e"); ct = removeSuffix(ct, "u")
        } else if (suffixPreceded(rv, "e", "ci")) {
          ct = removeSuffix(ct, "e"); ct = removeSuffix(ct, "i")
        } else ct = removeSuffix(ct, "e")
      }
    }

    altered = step1()
    if (!altered) altered = step2()
    if (altered) step3() else step4()
    step5()
    Some(ct)
  }

  private def isStemmable(term: String): Boolean = term.forall(Character.isLetter)

  private def isIndexable(term: String): Boolean = term.length < 30 && term.length > 2

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  /** Region after the first non-vowel following a vowel — scanning only
    * [0, len-1), as the reference does (BrazilianStemmer.java:124-155). */
  private def getR1(value: String): String = {
    if (value == null) return null
    val i = value.length - 1
    var j = 0
    while (j < i && !isVowel(value.charAt(j))) j += 1
    if (j >= i) return null
    while (j < i && isVowel(value.charAt(j))) j += 1
    if (j >= i) return null
    value.substring(j + 1)
  }

  /** RV per BrazilianStemmer.java:175-229. */
  private def getRV(value: String): String = {
    if (value == null) return null
    val i = value.length - 1
    if (i > 0 && !isVowel(value.charAt(1))) {
      var j = 2
      while (j < i && !isVowel(value.charAt(j))) j += 1
      if (j < i) return value.substring(j + 1)
    }
    if (i > 1 && isVowel(value.charAt(0)) && isVowel(value.charAt(1))) {
      var j = 2
      while (j < i && isVowel(value.charAt(j))) j += 1
      if (j < i) return value.substring(j + 1)
    }
    if (i > 2) value.substring(3) else null
  }

  /** Lowercase + deaccent (BrazilianStemmer.java:239-283 changeTerm). */
  private def changeTerm(value: String): String = {
    val lower = value.toLowerCase(java.util.Locale.ROOT) // pt-BR lowercasing == ROOT
    val sb = new StringBuilder(lower.length)
    lower.foreach {
      case 'á' | 'â' | 'ã' => sb += 'a'
      case 'é' | 'ê'       => sb += 'e'
      case 'í'             => sb += 'i'
      case 'ó' | 'ô' | 'õ' => sb += 'o'
      case 'ú' | 'ü'       => sb += 'u'
      case 'ç'             => sb += 'c'
      case 'ñ'             => sb += 'n'
      case c               => sb += c
    }
    sb.toString
  }

  /** changeTerm + strip ONE leading and ONE trailing punctuation char
    * (BrazilianStemmer.java:361-399 createCT). */
  private def createCT(term: String): String = {
    var ct = changeTerm(term)
    if (ct.length < 2) return ct
    if ("\"'-,;.?!".indexOf(ct.charAt(0)) >= 0) ct = ct.substring(1)
    if (ct.length < 2) return ct
    if ("-,;.?!'\"".indexOf(ct.charAt(ct.length - 1)) >= 0) ct = ct.substring(0, ct.length - 1)
    ct
  }

  private def suffix(value: String, sfx: String): Boolean =
    value != null && sfx != null && value.length >= sfx.length && value.endsWith(sfx)

  private def removeSuffix(value: String, toRemove: String): String =
    if (value == null || toRemove == null || !suffix(value, toRemove)) value
    else value.substring(0, value.length - toRemove.length)

  private def replaceSuffix(value: String, toReplace: String, changeTo: String): String = {
    if (value == null || toReplace == null || changeTo == null) return value
    val v = removeSuffix(value, toReplace)
    if (v == value) value else v + changeTo
  }

  private def suffixPreceded(value: String, sfx: String, preceded: String): Boolean =
    suffix(value, sfx) && suffix(removeSuffix(value, sfx), preceded)
}
