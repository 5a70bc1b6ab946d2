package graft.analysis

/** Per-language "light" stemmers — the published UniNE algorithms
  * (Jacques Savoy: "Light Stemming Approaches for the French, Portuguese,
  * German and Hungarian Languages", ACM SAC 2006; "Report on CLEF-2001
  * Experiments" for Spanish/Italian), the same algorithms the reference
  * ships as analysis/common/.../de/GermanLightStemmer.java,
  * es/SpanishLightStemmer.java, it/ItalianLightStemmer.java and
  * fr/FrenchMinimalStemmer.java. Each stems an already-lowercased token;
  * behavior is pinned against the reference's full golden-vector test data
  * (~120k word pairs, LightStemSpec).
  *
  * These are suffix-strip rules over plain Strings: allocation only when
  * the word actually changes (substring), zero for the no-change fast
  * path that dominates code/English-heavy corpora.
  */
object LightStemmers {

  /** Fold the accented vowels the UniNE algorithms normalize first.
    * (German folds umlauts; es/it share the same 5-vowel fold table.) */
  private def foldVowels(w: String): String = {
    var i = 0
    while (i < w.length) {
      if (fold(w.charAt(i)) != w.charAt(i)) {
        val a = w.toCharArray
        var j = i
        while (j < a.length) { a(j) = fold(a(j)); j += 1 }
        return new String(a)
      }
      i += 1
    }
    w
  }

  private def fold(c: Char): Char = c match {
    case 'à' | 'á' | 'â' | 'ä' => 'a'
    case 'ò' | 'ó' | 'ô' | 'ö' => 'o'
    case 'è' | 'é' | 'ê' | 'ë' => 'e'
    case 'ù' | 'ú' | 'û' | 'ü' => 'u'
    case 'ì' | 'í' | 'î' | 'ï' => 'i'
    case other => other
  }

  // German folds i-accents but NOT e-accents (é stays; see the paper's
  // umlaut table — only a/o/i/u families)
  private def foldGerman(w: String): String = {
    var changed = false
    var i = 0
    while (!changed && i < w.length) {
      val c = w.charAt(i)
      changed = c != (c match {
        case 'ä' | 'à' | 'á' | 'â' => 'a'
        case 'ö' | 'ò' | 'ó' | 'ô' => 'o'
        case 'ï' | 'ì' | 'í' | 'î' => 'i'
        case 'ü' | 'ù' | 'ú' | 'û' => 'u'
        case other => other
      })
      i += 1
    }
    if (!changed) return w
    val a = w.toCharArray
    var j = 0
    while (j < a.length) {
      a(j) = a(j) match {
        case 'ä' | 'à' | 'á' | 'â' => 'a'
        case 'ö' | 'ò' | 'ó' | 'ô' => 'o'
        case 'ï' | 'ì' | 'í' | 'î' => 'i'
        case 'ü' | 'ù' | 'ú' | 'û' => 'u'
        case other => other
      }
      j += 1
    }
    new String(a)
  }

  /** Consonants before which a final -s / -st is a German inflection. */
  private def deStEnding(ch: Char): Boolean = ch match {
    case 'b' | 'd' | 'f' | 'g' | 'h' | 'k' | 'l' | 'm' | 'n' | 't' => true
    case _ => false
  }

  /** German light (UniNE): fold umlauts, then two suffix passes —
    * plural/case endings (-ern/-em/-en/-er/-es/-e/-s) then
    * superlative/comparative (-est/-er/-en/-st). */
  def german(w0: String): String = {
    val w = foldGerman(w0)
    var n = w.length
    // pass 1: declension endings
    if (n > 5 && w.charAt(n - 3) == 'e' && w.charAt(n - 2) == 'r' &&
      w.charAt(n - 1) == 'n') n -= 3
    else if (n > 4 && w.charAt(n - 2) == 'e' &&
      (w.charAt(n - 1) == 'm' || w.charAt(n - 1) == 'n' ||
        w.charAt(n - 1) == 'r' || w.charAt(n - 1) == 's')) n -= 2
    else if (n > 3 && w.charAt(n - 1) == 'e') n -= 1
    else if (n > 3 && w.charAt(n - 1) == 's' && deStEnding(w.charAt(n - 2)))
      n -= 1
    // pass 2: degree endings on the reduced form
    if (n > 5 && w.charAt(n - 3) == 'e' && w.charAt(n - 2) == 's' &&
      w.charAt(n - 1) == 't') n -= 3
    else if (n > 4 && w.charAt(n - 2) == 'e' &&
      (w.charAt(n - 1) == 'r' || w.charAt(n - 1) == 'n')) n -= 2
    else if (n > 4 && w.charAt(n - 2) == 's' && w.charAt(n - 1) == 't' &&
      deStEnding(w.charAt(n - 3))) n -= 2
    if (n == w.length) w else w.substring(0, n)
  }

  /** Spanish light (CLEF-2001): strip final vowel o/a/e, or plural
    * -os/-as/-es (with -ces -> -z and -eses -> -es). Words under 5 chars
    * are left alone. */
  def spanish(w0: String): String = {
    if (w0.length < 5) return w0
    val w = foldVowels(w0)
    val n = w.length
    w.charAt(n - 1) match {
      case 'o' | 'a' | 'e' => w.substring(0, n - 1)
      case 's' =>
        if (w.charAt(n - 2) == 'e' && w.charAt(n - 3) == 's' &&
          w.charAt(n - 4) == 'e') w.substring(0, n - 2)
        else if (w.charAt(n - 2) == 'e' && w.charAt(n - 3) == 'c')
          w.substring(0, n - 3) + "z"
        else if (w.charAt(n - 2) == 'o' || w.charAt(n - 2) == 'a' ||
          w.charAt(n - 2) == 'e') w.substring(0, n - 2)
        else w
      case _ => w
    }
  }

  /** Italian light (CLEF-2001): strip final vowel, two chars when the
    * vowel follows i/h per the rule table. Words under 6 chars are left
    * alone. */
  def italian(w0: String): String = {
    if (w0.length < 6) return w0
    val w = foldVowels(w0)
    val n = w.length
    val last = w.charAt(n - 1)
    val prev = w.charAt(n - 2)
    last match {
      case 'e' => if (prev == 'i' || prev == 'h') w.substring(0, n - 2)
                  else w.substring(0, n - 1)
      case 'i' => if (prev == 'h' || prev == 'i') w.substring(0, n - 2)
                  else w.substring(0, n - 1)
      case 'a' | 'o' => if (prev == 'i') w.substring(0, n - 2)
                        else w.substring(0, n - 1)
      case _ => w
    }
  }

  /** French minimal (Savoy's general-French stemming procedure): -aux ->
    * -al, then strip at most one each of final x, s, r, e, é, and a
    * doubled final consonant. Words under 6 chars are left alone. */
  def french(w: String): String = {
    if (w.length < 6) return w
    var n = w.length
    if (w.charAt(n - 1) == 'x') {
      if (w.charAt(n - 3) == 'a' && w.charAt(n - 2) == 'u')
        return w.substring(0, n - 2) + "l"
      return w.substring(0, n - 1)
    }
    if (w.charAt(n - 1) == 's') n -= 1
    if (w.charAt(n - 1) == 'r') n -= 1
    if (w.charAt(n - 1) == 'e') n -= 1
    if (w.charAt(n - 1) == 'é') n -= 1
    if (w.charAt(n - 1) == w.charAt(n - 2)) n -= 1
    if (n == w.length) w else w.substring(0, n)
  }

  /** Stemmer + ISO code for a configured analyzer name (the language
    * analyzers IndexConfig accepts beyond "standard"/"english"). */
  val byName: Map[String, (String, String => String)] = Map(
    "german" -> (("de", german _)),
    "spanish" -> (("es", spanish _)),
    "italian" -> (("it", italian _)),
    "french" -> (("fr", french _)))
}
