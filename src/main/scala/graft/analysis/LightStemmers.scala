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

  // ---- round-3 additions: pt / ru / sv / fi / hu light stemmers ----
  // (reference analysis/common/.../{pt,ru,sv,fi,hu}/*LightStemmer.java —
  // the published UniNE / CLEF-2003 / Dolamic-Savoy rule tables; each is
  // pinned against the reference's FULL golden zip in LightStemSpec.)

  @inline private def ends(s: Array[Char], len: Int, suf: String): Boolean = {
    val m = suf.length
    if (len < m) return false
    var i = 0
    while (i < m) {
      if (s(len - m + i) != suf.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Portuguese light (UniNE, pt/PortugueseLightStemmer.java): plural /
    * adverb suffixes with orthographic repair (-ões->-ão, -ns->-m,
    * -eis->-el...), feminine->masculine normalization, final-vowel strip,
    * then accent fold (incl. ã/õ/ç — folded LAST, the repairs write
    * accented chars). */
  def portuguese(w0: String): String = {
    if (w0.length < 4) return w0
    val s = w0.toCharArray
    var len = s.length
    // removeSuffix
    if (len > 4 && ends(s, len, "es") &&
      (s(len - 3) == 'r' || s(len - 3) == 's' || s(len - 3) == 'l' ||
        s(len - 3) == 'z')) len -= 2
    else if (len > 3 && ends(s, len, "ns")) { s(len - 2) = 'm'; len -= 1 }
    else if (len > 4 && (ends(s, len, "eis") || ends(s, len, "éis"))) {
      s(len - 3) = 'e'; s(len - 2) = 'l'; len -= 1
    }
    else if (len > 4 && ends(s, len, "ais")) { s(len - 2) = 'l'; len -= 1 }
    else if (len > 4 && ends(s, len, "óis")) {
      s(len - 3) = 'o'; s(len - 2) = 'l'; len -= 1
    }
    else if (len > 4 && ends(s, len, "is")) s(len - 1) = 'l'
    else if (len > 3 && (ends(s, len, "ões") || ends(s, len, "ães"))) {
      len -= 1; s(len - 2) = 'ã'; s(len - 1) = 'o'
    }
    else if (len > 6 && ends(s, len, "mente")) len -= 5
    else if (len > 3 && s(len - 1) == 's') len -= 1
    // normFeminine
    if (len > 3 && s(len - 1) == 'a') {
      if (len > 7 && (ends(s, len, "inha") || ends(s, len, "iaca") ||
          ends(s, len, "eira"))) s(len - 1) = 'o'
      else if (len > 6) {
        if (ends(s, len, "osa") || ends(s, len, "ica") ||
          ends(s, len, "ida") || ends(s, len, "ada") ||
          ends(s, len, "iva") || ends(s, len, "ama")) s(len - 1) = 'o'
        else if (ends(s, len, "ona")) {
          s(len - 3) = 'ã'; s(len - 2) = 'o'; len -= 1
        }
        else if (ends(s, len, "ora")) len -= 1
        else if (ends(s, len, "esa")) { s(len - 3) = 'ê'; len -= 1 }
        else if (ends(s, len, "na")) s(len - 1) = 'o'
      }
    }
    if (len > 4 && (s(len - 1) == 'e' || s(len - 1) == 'a' ||
      s(len - 1) == 'o')) len -= 1
    var i = 0
    while (i < len) {
      s(i) = s(i) match {
        case 'à' | 'á' | 'â' | 'ä' | 'ã' => 'a'
        case 'ò' | 'ó' | 'ô' | 'ö' | 'õ' => 'o'
        case 'è' | 'é' | 'ê' | 'ë' => 'e'
        case 'ù' | 'ú' | 'û' | 'ü' => 'u'
        case 'ì' | 'í' | 'î' | 'ï' => 'i'
        case 'ç' => 'c'
        case other => other
      }
      i += 1
    }
    new String(s, 0, len)
  }

  private val RuCase3 = Seq("иям", "иях", "оях", "ями", "оям", "оьв", "ами",
    "его", "ему", "ери", "ими", "ого", "ому", "ыми", "оев")
  private val RuCase2 = Seq("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия",
    "ию", "ьв", "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
    "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")
  private val RuFinal = Set('а', 'е', 'и', 'о', 'у', 'й', 'ы', 'я', 'ь')

  /** Russian light (Dolamic & Savoy "Indexing and Searching Strategies
    * for the Russian Language", ru/RussianLightStemmer.java): one case
    * suffix (4/3/2/1 chars) then a soft-sign / -и / -нн normalization. */
  def russian(w0: String): String = {
    val s = w0.toCharArray
    var len = s.length
    // removeCase
    if (len > 6 && (ends(s, len, "иями") || ends(s, len, "оями"))) len -= 4
    else if (len > 5 && RuCase3.exists(ends(s, len, _))) len -= 3
    else if (len > 4 && RuCase2.exists(ends(s, len, _))) len -= 2
    else if (len > 3 && RuFinal.contains(s(len - 1))) len -= 1
    // normalize
    if (len > 3) {
      if (s(len - 1) == 'ь' || s(len - 1) == 'и') len -= 1
      else if (s(len - 1) == 'н' && s(len - 2) == 'н') len -= 1
    }
    if (len == w0.length) w0 else new String(s, 0, len)
  }

  /** Swedish light (CLEF-2003, sv/SwedishLightStemmer.java): optional
    * final -s, then ONE definite/plural/degree suffix by length. */
  def swedish(w0: String): String = {
    val s = w0.toCharArray
    var len = s.length
    if (len > 4 && s(len - 1) == 's') len -= 1
    if (len > 7 && (ends(s, len, "elser") || ends(s, len, "heten"))) len -= 5
    else if (len > 6 && (ends(s, len, "arne") || ends(s, len, "erna") ||
      ends(s, len, "ande") || ends(s, len, "else") || ends(s, len, "aste") ||
      ends(s, len, "orna") || ends(s, len, "aren"))) len -= 4
    else if (len > 5 && (ends(s, len, "are") || ends(s, len, "ast") ||
      ends(s, len, "het"))) len -= 3
    else if (len > 4 && (ends(s, len, "ar") || ends(s, len, "er") ||
      ends(s, len, "or") || ends(s, len, "en") || ends(s, len, "at") ||
      ends(s, len, "te") || ends(s, len, "et"))) len -= 2
    else if (len > 3 && (s(len - 1) == 't' || s(len - 1) == 'a' ||
      s(len - 1) == 'e' || s(len - 1) == 'n')) len -= 1
    if (len == w0.length) w0 else new String(s, 0, len)
  }

  @inline private def fiVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' => true
    case _ => false
  }

  /** Finnish light (CLEF-2003, fi/FinnishLightStemmer.java): fold ä/å/ö,
    * strip particles (-kin/-ko, recursively), possessives, one case
    * ending, then two normalization passes incl. the geminate k/p/t
    * smoothing. */
  def finnish(w0: String): String = {
    if (w0.length < 4) return w0
    val s = w0.toCharArray
    var len = s.length
    var i = 0
    while (i < len) {
      s(i) = s(i) match {
        case 'ä' | 'å' => 'a'
        case 'ö' => 'o'
        case other => other
      }
      i += 1
    }
    // step1 (recursive particle strip)
    var again = true
    while (again) {
      again = false
      if (len > 8 && ends(s, len, "kin")) { len -= 3; again = true }
      else if (len > 8 && ends(s, len, "ko")) { len -= 2; again = true }
    }
    if (len > 11 && ends(s, len, "dellinen")) len -= 8
    else if (len > 11 && ends(s, len, "dellisuus")) len -= 9
    // step2
    if (len > 5) {
      if (ends(s, len, "lla") || ends(s, len, "tse") || ends(s, len, "sti"))
        len -= 3
      else if (ends(s, len, "ni")) len -= 2
      else if (ends(s, len, "aa")) len -= 1
    }
    // step3
    if (len > 8 && ends(s, len, "nnen")) { s(len - 4) = 's'; len -= 3 }
    else if (len > 8 && ends(s, len, "ntena")) { s(len - 5) = 's'; len -= 4 }
    else if (len > 8 && ends(s, len, "tten")) len -= 4
    else if (len > 8 && ends(s, len, "eiden")) len -= 5
    else if (len > 6 && (ends(s, len, "neen") || ends(s, len, "niin") ||
      ends(s, len, "seen") || ends(s, len, "teen") || ends(s, len, "inen")))
      len -= 4
    else if (len > 6 && s(len - 3) == 'h' && fiVowel(s(len - 2)) &&
      s(len - 1) == 'n') len -= 3
    else if (len > 6 && ends(s, len, "den")) { s(len - 3) = 's'; len -= 2 }
    else if (len > 6 && ends(s, len, "ksen")) { s(len - 4) = 's'; len -= 3 }
    else if (len > 6 && (ends(s, len, "ssa") || ends(s, len, "sta") ||
      ends(s, len, "lla") || ends(s, len, "lta") || ends(s, len, "tta") ||
      ends(s, len, "ksi") || ends(s, len, "lle"))) len -= 3
    else if (len > 5 && (ends(s, len, "na") || ends(s, len, "ne"))) len -= 2
    else if (len > 5 && ends(s, len, "nei")) len -= 3
    else if (len > 4 && (ends(s, len, "ja") || ends(s, len, "ta"))) len -= 2
    else if (len > 4 && s(len - 1) == 'a') len -= 1
    else if (len > 4 && s(len - 1) == 'n' && fiVowel(s(len - 2))) len -= 2
    else if (len > 4 && s(len - 1) == 'n') len -= 1
    // norm1
    if (len > 5 && ends(s, len, "hde")) {
      s(len - 3) = 'k'; s(len - 2) = 's'; s(len - 1) = 'i'
    }
    if (len > 4 && (ends(s, len, "ei") || ends(s, len, "at"))) len -= 2
    else if (len > 3 && (s(len - 1) == 't' || s(len - 1) == 's' ||
      s(len - 1) == 'j' || s(len - 1) == 'e' || s(len - 1) == 'a' ||
      s(len - 1) == 'i')) len -= 1
    // norm2
    if (len > 8 && (s(len - 1) == 'e' || s(len - 1) == 'o' ||
      s(len - 1) == 'u')) len -= 1
    if (len > 4) {
      if (s(len - 1) == 'i') len -= 1
      if (len > 4) {
        // geminate k/p/t smoothing: delete the second of a double
        var ch = s(0)
        var j = 1
        while (j < len) {
          if (s(j) == ch && (ch == 'k' || ch == 'p' || ch == 't')) {
            System.arraycopy(s, j + 1, s, j, len - j - 1)
            len -= 1
          } else {
            ch = s(j)
            j += 1
          }
        }
      }
    }
    new String(s, 0, len)
  }

  @inline private def huVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' => true
    case _ => false
  }

  /** Hungarian light (UniNE, hu/HungarianLightStemmer.java): fold
    * accents/long vowels, then one case suffix, one possessive suffix,
    * the -k plural, and a final-vowel normalization. */
  def hungarian(w0: String): String = {
    val s = w0.toCharArray
    var len = s.length
    var i = 0
    while (i < len) {
      s(i) = s(i) match {
        case 'á' => 'a'
        case 'ë' | 'é' => 'e'
        case 'í' => 'i'
        case 'ó' | 'ő' | 'õ' | 'ö' => 'o'
        case 'ú' | 'ű' | 'ũ' | 'û' | 'ü' => 'u'
        case other => other
      }
      i += 1
    }
    // removeCase
    if (len > 6 && ends(s, len, "kent")) len -= 4
    else if (len > 5 && (ends(s, len, "nak") || ends(s, len, "nek") ||
      ends(s, len, "val") || ends(s, len, "vel") || ends(s, len, "ert") ||
      ends(s, len, "rol") || ends(s, len, "ban") || ends(s, len, "ben") ||
      ends(s, len, "bol") || ends(s, len, "nal") || ends(s, len, "nel") ||
      ends(s, len, "hoz") || ends(s, len, "hez") || ends(s, len, "tol")))
      len -= 3
    else if (len > 5 && (ends(s, len, "al") || ends(s, len, "el")) &&
      !huVowel(s(len - 3)) && s(len - 3) == s(len - 4)) len -= 3
    else if (len > 4 && (ends(s, len, "at") || ends(s, len, "et") ||
      ends(s, len, "ot") || ends(s, len, "va") || ends(s, len, "ve") ||
      ends(s, len, "ra") || ends(s, len, "re") || ends(s, len, "ba") ||
      ends(s, len, "be") || ends(s, len, "ul") || ends(s, len, "ig")))
      len -= 2
    else if (len > 4 && (ends(s, len, "on") || ends(s, len, "en")) &&
      !huVowel(s(len - 3))) len -= 2
    else if (len > 4 && (s(len - 1) == 't' || s(len - 1) == 'n')) len -= 1
    else if (len > 4 && (s(len - 1) == 'a' || s(len - 1) == 'e') &&
      s(len - 2) == s(len - 3) && !huVowel(s(len - 2))) len -= 2
    // removePossessive
    if (len > 6 && !huVowel(s(len - 5)) &&
      (ends(s, len, "atok") || ends(s, len, "otok") || ends(s, len, "etek")))
      len -= 4
    else if (len > 6 && (ends(s, len, "itek") || ends(s, len, "itok")))
      len -= 4
    else if (len > 5 && !huVowel(s(len - 4)) &&
      (ends(s, len, "unk") || ends(s, len, "tok") || ends(s, len, "tek")))
      len -= 3
    else if (len > 5 && huVowel(s(len - 4)) && ends(s, len, "juk")) len -= 3
    else if (len > 5 && ends(s, len, "ink")) len -= 3
    else if (len > 4 && !huVowel(s(len - 3)) &&
      (ends(s, len, "am") || ends(s, len, "em") || ends(s, len, "om") ||
        ends(s, len, "ad") || ends(s, len, "ed") || ends(s, len, "od") ||
        ends(s, len, "uk"))) len -= 2
    else if (len > 4 && huVowel(s(len - 3)) &&
      (ends(s, len, "nk") || ends(s, len, "ja") || ends(s, len, "je")))
      len -= 2
    else if (len > 4 && (ends(s, len, "im") || ends(s, len, "id") ||
      ends(s, len, "ik"))) len -= 2
    else if (len > 3 && (s(len - 1) == 'a' || s(len - 1) == 'e') &&
      !huVowel(s(len - 2))) len -= 1
    else if (len > 3 && (s(len - 1) == 'm' || s(len - 1) == 'd') &&
      huVowel(s(len - 2))) len -= 1
    else if (len > 3 && s(len - 1) == 'i') len -= 1
    // removePlural (reference has an intentional fallthrough: -ak/-ok/-ek
    // drop 2 only when len > 4, else every -k drops 1)
    if (len > 3 && s(len - 1) == 'k') {
      if (len > 4 && (s(len - 2) == 'a' || s(len - 2) == 'o' ||
        s(len - 2) == 'e')) len -= 2
      else len -= 1
    }
    // normalize
    if (len > 3 && (s(len - 1) == 'a' || s(len - 1) == 'e' ||
      s(len - 1) == 'i' || s(len - 1) == 'o')) len -= 1
    new String(s, 0, len)
  }

  /** Stemmer + ISO code for a configured analyzer name (the language
    * analyzers IndexConfig accepts beyond "standard"/"english"). */
  val byName: Map[String, (String, String => String)] = Map(
    "german" -> (("de", german _)),
    "spanish" -> (("es", spanish _)),
    "italian" -> (("it", italian _)),
    "french" -> (("fr", french _)),
    "portuguese" -> (("pt", portuguese _)),
    "russian" -> (("ru", russian _)),
    "swedish" -> (("sv", swedish _)),
    "finnish" -> (("fi", finnish _)),
    "hungarian" -> (("hu", hungarian _)))
}
