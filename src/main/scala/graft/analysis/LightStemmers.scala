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

  // ---- round-3 additions, wave 2: no / de-minimal / cz / lv / bg / hi /
  // id (reference analysis/common/.../{no,de,cz,lv,bg,hi,id}/*Stemmer.java
  // semantics; golden data = the reference's nb_light/nb_minimal txt,
  // deminimaltestdata.zip, and the Java-test vectors, all in
  // src/test/resources/stems/.)

  /** Norwegian (Bokmål) light (no/NorwegianLightStemmer.java, BOKMAAL
    * flag — the NorwegianAnalyzer default): possessive -s, then one
    * ending by length (-heter/-heten, -dom/-het, -elser/-elsen,
    * -ende/-else/-este/-eren, -ere/-est/-ene, -er/-en/-et/-st/-te,
    * final a/e/n). */
  def norwegian(w0: String): String = {
    val s = w0.toCharArray
    var len = s.length
    if (len > 4 && s(len - 1) == 's') len -= 1
    if (len > 7 && (ends(s, len, "heter") || ends(s, len, "heten"))) len -= 5
    else if (len > 5 && (ends(s, len, "dom") || ends(s, len, "het"))) len -= 3
    else if (len > 7 && (ends(s, len, "elser") || ends(s, len, "elsen")))
      len -= 5
    else if (len > 6 && (ends(s, len, "ende") || ends(s, len, "else") ||
      ends(s, len, "este") || ends(s, len, "eren"))) len -= 4
    else if (len > 5 && (ends(s, len, "ere") || ends(s, len, "est") ||
      ends(s, len, "ene"))) len -= 3
    else if (len > 4 && (ends(s, len, "er") || ends(s, len, "en") ||
      ends(s, len, "et") || ends(s, len, "st") || ends(s, len, "te")))
      len -= 2
    else if (len > 3 && (s(len - 1) == 'a' || s(len - 1) == 'e' ||
      s(len - 1) == 'n')) len -= 1
    if (len == w0.length) w0 else new String(s, 0, len)
  }

  /** Norwegian (Bokmål) minimal (no/NorwegianMinimalStemmer.java):
    * genitive -s, -ene, -er/-en/-et, final a/e only. */
  /** English minimal (s-)stemmer (reference en/EnglishMinimalStemmer
    * .java:24-43, including the INTENTIONAL case-'e' fallthrough to the
    * default strip): plural -s removal with -ies -> -y (unless a/e
    * precedes the i) and us/ss/vowel-e keep guards. */
  def englishMinimal(w: String): String = {
    val len = w.length
    if (len < 3 || w.charAt(len - 1) != 's') return w
    w.charAt(len - 2) match {
      case 'u' | 's' => w
      case 'e' =>
        if (len > 3 && w.charAt(len - 3) == 'i' &&
          w.charAt(len - 4) != 'a' && w.charAt(len - 4) != 'e')
          w.substring(0, len - 3) + "y"
        else if (w.charAt(len - 3) == 'i' || w.charAt(len - 3) == 'a' ||
          w.charAt(len - 3) == 'o' || w.charAt(len - 3) == 'e') w
        else w.substring(0, len - 1) // the fallthrough
      case _ => w.substring(0, len - 1)
    }
  }

  def norwegianMinimal(w0: String): String = {
    val s = w0.toCharArray
    var len = s.length
    if (len > 4 && s(len - 1) == 's') len -= 1
    if (len > 5 && ends(s, len, "ene")) len -= 3
    else if (len > 4 && (ends(s, len, "er") || ends(s, len, "en") ||
      ends(s, len, "et"))) len -= 2
    else if (len > 3 && (s(len - 1) == 'a' || s(len - 1) == 'e')) len -= 1
    if (len == w0.length) w0 else new String(s, 0, len)
  }

  /** German minimal (de/GermanMinimalStemmer.java): words >= 5 chars
    * only; umlauts fold FIRST, then -nen, one of {-en,-se,-es,-er}, then
    * a single n/e/s/r. */
  def germanMinimal(w0: String): String = {
    if (w0.length < 5) return w0
    val s = w0.toCharArray
    var len = s.length
    var i = 0
    while (i < len) {
      s(i) match {
        case 'ä' => s(i) = 'a'
        case 'ö' => s(i) = 'o'
        case 'ü' => s(i) = 'u'
        case _ =>
      }
      i += 1
    }
    if (len > 6 && ends(s, len, "nen")) len -= 3
    else if (len > 5 && (ends(s, len, "en") || ends(s, len, "se") ||
      ends(s, len, "es") || ends(s, len, "er"))) len -= 2
    else if (s(len - 1) == 'n' || s(len - 1) == 'e' || s(len - 1) == 's' ||
      s(len - 1) == 'r') len -= 1
    new String(s, 0, len)
  }

  private val CzCase3 = Array("ech", "ich", "ích", "ého", "ěmi", "emi",
    "ému", "ěte", "ete", "ěti", "eti", "ího", "iho", "ími", "ímu", "imu",
    "ách", "ata", "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
  private val CzCase2 = Array("em", "es", "ém", "ím", "ům", "at", "ám",
    "os", "us", "ým", "mi", "ou")
  private val CzFinal = "aeiouůyáéíýě"

  /** Czech light (cz/CzechStemmer.java — Dolamic & Savoy's published
    * Czech stemmer): case-ending cascade, possessive -ov/-in/-ův, then
    * palatalization repair (čt->ck, št->sk, c/č->k, z/ž->h, e-insertion
    * undo, ů->o). */
  def czech(w0: String): String = {
    val s = w0.toCharArray
    var len = s.length
    // removeCase
    if (len > 7 && ends(s, len, "atech")) len -= 5
    else if (len > 6 && (ends(s, len, "ětem") || ends(s, len, "etem") ||
      ends(s, len, "atům"))) len -= 4
    else if (len > 5 && CzCase3.exists(ends(s, len, _))) len -= 3
    else if (len > 4 && CzCase2.exists(ends(s, len, _))) len -= 2
    else if (len > 3 && CzFinal.indexOf(s(len - 1).toInt) >= 0) len -= 1
    // removePossessives
    if (len > 5 && (ends(s, len, "ov") || ends(s, len, "in") ||
      ends(s, len, "ův"))) len -= 2
    // normalize
    if (len > 0) {
      if (ends(s, len, "čt")) { s(len - 2) = 'c'; s(len - 1) = 'k' }
      else if (ends(s, len, "št")) { s(len - 2) = 's'; s(len - 1) = 'k' }
      else if (s(len - 1) == 'c' || s(len - 1) == 'č') s(len - 1) = 'k'
      else if (s(len - 1) == 'z' || s(len - 1) == 'ž') s(len - 1) = 'h'
      else if (len > 1 && s(len - 2) == 'e') { s(len - 2) = s(len - 1); len -= 1 }
      else if (len > 2 && s(len - 2) == 'ů') s(len - 2) = 'o'
    }
    new String(s, 0, len)
  }

  /** (suffix, min vowel count, fires palatalization) — ordered longest
    * first, exactly the reference's table (lv/LatvianStemmer.java). */
  private val LvAffixes: Array[(String, Int, Boolean)] = Array(
    ("ajiem", 3, false), ("ajai", 3, false), ("ajam", 2, false),
    ("ajām", 2, false), ("ajos", 2, false), ("ajās", 2, false),
    ("iem", 2, true), ("ajā", 2, false), ("ais", 2, false), ("ai", 2, false),
    ("ei", 2, false), ("ām", 1, false), ("am", 1, false), ("ēm", 1, false),
    ("īm", 1, false), ("im", 1, false), ("um", 1, false), ("us", 1, true),
    ("as", 1, false), ("ās", 1, false), ("es", 1, false), ("os", 1, true),
    ("ij", 1, false), ("īs", 1, false), ("ēs", 1, false), ("is", 1, false),
    ("ie", 1, false), ("u", 1, true), ("a", 1, true), ("i", 1, true),
    ("e", 1, false), ("ā", 1, false), ("ē", 1, false), ("ī", 1, false),
    ("ū", 1, false), ("o", 1, false), ("s", 0, false), ("š", 0, false))

  /** Latvian light (lv/LatvianStemmer.java — "light" per Karlis
    * Kreslins' thesis posture): one inflectional affix (only when the
    * remainder keeps >= 3 chars and more vowels than the affix), with
    * unpalatalization repair on the gen.pl. affixes. */
  def latvian(w0: String): String = {
    val s = w0.toCharArray
    val len = s.length
    var nv = 0
    var i = 0
    while (i < len) {
      if ("aeiouāīēū".indexOf(s(i).toInt) >= 0) nv += 1
      i += 1
    }
    var k = 0
    while (k < LvAffixes.length) {
      val (suf, vc, pal) = LvAffixes(k)
      if (nv > vc && len >= suf.length + 3 && ends(s, len, suf)) {
        val nl = len - suf.length
        val out = if (pal) lvUnpalatalize(s, nl) else nl
        return new String(s, 0, out)
      }
      k += 1
    }
    w0
  }

  private def lvUnpalatalize(s: Array[Char], len0: Int): Int = {
    var len = len0
    // s(len) is the first removed char: -u? then gen.pl kš->kst / ņņ->nn
    if (s(len) == 'u') {
      if (ends(s, len, "kš")) {
        len += 1; s(len - 2) = 's'; s(len - 1) = 't'; return len
      }
      if (ends(s, len, "ņņ")) { s(len - 2) = 'n'; s(len - 1) = 'n'; return len }
    }
    if (ends(s, len, "pj") || ends(s, len, "bj") || ends(s, len, "mj") ||
      ends(s, len, "vj")) len - 1
    else if (ends(s, len, "šņ")) { s(len - 2) = 's'; s(len - 1) = 'n'; len }
    else if (ends(s, len, "žņ")) { s(len - 2) = 'z'; s(len - 1) = 'n'; len }
    else if (ends(s, len, "šļ")) { s(len - 2) = 's'; s(len - 1) = 'l'; len }
    else if (ends(s, len, "žļ")) { s(len - 2) = 'z'; s(len - 1) = 'l'; len }
    else if (ends(s, len, "ļņ")) { s(len - 2) = 'l'; s(len - 1) = 'n'; len }
    else if (ends(s, len, "ļļ")) { s(len - 2) = 'l'; s(len - 1) = 'l'; len }
    else if (s(len - 1) == 'č') { s(len - 1) = 'c'; len }
    else if (s(len - 1) == 'ļ') { s(len - 1) = 'l'; len }
    else if (s(len - 1) == 'ņ') { s(len - 1) = 'n'; len }
    else len
  }

  /** Bulgarian light (bg/BulgarianStemmer.java — Savoy's published light
    * stemmer, with the reference's ен->н fix): definite-article removal,
    * plural repair (ци->к, зи->г, еXи->яX, си->х...), final я/а/о/е,
    * then ен->н and ъN->N smoothing. */
  def bulgarian(w0: String): String = {
    val s = w0.toCharArray
    var len = s.length
    if (len < 4) return w0
    if (len > 5 && ends(s, len, "ища")) return new String(s, 0, len - 3)
    // removeArticle
    if (len > 6 && ends(s, len, "ият")) len -= 3
    else if (len > 5 && (ends(s, len, "ът") || ends(s, len, "то") ||
      ends(s, len, "те") || ends(s, len, "та") || ends(s, len, "ия")))
      len -= 2
    else if (len > 4 && ends(s, len, "ят")) len -= 2
    // removePlural
    if (len > 6 && ends(s, len, "овци")) len -= 3
    else if (len > 6 && ends(s, len, "ове")) len -= 3
    else if (len > 6 && ends(s, len, "еве")) { s(len - 3) = 'й'; len -= 2 }
    else if (len > 5 && ends(s, len, "ища")) len -= 3
    else if (len > 5 && ends(s, len, "та")) len -= 2
    else if (len > 5 && ends(s, len, "ци")) { s(len - 2) = 'к'; len -= 1 }
    else if (len > 5 && ends(s, len, "зи")) { s(len - 2) = 'г'; len -= 1 }
    else if (len > 5 && s(len - 3) == 'е' && s(len - 1) == 'и') {
      s(len - 3) = 'я'; len -= 1
    }
    else if (len > 4 && ends(s, len, "си")) { s(len - 2) = 'х'; len -= 1 }
    else if (len > 4 && ends(s, len, "и")) len -= 1
    if (len > 3) {
      if (ends(s, len, "я")) len -= 1
      // NB the second strip is NOT re-guarded on the shortened length —
      // BulgarianStemmer.java applies both ifs inside one len>3 block
      if (ends(s, len, "а") || ends(s, len, "о") || ends(s, len, "е"))
        len -= 1
    }
    if (len > 4 && ends(s, len, "ен")) { s(len - 2) = 'н'; len -= 1 }
    if (len > 5 && s(len - 2) == 'ъ') { s(len - 2) = s(len - 1); len -= 1 }
    if (len == w0.length) w0 else new String(s, 0, len)
  }

  private val Hi5 = Array("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ",
    "ाइयों", "ाइयां")
  private val Hi4 = Array("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी",
    "एंगे", "ेंगे", "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं",
    "ियाँ", "ियों", "ियां")
  private val Hi3 = Array("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी",
    "ोगे", "ाने", "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं",
    "ुएं", "ुआं")
  private val Hi2 = Array("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना",
    "ते", "ीं", "ती", "ता", "ाँ", "ां", "ों", "ें")
  private val Hi1 = Array("ो", "े", "ू", "ु", "ी", "ि", "ा")

  /** Hindi light (hi/HindiStemmer.java — Ramanathan & Rao's published
    * lightweight Hindi stemmer): longest-first Devanagari suffix strip,
    * guarded by a minimum remaining length per tier. */
  def hindi(w0: String): String = {
    val s = w0.toCharArray
    val len = s.length
    if (len > 6 && Hi5.exists(ends(s, len, _)))
      return new String(s, 0, len - 5)
    if (len > 5 && Hi4.exists(ends(s, len, _)))
      return new String(s, 0, len - 4)
    if (len > 4 && Hi3.exists(ends(s, len, _)))
      return new String(s, 0, len - 3)
    if (len > 3 && Hi2.exists(ends(s, len, _)))
      return new String(s, 0, len - 2)
    if (len > 2 && Hi1.exists(ends(s, len, _)))
      return new String(s, 0, len - 1)
    w0
  }

  /** Hindi normalization (hi/HindiNormalizer.java — Devanagari
    * orthographic normalization per Ljiljana Dolamic's work): dead n ->
    * bindu, candrabindu -> bindu, nukta forms folded, virama/ZWJ/ZWNJ
    * deleted, chandra and long vowels shortened. Runs BEFORE the Hindi
    * stemmer in the reference HindiAnalyzer chain. */
  def hindiNormalize(w: String): String = {
    val s = w.toCharArray
    var len = s.length
    @inline def delete(at: Int): Unit = {
      var j = at
      while (j < len - 1) { s(j) = s(j + 1); j += 1 }
      len -= 1
    }
    var i = 0
    while (i < len) {
      s(i) match {
        case 'न' => // dead n -> bindu
          if (i + 1 < len && s(i + 1) == '्') {
            s(i) = 'ं'; delete(i + 1)
          }
        case 'ँ' => s(i) = 'ं' // candrabindu -> bindu
        case '़' => delete(i); i -= 1 // nukta
        case 'ऩ' => s(i) = 'न'
        case 'ऱ' => s(i) = 'र'
        case 'ऴ' => s(i) = 'ळ'
        case 'क़' => s(i) = 'क'
        case 'ख़' => s(i) = 'ख'
        case 'ग़' => s(i) = 'ग'
        case 'ज़' => s(i) = 'ज'
        case 'ड़' => s(i) = 'ड'
        case 'ढ़' => s(i) = 'ढ'
        case 'फ़' => s(i) = 'फ'
        case 'य़' => s(i) = 'य'
        case '‍' | '‌' => delete(i); i -= 1 // zwj/zwnj
        case '्' => delete(i); i -= 1 // virama
        case 'ॅ' | 'ॆ' => s(i) = 'े' // chandra/short e
        case 'ॉ' | 'ॊ' => s(i) = 'ो'
        case 'ऍ' | 'ऎ' => s(i) = 'ए'
        case 'ऑ' | 'ऒ' => s(i) = 'ओ'
        case 'ॲ' => s(i) = 'अ'
        case 'आ' => s(i) = 'अ' // long -> short independents
        case 'ई' => s(i) = 'इ'
        case 'ऊ' => s(i) = 'उ'
        case 'ॠ' => s(i) = 'ऋ'
        case 'ॡ' => s(i) = 'ऌ'
        case 'ऐ' => s(i) = 'ए'
        case 'औ' => s(i) = 'ओ'
        case 'ी' => s(i) = 'ि' // long -> short dependents
        case 'ू' => s(i) = 'ु'
        case 'ॄ' => s(i) = 'ृ'
        case 'ॣ' => s(i) = 'ॢ'
        case 'ै' => s(i) = 'े'
        case 'ौ' => s(i) = 'ो'
        case _ =>
      }
      i += 1
    }
    if (len == w.length) new String(s) else new String(s, 0, len)
  }

  /** Full Hindi chain step (the HindiAnalyzer order, hi/HindiAnalyzer
    * .java:126-133: IndicNormalizationFilter -> HindiNormalizationFilter
    * -> HindiStemFilter). */
  def hindiChain(w: String): String =
    hindi(hindiNormalize(IndicNormalizer.normalize(w)))

  /** Indonesian (id/IndonesianStemmer.java — Asian/Tahaghoghi/Williams'
    * published algorithm, stemDerivational=true): particle and
    * possessive-pronoun suffixes, then first-order prefix (meng-/peng-/
    * di-/ter-/ke- with sandhi repair), suffix (-kan/-an/-i, blocked by
    * prefix flags), second-order prefix (ber-/per-/pe-), all gated on
    * keeping > 2 syllables. */
  def indonesian(w0: String): String = {
    var text = w0
    var syll = text.count(c => "aeiou".indexOf(c.toInt) >= 0)
    var flags = 0
    val KE = 1; val PENG = 2; val DI = 4; val MENG = 8; val TER = 16
    val BER = 32; val PE = 64
    def drop(n: Int): Unit = { text = text.substring(n); syll -= 1 }
    def dropEnd(n: Int): Unit = {
      text = text.substring(0, text.length - n); syll -= 1
    }
    // particles
    if (syll > 2 && (text.endsWith("kah") || text.endsWith("lah") ||
      text.endsWith("pun"))) dropEnd(3)
    // possessive pronouns
    if (syll > 2) {
      if (text.endsWith("ku") || text.endsWith("mu")) dropEnd(2)
      else if (text.endsWith("nya")) dropEnd(3)
    }
    def vowel(c: Char): Boolean = "aeiou".indexOf(c.toInt) >= 0
    def firstOrderPrefix(): Boolean = {
      val t = text
      if (t.startsWith("meng")) { flags |= MENG; drop(4) }
      else if (t.startsWith("meny") && t.length > 4 && vowel(t.charAt(4))) {
        flags |= MENG; text = "s" + t.substring(4); syll -= 1
      }
      else if (t.startsWith("men")) { flags |= MENG; drop(3) }
      else if (t.startsWith("mem")) { flags |= MENG; drop(3) }
      else if (t.startsWith("me")) { flags |= MENG; drop(2) }
      else if (t.startsWith("peng")) { flags |= PENG; drop(4) }
      else if (t.startsWith("peny") && t.length > 4 && vowel(t.charAt(4))) {
        flags |= PENG; text = "s" + t.substring(4); syll -= 1
      }
      else if (t.startsWith("peny")) { flags |= PENG; drop(4) }
      else if (t.startsWith("pen") && t.length > 3 && vowel(t.charAt(3))) {
        flags |= PENG; text = "t" + t.substring(3); syll -= 1
      }
      else if (t.startsWith("pen")) { flags |= PENG; drop(3) }
      else if (t.startsWith("pem")) { flags |= PENG; drop(3) }
      else if (t.startsWith("di")) { flags |= DI; drop(2) }
      else if (t.startsWith("ter")) { flags |= TER; drop(3) }
      else if (t.startsWith("ke")) { flags |= KE; drop(2) }
      else return false
      true
    }
    def secondOrderPrefix(): Unit = {
      val t = text
      if (t.startsWith("ber")) { flags |= BER; drop(3) }
      else if (t == "belajar") { flags |= BER; drop(3) }
      else if (t.startsWith("be") && t.length > 4 && !vowel(t.charAt(2)) &&
        t.charAt(3) == 'e' && t.charAt(4) == 'r') { flags |= BER; drop(2) }
      else if (t.startsWith("per")) drop(3)
      else if (t == "pelajar") drop(3)
      else if (t.startsWith("pe")) { flags |= PE; drop(2) }
    }
    def suffix(): Unit = {
      val t = text
      if (t.endsWith("kan") && (flags & KE) == 0 && (flags & PENG) == 0 &&
        (flags & PE) == 0) dropEnd(3)
      else if (t.endsWith("an") && (flags & DI) == 0 && (flags & MENG) == 0 &&
        (flags & TER) == 0) dropEnd(2)
      else if (t.endsWith("i") && !t.endsWith("si") && (flags & BER) == 0 &&
        (flags & KE) == 0 && (flags & PENG) == 0) dropEnd(1)
    }
    // stemDerivational
    val fired = if (syll > 2) firstOrderPrefix() else false
    if (fired) {
      val before = text.length
      if (syll > 2) suffix()
      if (text.length != before && syll > 2) secondOrderPrefix()
    } else {
      if (syll > 2) secondOrderPrefix()
      if (syll > 2) suffix()
    }
    text
  }

  /** Sorani Kurdish normalization (ckb/SoraniNormalizer.java): unify
    * yeh/kaf forms, ZWNJ and harakat removal, heh/teh-marbuta -> ae,
    * initial reh -> rreh, drop FORMAT-category codepoints. */
  def soraniNormalize(w: String): String = {
    val sb = new java.lang.StringBuilder(w.length)
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      c match {
        case 'ي' | 'ى' => sb.append('ی') // yeh -> farsi yeh
        case 'ك' => sb.append('ک') // kaf -> keheh
        case '‌' => // ZWNJ: heh before it becomes ae; ZWNJ dropped
          if (sb.length > 0 && sb.charAt(sb.length - 1) == 'ه')
            sb.setCharAt(sb.length - 1, 'ە')
        case 'ه' =>
          // final heh -> ae; chars after a heh are untouched when the
          // Java loop visits it, so "last" means last in the source
          sb.append(if (i == w.length - 1) 'ە' else 'ه')
        case 'ة' => sb.append('ە') // teh marbuta -> ae
        case 'ھ' => sb.append('ه') // heh doachashmee -> heh
        case 'ر' => // initial reh -> rreh
          sb.append(if (sb.length == 0) 'ڕ' else 'ر')
        case 'ڒ' => sb.append('ڕ') // rreh-above -> rreh
        case 'ـ' | 'ً' | 'ٌ' | 'ٍ' | 'َ' |
             'ُ' | 'ِ' | 'ّ' | 'ْ' => // tatweel/harakat
        case other =>
          if (Character.getType(other) != Character.FORMAT) sb.append(other)
      }
      i += 1
    }
    sb.toString
  }

  /** Sorani Kurdish stemmer (ckb/SoraniStemmer.java): postposition,
    * possessive pronoun, then ONE ezafe/definiteness/plural/demonstrative
    * ending. Applied after [[soraniNormalize]] (the analyzer order). */
  def soraniStem(w0: String): String = {
    val s = w0.toCharArray
    var len = s.length
    // postposition
    if (len > 5 && ends(s, len, "دا")) len -= 2
    else if (len > 4 && ends(s, len, "نا")) len -= 1
    else if (len > 6 && ends(s, len, "ەوە")) len -= 3
    // possessive pronoun
    if (len > 6 && (ends(s, len, "مان") || ends(s, len, "یان") ||
      ends(s, len, "تان"))) len -= 3
    // one nominal ending (the reference's else-if ladder, incl. the two
    // early returns for the ezafe singulars)
    if (len > 6 && ends(s, len, "ێکی")) len -= 3
    else if (len > 7 && ends(s, len, "یەکی")) len -= 4
    else if (len > 5 && ends(s, len, "ێک")) len -= 2
    else if (len > 6 && ends(s, len, "یەک")) len -= 3
    else if (len > 6 && ends(s, len, "ەکە")) len -= 3
    else if (len > 5 && ends(s, len, "کە")) len -= 2
    else if (len > 7 && ends(s, len, "ەکان")) len -= 4
    else if (len > 6 && ends(s, len, "کان")) len -= 3
    else if (len > 7 && ends(s, len, "یانی")) len -= 4
    else if (len > 6 && ends(s, len, "انی")) len -= 3
    else if (len > 6 && ends(s, len, "یان")) len -= 3
    else if (len > 5 && ends(s, len, "ان")) len -= 2
    else if (len > 7 && ends(s, len, "یانە")) len -= 4
    else if (len > 6 && ends(s, len, "انە")) len -= 3
    else if (len > 5 && (ends(s, len, "ایە") || ends(s, len, "ەیە"))) len -= 2
    else if (len > 4 && ends(s, len, "ە")) len -= 1
    else if (len > 4 && ends(s, len, "ی")) len -= 1
    if (len == w0.length) w0 else new String(s, 0, len)
  }

  /** Arabic normalization (ar/ArabicNormalizer.java): hamza'd alefs ->
    * bare alef, dotless yeh -> yeh, teh marbuta -> heh, drop tatweel and
    * harakat. */
  def arabicNormalize(w: String): String = {
    val sb = new java.lang.StringBuilder(w.length)
    var i = 0
    while (i < w.length) {
      w.charAt(i) match {
        case 'آ' | 'أ' | 'إ' => sb.append('ا') // alef
        case 'ى' => sb.append('ي') // dotless yeh -> yeh
        case 'ة' => sb.append('ه') // teh marbuta -> heh
        case 'ـ' | 'ً' | 'ٌ' | 'ٍ' | 'َ' |
             'ُ' | 'ِ' | 'ّ' | 'ْ' => // tatweel/harakat
        case other => sb.append(other)
      }
      i += 1
    }
    sb.toString
  }

  private val ArPrefixes = Array("ال", "وال",
    "بال", "كال", "فال",
    "لل", "و")
  private val ArSuffixes = Array("ها", "ان",
    "ات", "ون", "ين", "يه",
    "ية", "ه", "ة", "ي")

  /** Arabic light stemmer (ar/ArabicStemmer.java — Larkey/Ballesteros/
    * Connell's published light-10): ONE definite-article/waw prefix
    * (wa- needs >= 3 chars left, others >= 2), then EVERY matching
    * suffix in table order (each needs >= 2 chars left). */
  def arabicStem(w0: String): String = {
    var t = w0
    var i = 0
    var done = false
    while (i < ArPrefixes.length && !done) {
      val p = ArPrefixes(i)
      val minLen = if (p.length == 1) 4 else p.length + 2
      if (t.length >= minLen && t.startsWith(p)) {
        t = t.substring(p.length); done = true
      }
      i += 1
    }
    var j = 0
    while (j < ArSuffixes.length) {
      val suf = ArSuffixes(j)
      if (t.length >= suf.length + 2 && t.endsWith(suf))
        t = t.substring(0, t.length - suf.length)
      j += 1
    }
    t
  }

  /** Persian normalization (fa/PersianNormalizer.java): farsi yeh /
    * yeh barree -> yeh, keheh -> kaf, heh-yeh / heh-goal -> heh, drop
    * hamza-above. The PersianAnalyzer has no stemmer — normalization IS
    * the chain (applied after arabicNormalize, per the analyzer order). */
  def persianNormalize(w: String): String = {
    val sb = new java.lang.StringBuilder(w.length)
    var i = 0
    while (i < w.length) {
      w.charAt(i) match {
        case 'ی' | 'ے' => sb.append('ي') // -> yeh
        case 'ک' => sb.append('ك') // keheh -> kaf
        case 'ۀ' | 'ہ' => sb.append('ه') // -> heh
        case 'ٔ' => // hamza above: dropped
        case other => sb.append(other)
      }
      i += 1
    }
    sb.toString
  }

  /** Full Persian chain step (lowercase + arabic-normalize +
    * persian-normalize, the PersianAnalyzer.java filter order). */
  def persian(w: String): String =
    persianNormalize(arabicNormalize(w.toLowerCase(java.util.Locale.ROOT)))

  /** Full Arabic chain step (lowercase + normalize + stem, the
    * ArabicAnalyzer.java filter order). */
  def arabic(w: String): String =
    arabicStem(arabicNormalize(w.toLowerCase(java.util.Locale.ROOT)))

  /** Full Sorani chain step (lowercase + normalize + stem, the
    * SoraniAnalyzer.java filter order) as one token function. */
  def sorani(w: String): String =
    soraniStem(soraniNormalize(w.toLowerCase(java.util.Locale.ROOT)))

  /** Stemmer + ISO code for a configured analyzer name (the language
    * analyzers IndexConfig accepts beyond "standard"/"english"). */
  val byName: Map[String, (String, String => String)] = Map(
    "german" -> (("de", german _)),
    "german_minimal" -> (("de", germanMinimal _)),
    // the classic Caumanns stemmer (GermanStemFilter/Factory)
    "german_caumanns" -> (("de", GermanCaumanns.stem _)),
    "spanish" -> (("es", spanish _)),
    "italian" -> (("it", italian _)),
    "french" -> (("fr", french _)),
    "portuguese" -> (("pt", portuguese _)),
    "russian" -> (("ru", russian _)),
    "swedish" -> (("sv", swedish _)),
    "finnish" -> (("fi", finnish _)),
    "hungarian" -> (("hu", hungarian _)),
    "norwegian" -> (("no", norwegian _)),
    "norwegian_minimal" -> (("no", norwegianMinimal _)),
    "czech" -> (("cz", czech _)),
    "latvian" -> (("lv", latvian _)),
    "bulgarian" -> (("bg", bulgarian _)),
    "hindi" -> (("hi", hindiChain _)),
    "indonesian" -> (("id", indonesian _)),
    "sorani" -> (("ckb", sorani _)),
    "arabic" -> (("ar", arabic _)),
    "persian" -> (("fa", persian _)),
    "greek" -> (("el", (w: String) =>
      GreekStemmer.stem(GreekStemmer.lowerCase(w)))),
    // Snowball-backed analyzers (reference nl/da/ro/tr *Analyzer.java ->
    // org.tartarus generated stemmers). Dutch applies the analyzer's
    // built-in stem-override dictionary first (DutchAnalyzer.java:82-86:
    // fiets/bromfiets keep themselves, ei -> eier, kind -> kinder).
    "dutch" -> (("nl", (w: String) => dutchStemDict.getOrElse(
      w.toLowerCase(java.util.Locale.ROOT),
      SnowballStemmers.dutch(w)))),
    "danish" -> (("da", SnowballStemmers.danish _)),
    "romanian" -> (("ro", SnowballStemmers.romanian _)),
    "turkish" -> (("tr", SnowballStemmers.turkish _)),
    "german_snowball" -> (("de", SnowballStemmers.german _)),
    "german2" -> (("de", SnowballStemmers.german2 _)),
    // Lovins English stemmer (Solr SnowballPorterFilterFactory
    // language="Lovins"; reference ext/LovinsStemmer.java)
    "lovins" -> (("en", LovinsStemmer.stem _)),
    // RSLP rule-file stemmers (reference gl/GalicianAnalyzer.java,
    // gl/GalicianMinimalStemFilter.java, pt/PortugueseStemFilter.java)
    "galician" -> (("gl", Rslp.galician _)),
    "galician_minimal" -> (("gl", Rslp.galicianMinimal _)),
    "portuguese_rslp" -> (("pt", Rslp.portuguese _)),
    // hy/eu/ca Snowball analyzers (reference hy/ArmenianAnalyzer.java,
    // eu/BasqueAnalyzer.java, ca/CatalanAnalyzer.java; catalan's
    // ElisionFilter runs pre-lowercase in IndexBuilder.chainFlat)
    "armenian" -> (("hy", SnowballStemmers2.armenian _)),
    "basque" -> (("eu", SnowballStemmers2.basque _)),
    "catalan" -> (("ca", SnowballStemmers2.catalan _)),
    // Brazilian Portuguese (reference br/BrazilianAnalyzer.java:123-136:
    // StandardTokenizer -> lowercase -> stop -> BrazilianStemFilter);
    // deaccents before stemming, unlike Snowball pt
    "brazilian" -> (("br", BrazilianStemmer.filter _)),
    // Polish via the Stempel patch-command trie (reference
    // stempel/.../pl/PolishAnalyzer.java:139-148 + the published
    // stemmer_20000.tbl)
    "polish" -> (("pl", Stempel.filter _)),
    // Irish (reference ga/IrishAnalyzer.java:150 -> ext/IrishStemmer.java;
    // the chain's elision + IrishLowerCase run as `pre` in IndexBuilder)
    "irish" -> (("ga", SnowballStemmers2.irish _)))

  /** DutchAnalyzer's DEFAULT_STEM_DICT (StemmerOverrideFilter entries). */
  private val dutchStemDict: Map[String, String] = Map(
    "fiets" -> "fiets", "bromfiets" -> "bromfiets",
    "ei" -> "eier", "kind" -> "kinder")
}
