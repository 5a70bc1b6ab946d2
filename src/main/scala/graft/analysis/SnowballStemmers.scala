package graft.analysis

import java.util.Locale

/** Snowball stemmers for the languages whose reference analyzers delegate to
  * org.tartarus generated code rather than a hand-written light stemmer:
  * Dutch (reference `nl/DutchAnalyzer.java:56` -> snowball `ext/DutchStemmer
  * .java`), Danish (`da/DanishAnalyzer.java` -> `ext/DanishStemmer.java`),
  * Romanian (`ro/RomanianAnalyzer.java` -> `ext/RomanianStemmer.java`) and
  * Turkish (`tr/TurkishAnalyzer.java` -> `ext/TurkishStemmer.java`).
  *
  * These are fresh Scala implementations of the published Snowball
  * algorithms (snowballstem.org); suffix tables and conditions follow the
  * published scripts, verified token-for-token against the reference's own
  * golden vocabularies (`analysis/snowball/TestSnowballVocabData.zip`,
  * 23k-96k word pairs per language) in SnowballStemSpec. Instead of a
  * cursor-machine runtime, each algorithm is direct string code: a suffix
  * either lies inside R1/R2 (index arithmetic) or it doesn't.
  */
object SnowballStemmers {

  /** Longest suffix of `w` drawn from `sufs` whose start index is >= `from`
    * (i.e. the suffix lies entirely within the region), or null. */
  private def longestIn(w: String, from: Int, sufs: Array[String]): String = {
    var best: String = null
    var i = 0
    while (i < sufs.length) {
      val s = sufs(i)
      if ((best == null || s.length > best.length) &&
          w.length - s.length >= from && w.endsWith(s)) best = s
      i += 1
    }
    best
  }

  /** Plain longest suffix match (no region constraint), or null. */
  private def longest(w: String, sufs: Array[String]): String =
    longestIn(w, 0, sufs)

  /** Standard Snowball R-region: index just past the first non-vowel that
    * follows a vowel, or length if none. */
  private def region(w: String, from: Int, isV: Char => Boolean): Int = {
    val n = w.length
    var i = from
    while (i < n && !isV(w(i))) i += 1
    while (i < n && isV(w(i))) i += 1
    if (i >= n) n else i + 1
  }

  // ------------------------------------------------------------------
  // Danish (reference ext/DanishStemmer.java; published danish.sbl)
  // ------------------------------------------------------------------

  private val daV = "aeiouyåæø".toSet
  private val daSEnding = "abcdfghjklmnoprtvyzå".toSet
  private val daMain = Array(
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
    "ere", "en", "heden", "eren", "er", "heder", "erer", "s", "heds", "es",
    "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
    "ers", "ets", "erets", "et", "eret")
  private val daOther = Array("ig", "lig", "elig", "els", "løst")
  private val daPairs = Array("gd", "dt", "gt", "kt")

  /** R1 with the Scandinavian "at least three letters before R1" rule
    * (hop 3 in the script); words shorter than 3 have an empty R1. */
  private def r1min3(w: String, isV: Char => Boolean): Int = {
    if (w.length < 3) return w.length
    val p = region(w, 0, isV)
    if (p >= w.length) w.length else math.max(p, 3)
  }

  private def daConsonantPair(w: String, p1: Int): String =
    if (longestIn(w, p1, daPairs) != null) w.substring(0, w.length - 1) else w

  /** Danish Snowball stemmer. Input is lowercased first (the reference
    * chain puts LowerCaseFilter before SnowballFilter). */
  def danish(word: String): String = {
    var w = word.toLowerCase(Locale.ROOT)
    val p1 = r1min3(w, daV)
    // main_suffix: longest R1 suffix; plain delete, or conditional "s"
    val m = longestIn(w, p1, daMain)
    if (m == "s") {
      if (w.length >= 2 && daSEnding(w(w.length - 2)))
        w = w.substring(0, w.length - 1)
    } else if (m != null) w = w.substring(0, w.length - m.length)
    // consonant_pair: gd/dt/gt/kt in R1 -> drop one letter
    w = daConsonantPair(w, p1)
    // other_suffix: igst loses st unconditionally, then R1 adjectives
    if (w.endsWith("igst")) w = w.substring(0, w.length - 2)
    val o = longestIn(w, p1, daOther)
    if (o == "løst") w = w.substring(0, w.length - 1)
    else if (o != null) {
      w = w.substring(0, w.length - o.length)
      w = daConsonantPair(w, p1)
    }
    // undouble: final double consonant with its last copy in R1
    if (w.length >= 2 && w.length - 1 >= p1 && !daV(w.last) &&
        w(w.length - 2) == w.last) w = w.substring(0, w.length - 1)
    w
  }

  // ------------------------------------------------------------------
  // Dutch (reference ext/DutchStemmer.java; published dutch.sbl)
  // ------------------------------------------------------------------

  private val nlV = "aeiouyè".toSet
  // step-4 last-char group: vowels plus the consonant-marked 'I'
  private val nlVI = nlV + 'I'
  private val nlVj = nlV + 'j'
  private val nlStep1 = Array("heden", "ene", "en", "se", "s")
  private val nlStep3b = Array("end", "ing", "ig", "lijk", "baar", "bar")

  private def nlUndouble(w: String): String =
    if (w.endsWith("dd") || w.endsWith("kk") || w.endsWith("tt"))
      w.substring(0, w.length - 1)
    else w

  /** en/ene ending: suffix in R1, preceded by a non-vowel that is not part
    * of a final "gem"; delete + undouble. Returns w unchanged if blocked. */
  private def nlEnEnding(w: String, p1: Int, suf: String): String = {
    val at = w.length - suf.length
    if (at < p1 || at == 0 || nlV(w(at - 1))) return w
    if (at >= 3 && w.substring(at - 3, at) == "gem") return w
    nlUndouble(w.substring(0, at))
  }

  /** Dutch Snowball stemmer (lowercases first). */
  def dutch(word: String): String = {
    var w = word.toLowerCase(Locale.ROOT)
    // prelude: fold umlauts/acutes, then consonant-mark y and i
    w = w.map {
      case 'á' | 'ä' => 'a'
      case 'é' | 'ë' => 'e'
      case 'í' | 'ï' => 'i'
      case 'ó' | 'ö' => 'o'
      case 'ú' | 'ü' => 'u'
      case c                   => c
    }
    val sb = new java.lang.StringBuilder(w)
    if (sb.length > 0 && sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 0
    while (i < sb.length - 1) {
      if (nlV(sb.charAt(i))) {
        val c = sb.charAt(i + 1)
        if (c == 'i' && i + 2 < sb.length && nlV(sb.charAt(i + 2)))
          sb.setCharAt(i + 1, 'I')
        else if (c == 'y') sb.setCharAt(i + 1, 'Y')
      }
      i += 1
    }
    w = sb.toString
    val p1raw = region(w, 0, nlV)
    // R1 starts no earlier than position 3 (dutch.sbl: try(p1 < 3 -> p1 = 3))
    val r1 = if (p1raw >= w.length) w.length else math.max(p1raw, 3)
    val r2 = math.min(region(w, p1raw, nlV), w.length)

    var eFound = false
    // step 1
    longestIn(w, 0, nlStep1) match {
      case "heden" =>
        if (w.length - 5 >= r1) w = w.substring(0, w.length - 5) + "heid"
      case "ene" => w = nlEnEnding(w, r1, "ene")
      case "en"  => w = nlEnEnding(w, r1, "en")
      case s @ ("se" | "s") =>
        val at = w.length - s.length
        if (at >= r1 && at > 0 && !nlVj(w(at - 1))) w = w.substring(0, at)
      case _ =>
    }
    // step 2: e-ending
    if (w.endsWith("e") && w.length - 1 >= r1 && w.length >= 2 &&
        !nlV(w(w.length - 2))) {
      w = nlUndouble(w.substring(0, w.length - 1))
      eFound = true
    }
    // step 3a: heid
    if (w.endsWith("heid") && w.length - 4 >= r2 &&
        (w.length == 4 || w(w.length - 5) != 'c')) {
      w = w.substring(0, w.length - 4)
      if (w.endsWith("en")) w = nlEnEnding(w, r1, "en")
    }
    // step 3b: d/k suffixes (R2)
    longestIn(w, 0, nlStep3b) match {
      case s @ ("end" | "ing") if w.length - s.length >= r2 =>
        w = w.substring(0, w.length - s.length)
        if (w.endsWith("ig") && w.length - 2 >= r2 &&
            (w.length < 3 || w(w.length - 3) != 'e'))
          w = w.substring(0, w.length - 2)
        else w = nlUndouble(w)
      case "ig" if w.length - 2 >= r2 &&
          (w.length < 3 || w(w.length - 3) != 'e') =>
        w = w.substring(0, w.length - 2)
      case "lijk" if w.length - 4 >= r2 =>
        w = w.substring(0, w.length - 4)
        if (w.endsWith("e") && w.length - 1 >= r1 && w.length >= 2 &&
            !nlV(w(w.length - 2)))
          w = nlUndouble(w.substring(0, w.length - 1))
      case "baar" if w.length - 4 >= r2 =>
        w = w.substring(0, w.length - 4)
      case "bar" if w.length - 3 >= r2 && eFound =>
        w = w.substring(0, w.length - 3)
      case _ =>
    }
    // step 4: undouble vowel (CVVd -> CVd, VV in {aa,ee,oo,uu})
    val n = w.length
    if (n >= 4 && !nlVI(w(n - 1)) && !nlV(w(n - 4)) &&
        w(n - 2) == w(n - 3) && "aeou".indexOf(w(n - 2)) >= 0)
      w = w.substring(0, n - 2) + w(n - 1)
    // postlude: unmark
    w.map { case 'I' => 'i'; case 'Y' => 'y'; case c => c }
  }

  // ------------------------------------------------------------------
  // Romanian (reference ext/RomanianStemmer.java; published romanian.sbl)
  // ------------------------------------------------------------------

  private val roV = "aeiouâîă".toSet

  /** Longest suffix of `w` among the table keys whose start is >= `from`;
    * returns the (suffix, replacement) pair or null. */
  private def longestPair(w: String, from: Int,
                          table: Array[(String, String)]): (String, String) = {
    var best: (String, String) = null
    var i = 0
    while (i < table.length) {
      val s = table(i)._1
      if ((best == null || s.length > best._1.length) &&
          w.length - s.length >= from && w.endsWith(s)) best = table(i)
      i += 1
    }
    best
  }

  private val roStep0: Array[(String, String)] = Array(
    "ul" -> "", "ului" -> "", "aua" -> "a", "ea" -> "e", "ele" -> "e",
    "elor" -> "e", "ii" -> "i", "iua" -> "i", "iei" -> "i", "iile" -> "i",
    "ilor" -> "i", "iilor" -> "i", "ile" -> "i", "atei" -> "at",
    "aţia" -> "aţi", "aţie" -> "aţi")

  private val roCombo: Array[(String, String)] = Array(
    "abilitate" -> "abil", "abilitati" -> "abil", "abilităi" -> "abil",
    "abilităţi" -> "abil", "ibilitate" -> "ibil",
    "ivitate" -> "iv", "ivitati" -> "iv", "ivităi" -> "iv", "ivităţi" -> "iv",
    "icala" -> "ic", "iciva" -> "ic", "icale" -> "ic", "icali" -> "ic",
    "icitate" -> "ic", "icitati" -> "ic", "icive" -> "ic", "icivi" -> "ic",
    "icităi" -> "ic", "icităţi" -> "ic", "ical" -> "ic", "icator" -> "ic",
    "icatori" -> "ic", "iciv" -> "ic", "icală" -> "ic", "icivă" -> "ic",
    "ativa" -> "at", "ative" -> "at", "ativi" -> "at", "ativă" -> "at",
    "ativ" -> "at", "aţiune" -> "at", "atoare" -> "at", "ator" -> "at",
    "atori" -> "at", "ătoare" -> "at", "ător" -> "at", "ători" -> "at",
    "itiva" -> "it", "itive" -> "it", "itivi" -> "it", "itivă" -> "it",
    "itiv" -> "it", "iţiune" -> "it", "itoare" -> "it", "itor" -> "it",
    "itori" -> "it")

  private val roStdDelete = Array(
    "ica", "abila", "ibila", "oasa", "ata", "ita", "anta", "uta", "iva",
    "ic", "ice", "abile", "ibile", "oase", "ate", "itate", "ite", "ante",
    "ute", "ive", "ici", "abili", "ibili", "atori", "osi", "ati", "itati",
    "iti", "anti", "uti", "ivi", "ităi", "oşi", "ităţi", "abil", "ibil",
    "ator", "os", "at", "it", "ant", "ut", "iv", "ică", "abilă", "ibilă",
    "oasă", "ată", "ită", "antă", "ută", "ivă")
  private val roStdIst = Array(
    "ista", "isme", "iste", "isti", "işti", "ism", "ist", "istă")
  private val roStdAll: Array[(String, String)] =
    roStdDelete.map(_ -> "") ++ roStdIst.map(_ -> "ist") ++
      Array("iune" -> " ", "iuni" -> " ")

  // verb suffixes: value 1 = delete when preceded (inside RV) by a
  // consonant or 'u'; value 2 = delete unconditionally
  private val roVerb1 = Array(
    "ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire", "âre",
    "ase", "ise", "use", "âse", "eşte", "ăşte", "eze", "ai", "eai", "iai",
    "eşti", "ăşti", "ui", "ezi", "âi", "aşi", "aseşi", "iseşi", "useşi",
    "âseşi", "işi", "uşi", "âşi", "eaţi", "iaţi", "arăţi", "aserăţi",
    "iserăţi", "userăţi", "âserăţi", "irăţi", "urăţi", "ârăţi", "am", "eam",
    "iam", "asem", "isem", "usem", "âsem", "arăm", "aserăm", "iserăm",
    "userăm", "âserăm", "irăm", "urăm", "ârăm", "au", "eau", "iau", "indu",
    "ându", "ez", "ească", "ară", "aseră", "iseră", "useră", "âseră",
    "iră", "ură", "âră", "ează")
  private val roVerb2 = Array(
    "se", "sese", "sei", "seşi", "seseşi", "aţi", "eţi", "iţi", "âţi",
    "serăţi", "seserăţi", "em", "sesem", "im", "âm", "ăm", "serăm",
    "seserăm", "seră", "seseră")
  private val roVerbAll: Array[(String, String)] =
    roVerb1.map(_ -> "1") ++ roVerb2.map(_ -> "2")

  private val roFinalVowel = Array("a", "e", "ie", "i", "ă")

  /** RV for Romance-language Snowball stemmers: after the first
    * vowel-consonant transition depending on the word's first two letters. */
  private def romanceRV(w: String, isV: Char => Boolean): Int = {
    val n = w.length
    if (n < 3) return n
    if (isV(w(0))) {
      if (!isV(w(1))) { // V C ... : after the next vowel
        var i = 2; while (i < n && !isV(w(i))) i += 1
        if (i < n) i + 1 else n
      } else {          // V V ... : after the next consonant
        var i = 2; while (i < n && isV(w(i))) i += 1
        if (i < n) i + 1 else n
      }
    } else {
      if (!isV(w(1))) { // C C ... : after the next vowel
        var i = 2; while (i < n && !isV(w(i))) i += 1
        if (i < n) i + 1 else n
      } else 3          // C V ... : after the third letter
    }
  }

  /** Romanian Snowball stemmer (lowercases first). */
  def romanian(word: String): String = {
    var w = word.toLowerCase(Locale.ROOT)
    // prelude: consonant-mark u/i between vowels
    val sb = new java.lang.StringBuilder(w)
    var i = 0
    while (i < sb.length - 1) {
      if (roV(sb.charAt(i)) && i + 2 < sb.length && roV(sb.charAt(i + 2))) {
        val c = sb.charAt(i + 1)
        if (c == 'u') sb.setCharAt(i + 1, 'U')
        else if (c == 'i') sb.setCharAt(i + 1, 'I')
      }
      i += 1
    }
    w = sb.toString
    val rv = romanceRV(w, roV)
    val r1 = region(w, 0, roV)
    val r2 = region(w, r1, roV)

    // Snowball among semantics: the LONGEST matching suffix is chosen with
    // an unbounded backward scan, and only then is its region condition
    // tested — a long match that fails R1/R2 does NOT fall back to a
    // shorter one. (verb_suffix is the exception: its scan runs inside
    // `setlimit tomark pV`, so there the region bounds the match itself.)

    // step 0: articles/plurals (condition R1)
    longestPair(w, 0, roStep0) match {
      case null =>
      case (s, _) if w.length - s.length < r1 =>
      case ("ile", _) =>
        val at = w.length - 3
        if (at < 2 || w.substring(at - 2, at) != "ab")
          w = w.substring(0, at) + "i"
      case (s, r) => w = w.substring(0, w.length - s.length) + r
    }
    // standard suffixes: repeat combo (R1), then the R2 table
    var removed = false
    var changed = true
    while (changed) {
      changed = false
      longestPair(w, 0, roCombo) match {
        case (s, r) if w.length - s.length >= r1 =>
          w = w.substring(0, w.length - s.length) + r
          removed = true; changed = true
        case _ =>
      }
    }
    longestPair(w, 0, roStdAll) match {
      case null =>
      case (s, _) if w.length - s.length < r2 =>
      case (s, " ") => // iune/iuni: only as ţiune/ţiuni -> t
        val at = w.length - s.length
        if (at > 0 && w(at - 1) == 'ţ') {
          w = w.substring(0, at - 1) + "t"
          removed = true
        }
      case (s, r) =>
        w = w.substring(0, w.length - s.length) + r
        removed = true
    }
    // verb suffixes (RV-bounded scan) only when no standard suffix removed
    if (!removed) longestPair(w, rv, roVerbAll) match {
      case null =>
      case (s, "1") =>
        val at = w.length - s.length
        if (at > rv && !"aeioâîă".contains(w(at - 1)))
          w = w.substring(0, at)
      case (s, _) => w = w.substring(0, w.length - s.length)
    }
    // final vowel (unbounded scan, RV condition)
    val fv = longest(w, roFinalVowel)
    if (fv != null && w.length - fv.length >= rv)
      w = w.substring(0, w.length - fv.length)
    // postlude: unmark
    w.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
  }

  // ------------------------------------------------------------------
  // German + German2 (reference ext/GermanStemmer.java and
  // ext/German2Stemmer.java; published german.sbl / german2.sbl — the
  // variants differ only in the prelude: german2 additionally folds
  // ae/oe/ue to umlauts, protecting 'qu')
  // ------------------------------------------------------------------

  private val deV = "aeiouyäöü".toSet
  private val deSEnd = "bdfghklmnrt".toSet
  private val deStEnd = "bdfghklmnt".toSet
  private val deStep1 = Array("e", "em", "en", "ern", "er", "s", "es")
  private val deStep2 = Array("en", "er", "st", "est")
  private val deStep3 = Array("end", "ig", "ung", "lich", "isch", "ik",
    "heit", "keit")

  /** Consonant-mark u and y between vowels (shared prelude step). */
  private def germanMark(w0: String): String = {
    val sb = new java.lang.StringBuilder(w0)
    var i = 0
    while (i < sb.length - 1) {
      if (deV(sb.charAt(i))) {
        val c = sb.charAt(i + 1)
        if ((c == 'u' || c == 'y') && i + 2 < sb.length &&
            deV(sb.charAt(i + 2)))
          sb.setCharAt(i + 1, if (c == 'u') 'U' else 'Y')
      }
      i += 1
    }
    sb.toString
  }

  private def germanSteps(w0: String): String = {
    var w = w0
    val p1raw = region(w, 0, deV)
    val short = w.length < 3
    val r1 = if (short || p1raw >= w.length) w.length else math.max(p1raw, 3)
    val r2 = if (short) w.length else math.min(region(w, p1raw, deV), w.length)
    // step 1: noun endings (R1 condition on the longest match, no fallback)
    longest(w, deStep1) match {
      case null =>
      case s if w.length - s.length < r1 =>
      case "s" =>
        if (w.length >= 2 && deSEnd(w(w.length - 2)))
          w = w.substring(0, w.length - 1)
      case s => w = w.substring(0, w.length - s.length)
    }
    // step 2: verb endings; "st" needs an st-ending letter with >= 3
    // letters before it
    longest(w, deStep2) match {
      case null =>
      case s if w.length - s.length < r1 =>
      case "st" =>
        val at = w.length - 2
        if (at >= 1 && deStEnd(w(at - 1)) && at >= 4)
          w = w.substring(0, at)
      case s => w = w.substring(0, w.length - s.length)
    }
    // step 3: derivational suffixes (R2)
    longest(w, deStep3) match {
      case null =>
      case s if w.length - s.length < r2 =>
      case s @ ("end" | "ung") =>
        w = w.substring(0, w.length - s.length)
        if (w.endsWith("ig") && w.length - 2 >= r2 &&
            (w.length < 3 || w(w.length - 3) != 'e'))
          w = w.substring(0, w.length - 2)
      case s @ ("ig" | "ik" | "isch") =>
        val at = w.length - s.length
        if (at == 0 || w(at - 1) != 'e') w = w.substring(0, at)
      case s @ ("lich" | "heit") =>
        w = w.substring(0, w.length - s.length)
        val t = longest(w, Array("er", "en"))
        if (t != null && w.length - 2 >= r1)
          w = w.substring(0, w.length - 2)
      case "keit" =>
        w = w.substring(0, w.length - 4)
        val t = longest(w, Array("ig", "lich"))
        if (t != null && w.length - t.length >= r2)
          w = w.substring(0, w.length - t.length)
      case _ =>
    }
    // postlude: unmark and fold umlauts
    w.map {
      case 'U' => 'u'; case 'Y' => 'y'
      case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'
      case c => c
    }
  }

  /** German Snowball stemmer (lowercases first). */
  def german(word: String): String = {
    val w = word.toLowerCase(Locale.ROOT).replace("ß", "ss")
    germanSteps(germanMark(w))
  }

  /** German2 Snowball variant: marks u/y first, then folds ae/oe/ue to
    * umlauts (skipping after 'q') and ß to ss. */
  def german2(word: String): String = {
    val w = germanMark(word.toLowerCase(Locale.ROOT))
    val sb = new java.lang.StringBuilder(w.length)
    var i = 0
    while (i < w.length) {
      if (w.startsWith("qu", i)) {
        // 'qu' hops the following TWO chars untouched (german2.sbl
        // protects 'que'/'qua' sequences from the ue/ae folds)
        val end = math.min(w.length, i + 4)
        sb.append(w, i, end); i = end
      }
      else if (w.startsWith("ae", i)) { sb.append('ä'); i += 2 }
      else if (w.startsWith("oe", i)) { sb.append('ö'); i += 2 }
      else if (w.startsWith("ue", i)) { sb.append('ü'); i += 2 }
      else if (w.charAt(i) == 'ß') { sb.append("ss"); i += 1 }
      else { sb.append(w.charAt(i)); i += 1 }
    }
    germanSteps(sb.toString)
  }

  // ------------------------------------------------------------------
  // Turkish (reference ext/TurkishStemmer.java; published turkish.sbl,
  // algorithm by Evren (Kapusuz) Cilden)
  // ------------------------------------------------------------------

  private val trVowel = "aeıioöuü".toSet
  private val trU = "ıiuü".toSet
  // harmony classes: the vowel of a suffix must be preceded (anywhere
  // further left) by a vowel of its own front/back + rounded class
  private val trHarmony: Map[Char, Set[Char]] = Map(
    'a' -> "aıou".toSet, 'e' -> "eiöü".toSet, 'ı' -> "aı".toSet,
    'i' -> "ei".toSet, 'o' -> "ou".toSet, 'ö' -> "öü".toSet,
    'u' -> "ou".toSet, 'ü' -> "öü".toSet)

  /** Minimal backward cursor machine for the Turkish algorithm, mirroring
    * the Snowball string-command semantics the published script relies on:
    * marks move the cursor without editing; slices edit [bra, ket);
    * positions are saved as distances from the right end so they survive
    * suffix deletions; a failed alternative restores the cursor but never
    * undoes a slice. */
  private final class TrBuf(var w: String) {
    var c: Int = w.length
    var bra: Int = 0
    var ket: Int = 0
    def save: Int = w.length - c
    def restore(v: Int): Unit = c = w.length - v
    def eqSB(s: String): Boolean =
      if (c >= s.length && w.startsWith(s, c - s.length)) { c -= s.length; true }
      else false
    /** Longest suffix from `sufs` ending at the cursor; consumes it. */
    def among(sufs: Array[String]): Boolean = {
      var best: String = null
      var i = 0
      while (i < sufs.length) {
        val s = sufs(i)
        if ((best == null || s.length > best.length) &&
            c >= s.length && w.startsWith(s, c - s.length)) best = s
        i += 1
      }
      if (best == null) false else { c -= best.length; true }
    }
    def sliceDel(): Unit = {
      if (bra < ket) { w = w.substring(0, bra) + w.substring(ket); c = bra }
    }
    /** check_vowel_harmony: last vowel left of the cursor must have a
      * harmonizing vowel somewhere further left. Cursor is untouched. */
    def harmony(): Boolean = {
      var j = c - 1
      while (j >= 0 && !trVowel(w(j))) j -= 1
      if (j < 0) return false
      val cls = trHarmony(w(j))
      var k = j - 1
      while (k >= 0 && !cls(w(k))) k -= 1
      k >= 0
    }
    /** mark_suffix_with_optional_X_consonant: if the char before the cursor
      * is `x` and a vowel precedes it, consume the x; otherwise require a
      * non-x char before the cursor with a vowel before that. */
    def optionalConsonant(x: Char): Boolean = {
      if (c > 0 && w(c - 1) == x) {
        if (c - 1 > 0 && trVowel(w(c - 2))) { c -= 1; true } else false
      } else c > 0 && c - 1 > 0 && trVowel(w(c - 2))
    }
    /** mark_suffix_with_optional_U_vowel: mirror image for the buffer
      * vowel — consume a U preceded by a consonant, or require a
      * non-U char preceded by a consonant. */
    def optionalU(): Boolean = {
      if (c > 0 && trU(w(c - 1))) {
        if (c - 1 > 0 && !trVowel(w(c - 2))) { c -= 1; true } else false
      } else c > 0 && c - 1 > 0 && !trVowel(w(c - 2))
    }
  }

  private val trPoss = Array("m", "n", "miz", "niz", "muz", "nuz",
    "müz", "nüz", "mız", "nız")
  private val trLArI = Array("leri", "ları")
  private val trNU = Array("ni", "nu", "nü", "nı")
  private val trNUn = Array("in", "un", "ün", "ın")
  private val trYA = Array("a", "e")
  private val trNA = Array("na", "ne")
  private val trDA = Array("da", "ta", "de", "te")
  private val trNdA = Array("nda", "nde")
  private val trDAn = Array("dan", "tan", "den", "ten")
  private val trNdAn = Array("ndan", "nden")
  private val trYlA = Array("la", "le")
  private val trNcA = Array("ca", "ce")
  private val trYUm = Array("im", "um", "üm", "ım")
  private val trSUn = Array("sin", "sun", "sün", "sın")
  private val trYUz = Array("iz", "uz", "üz", "ız")
  private val trSUnUz = Array("siniz", "sunuz", "sünüz", "sınız")
  private val trLAr = Array("lar", "ler")
  private val trNUz = Array("niz", "nuz", "nüz", "nız")
  private val trDUr = Array("dir", "tir", "dur", "tur", "dür", "tür",
    "dır", "tır")
  private val trCAsInA = Array("casına", "cesine")
  private val trYDU = Array(
    "di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
    "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım", "din", "tin",
    "dun", "tun", "dün", "tün", "dın", "tın", "du", "tu", "dü", "tü",
    "dı", "tı")
  private val trYsA = Array("sa", "se", "sak", "sek", "sam", "sem",
    "san", "sen")
  private val trYmUs = Array("miş", "muş", "müş", "mış")

  private def mPossessives(b: TrBuf) = b.among(trPoss) && b.optionalU()
  private def mSU(b: TrBuf) =
    b.harmony() && { if (b.c > 0 && trU(b.w(b.c - 1))) { b.c -= 1; true }
                     else false } && b.optionalConsonant('s')
  private def mLArI(b: TrBuf) = b.among(trLArI)
  private def mYU(b: TrBuf) =
    b.harmony() && { if (b.c > 0 && trU(b.w(b.c - 1))) { b.c -= 1; true }
                     else false } && b.optionalConsonant('y')
  private def mNU(b: TrBuf) = b.harmony() && b.among(trNU)
  private def mNUn(b: TrBuf) =
    b.harmony() && b.among(trNUn) && b.optionalConsonant('n')
  private def mYA(b: TrBuf) =
    b.harmony() && b.among(trYA) && b.optionalConsonant('y')
  private def mNA(b: TrBuf) = b.harmony() && b.among(trNA)
  private def mDA(b: TrBuf) = b.harmony() && b.among(trDA)
  private def mNdA(b: TrBuf) = b.harmony() && b.among(trNdA)
  private def mDAn(b: TrBuf) = b.harmony() && b.among(trDAn)
  private def mNdAn(b: TrBuf) = b.harmony() && b.among(trNdAn)
  private def mYlA(b: TrBuf) =
    b.harmony() && b.among(trYlA) && b.optionalConsonant('y')
  private def mKi(b: TrBuf) = b.eqSB("ki")
  private def mNcA(b: TrBuf) =
    b.harmony() && b.among(trNcA) && b.optionalConsonant('n')
  private def mYUm(b: TrBuf) =
    b.harmony() && b.among(trYUm) && b.optionalConsonant('y')
  private def mSUn(b: TrBuf) = b.harmony() && b.among(trSUn)
  private def mYUz(b: TrBuf) =
    b.harmony() && b.among(trYUz) && b.optionalConsonant('y')
  private def mSUnUz(b: TrBuf) = b.among(trSUnUz)
  private def mLAr(b: TrBuf) = b.harmony() && b.among(trLAr)
  private def mNUz(b: TrBuf) = b.harmony() && b.among(trNUz)
  private def mDUr(b: TrBuf) = b.harmony() && b.among(trDUr)
  private def mCAsInA(b: TrBuf) = b.among(trCAsInA)
  private def mYDU(b: TrBuf) =
    b.harmony() && b.among(trYDU) && b.optionalConsonant('y')
  private def mYsA(b: TrBuf) = b.among(trYsA) && b.optionalConsonant('y')
  private def mYmUs(b: TrBuf) =
    b.harmony() && b.among(trYmUs) && b.optionalConsonant('y')
  private def mYken(b: TrBuf) = b.eqSB("ken") && b.optionalConsonant('y')

  /** Try `f`; on failure restore the cursor (Snowball `or` alternative —
    * slices, if any happened, are NOT undone). */
  private def alt(b: TrBuf)(f: => Boolean): Boolean = {
    val v = b.save
    if (f) true else { b.restore(v); false }
  }

  /** stem_nominal_verb_suffixes: strips chained verb endings; clears the
    * continue flag when a bare -lAr (plural verb) was found. Returns the
    * continue_stemming_noun_suffixes flag. */
  private def trNominalVerb(b: TrBuf): Boolean = {
    b.ket = b.c
    var cont = true
    val done =
      alt(b) { alt(b)(mYmUs(b)) || alt(b)(mYDU(b)) || alt(b)(mYsA(b)) ||
        mYken(b) } ||
      alt(b) {
        mCAsInA(b) && {
          val _ = alt(b)(mSUnUz(b)) || alt(b)(mLAr(b)) || alt(b)(mYUm(b)) ||
            alt(b)(mSUn(b)) || alt(b)(mYUz(b))
          mYmUs(b)
        }
      } ||
      alt(b) {
        mLAr(b) && {
          b.bra = b.c; b.sliceDel()
          val v = b.save
          b.ket = b.c
          if (!(alt(b)(mDUr(b)) || alt(b)(mYDU(b)) || alt(b)(mYsA(b)) ||
                mYmUs(b))) b.restore(v)
          cont = false
          true
        }
      } ||
      alt(b) { mNUz(b) && (alt(b)(mYDU(b)) || mYsA(b)) } ||
      alt(b) {
        (alt(b)(mSUnUz(b)) || alt(b)(mYUz(b)) || alt(b)(mSUn(b)) ||
          mYUm(b)) && {
          b.bra = b.c; b.sliceDel()
          val v = b.save
          b.ket = b.c
          if (!mYmUs(b)) b.restore(v)
          true
        }
      } ||
      alt(b) {
        mDUr(b) && {
          b.bra = b.c; b.sliceDel()
          val v = b.save
          b.ket = b.c
          val _ = alt(b)(mSUnUz(b)) || alt(b)(mLAr(b)) || alt(b)(mYUm(b)) ||
            alt(b)(mSUn(b)) || alt(b)(mYUz(b))
          if (!mYmUs(b)) b.restore(v)
          true
        }
      }
    if (done) { b.bra = b.c; b.sliceDel() }
    cont
  }

  /** stem_suffix_chain_before_ki: recursive -ki chain
    * (evdekiler -> ev ...). */
  private def trChainKi(b: TrBuf): Boolean = {
    b.ket = b.c
    if (!mKi(b)) return false
    alt(b) {
      mDA(b) && {
        b.bra = b.c; b.sliceDel()
        val v2 = b.save
        b.ket = b.c
        val ok =
          alt(b) {
            mLAr(b) && {
              b.bra = b.c; b.sliceDel()
              val v4 = b.save
              if (!trChainKi(b)) b.restore(v4)
              true
            }
          } || {
            if (mPossessives(b)) {
              b.bra = b.c; b.sliceDel()
              val v5 = b.save
              b.ket = b.c
              if (!(mLAr(b) && { b.bra = b.c; b.sliceDel(); trChainKi(b) }))
                b.restore(v5)
              true
            } else false
          }
        if (!ok) b.restore(v2)
        true
      }
    } ||
    alt(b) {
      mNUn(b) && {
        b.bra = b.c; b.sliceDel()
        val v6 = b.save
        b.ket = b.c
        val ok =
          alt(b) { mLArI(b) && { b.bra = b.c; b.sliceDel(); true } } ||
          alt(b) {
            b.ket = b.c
            (alt(b)(mPossessives(b)) || mSU(b)) && {
              b.bra = b.c; b.sliceDel()
              val v9 = b.save
              b.ket = b.c
              if (!(mLAr(b) && { b.bra = b.c; b.sliceDel(); trChainKi(b) }))
                b.restore(v9)
              true
            }
          } ||
          trChainKi(b)
        if (!ok) b.restore(v6)
        true
      }
    } || {
      mNdA(b) && {
        alt(b) { mLArI(b) && { b.bra = b.c; b.sliceDel(); true } } ||
        alt(b) {
          mSU(b) && {
            b.bra = b.c; b.sliceDel()
            val v11 = b.save
            b.ket = b.c
            if (!(mLAr(b) && { b.bra = b.c; b.sliceDel(); trChainKi(b) }))
              b.restore(v11)
            true
          }
        } ||
        trChainKi(b)
      }
    }
  }

  /** stem_noun_suffixes: case/possessive/plural chains. */
  private def trNounSuffixes(b: TrBuf): Boolean = {
    alt(b) {
      b.ket = b.c
      mLAr(b) && {
        b.bra = b.c; b.sliceDel()
        val v = b.save
        if (!trChainKi(b)) b.restore(v)
        true
      }
    } ||
    alt(b) {
      b.ket = b.c
      mNcA(b) && {
        b.bra = b.c; b.sliceDel()
        val v3 = b.save
        val ok =
          alt(b) { b.ket = b.c; mLArI(b) && { b.bra = b.c; b.sliceDel(); true } } ||
          alt(b) {
            b.ket = b.c
            (alt(b)(mPossessives(b)) || mSU(b)) && {
              b.bra = b.c; b.sliceDel()
              val v6 = b.save
              b.ket = b.c
              if (!(mLAr(b) && { b.bra = b.c; b.sliceDel(); trChainKi(b) }))
                b.restore(v6)
              true
            }
          } ||
          { b.ket = b.c
            mLAr(b) && { b.bra = b.c; b.sliceDel(); trChainKi(b) } }
        if (!ok) b.restore(v3)
        true
      }
    } ||
    alt(b) {
      b.ket = b.c
      (alt(b)(mNdA(b)) || mNA(b)) && {
        alt(b) { mLArI(b) && { b.bra = b.c; b.sliceDel(); true } } ||
        alt(b) {
          mSU(b) && {
            b.bra = b.c; b.sliceDel()
            val v9 = b.save
            b.ket = b.c
            if (!(mLAr(b) && { b.bra = b.c; b.sliceDel(); trChainKi(b) }))
              b.restore(v9)
            true
          }
        } ||
        trChainKi(b)
      }
    } ||
    alt(b) {
      b.ket = b.c
      (alt(b)(mNdAn(b)) || mNU(b)) && {
        alt(b) {
          mSU(b) && {
            b.bra = b.c; b.sliceDel()
            val v12 = b.save
            b.ket = b.c
            if (!(mLAr(b) && { b.bra = b.c; b.sliceDel(); trChainKi(b) }))
              b.restore(v12)
            true
          }
        } ||
        mLArI(b) // published quirk: this path marks but never deletes
      }
    } ||
    alt(b) {
      b.ket = b.c
      mDAn(b) && {
        b.bra = b.c; b.sliceDel()
        val v13 = b.save
        b.ket = b.c
        val ok =
          alt(b) {
            mPossessives(b) && {
              b.bra = b.c; b.sliceDel()
              val v15 = b.save
              b.ket = b.c
              if (!(mLAr(b) && { b.bra = b.c; b.sliceDel(); trChainKi(b) }))
                b.restore(v15)
              true
            }
          } ||
          alt(b) {
            mLAr(b) && {
              b.bra = b.c; b.sliceDel()
              val v16 = b.save
              if (!trChainKi(b)) b.restore(v16)
              true
            }
          } ||
          trChainKi(b)
        if (!ok) b.restore(v13)
        true
      }
    } ||
    alt(b) {
      b.ket = b.c
      (alt(b)(mNUn(b)) || mYlA(b)) && {
        b.bra = b.c; b.sliceDel()
        val v18 = b.save
        val ok =
          alt(b) {
            b.ket = b.c
            mLAr(b) && { b.bra = b.c; b.sliceDel(); trChainKi(b) }
          } ||
          alt(b) {
            b.ket = b.c
            (alt(b)(mPossessives(b)) || mSU(b)) && {
              b.bra = b.c; b.sliceDel()
              val v21 = b.save
              b.ket = b.c
              if (!(mLAr(b) && { b.bra = b.c; b.sliceDel(); trChainKi(b) }))
                b.restore(v21)
              true
            }
          } ||
          trChainKi(b)
        if (!ok) b.restore(v18)
        true
      }
    } ||
    alt(b) { b.ket = b.c; mLArI(b) && { b.bra = b.c; b.sliceDel(); true } } ||
    alt(b) { trChainKi(b) } ||
    alt(b) {
      b.ket = b.c
      (alt(b)(mDA(b)) || alt(b)(mYU(b)) || mYA(b)) && {
        b.bra = b.c; b.sliceDel()
        val v23 = b.save
        b.ket = b.c
        val got =
          alt(b) {
            mPossessives(b) && {
              b.bra = b.c; b.sliceDel()
              val v25 = b.save
              b.ket = b.c
              if (!mLAr(b)) b.restore(v25)
              true
            }
          } || mLAr(b)
        if (got) {
          b.bra = b.c; b.sliceDel()
          b.ket = b.c
          if (!trChainKi(b)) b.restore(v23)
        } else b.restore(v23)
        true
      }
    } || {
      b.ket = b.c
      (alt(b)(mPossessives(b)) || mSU(b)) && {
        b.bra = b.c; b.sliceDel()
        val v27 = b.save
        b.ket = b.c
        if (!(mLAr(b) && { b.bra = b.c; b.sliceDel(); trChainKi(b) }))
          b.restore(v27)
        true
      }
    }
  }

  /** Turkish Snowball stemmer. Words with fewer than two vowels are
    * returned untouched (more_than_one_syllable_word); the reserved words
    * ad/soyad skip the postlude. Lowercases with the Turkish dotted/dotless
    * i rule first (the reference chain runs TurkishLowerCaseFilter). */
  def turkish(word: String): String = {
    val w = MiscFilters.turkishLowerCase(word)
    if (w.count(trVowel) < 2) return w
    val b = new TrBuf(w)
    val v1 = b.save
    val cont = trNominalVerb(b)
    b.restore(v1)
    if (!cont) return b.w
    val v2 = b.save
    trNounSuffixes(b)
    b.restore(v2)
    // postlude
    if (b.w == "ad" || b.w == "soyad") return b.w
    // append_U_to_stems_ending_with_d_or_g: harmony vowel after final d/g
    if (b.w.nonEmpty && (b.w.last == 'd' || b.w.last == 'g')) {
      var j = b.w.length - 1
      while (j >= 0 && !trVowel(b.w(j))) j -= 1
      if (j >= 0) b.w(j) match {
        case 'a' | 'ı' => b.w += "ı"
        case 'e' | 'i' => b.w += "i"
        case 'o' | 'u' => b.w += "u"
        case 'ö' | 'ü' => b.w += "ü"
        case _ =>
      }
    }
    // post_process_last_consonants: devoice/restore the final consonant
    if (b.w.nonEmpty) b.w.last match {
      case 'b' => b.w = b.w.dropRight(1) + "p"
      case 'c' => b.w = b.w.dropRight(1) + "ç"
      case 'd' => b.w = b.w.dropRight(1) + "t"
      case 'ğ' => b.w = b.w.dropRight(1) + "k"
      case _ =>
    }
    b.w
  }

  // ------------------------------------------------------------------
  // Scandinavian pair: Swedish + Norwegian (reference
  // ext/SwedishStemmer.java, ext/NorwegianStemmer.java — the
  // SnowballPorterFilterFactory alternates to the analyzers' default
  // light stemmers). Shared shape: R1 = after the first non-vowel
  // following a vowel, floored at 3 (hop-3 setmark x); every suffix
  // match must lie entirely within R1 (find_among_b under
  // setlimit tomark p1); p1 = limit when the marks can't be placed.
  // ------------------------------------------------------------------

  /** Longest table suffix of `s` whose match starts at or after `p1`;
    * returns its code or -1. Tables list (suffix, code). */
  private def longestR1(s: String, p1: Int,
                        tbl: Array[(String, Int)]): (String, Int) = {
    var best: (String, Int) = null
    var i = 0
    while (i < tbl.length) {
      val suf = tbl(i)._1
      if ((best == null || suf.length > best._1.length) &&
        s.length - suf.length >= p1 && s.endsWith(suf))
        best = tbl(i)
      i += 1
    }
    best
  }

  /** R1 start: after the first non-vowel that follows a vowel, floored
    * at minPrefix; = length when unmarkable (no stemming). */
  private def scandinavianP1(w: String, isV: Char => Boolean,
                             minPrefix: Int = 3): Int = {
    val n = w.length
    if (n < minPrefix) return n
    var i = 0
    while (i < n && !isV(w.charAt(i))) i += 1
    if (i >= n) return n
    while (i < n && isV(w.charAt(i))) i += 1
    if (i >= n) return n
    math.max(i + 1, minPrefix)
  }

  private val svMain: Array[(String, Int)] = Array(
    "a" -> 1, "arna" -> 1, "erna" -> 1, "heterna" -> 1, "orna" -> 1,
    "ad" -> 1, "e" -> 1, "ade" -> 1, "ande" -> 1, "arne" -> 1,
    "are" -> 1, "aste" -> 1, "en" -> 1, "anden" -> 1, "aren" -> 1,
    "heten" -> 1, "ern" -> 1, "ar" -> 1, "er" -> 1, "heter" -> 1,
    "or" -> 1, "s" -> 2, "as" -> 1, "arnas" -> 1, "ernas" -> 1,
    "ornas" -> 1, "es" -> 1, "ades" -> 1, "andes" -> 1, "ens" -> 1,
    "arens" -> 1, "hetens" -> 1, "erns" -> 1, "at" -> 1, "andet" -> 1,
    "het" -> 1, "ast" -> 1)
  private val svPairs = Array("dd", "gd", "nn", "dt", "gt", "kt", "tt")
  private val svOther: Array[(String, Int)] = Array(
    "ig" -> 1, "lig" -> 1, "els" -> 1, "fullt" -> 3, "löst" -> 2)

  /** Swedish Snowball (reference ext/SwedishStemmer.java:90-330; the
    * published swedish.sbl): main-suffix delete ('s' gated on the
    * s-ending set b c d f g h j k l m n o p r t v y — checked OUTSIDE
    * the R1 limit, which find_among_b restores before the gate), then
    * undouble dd/gd/nn/dt/gt/kt/tt inside R1, then
    * ig/lig/els delete + löst->lös + fullt->full inside R1. */
  def swedish(w: String): String = {
    val isV = (c: Char) => "aeiouyäåö".indexOf(c) >= 0
    val p1 = scandinavianP1(w, isV)
    var s = w
    val m0 = longestR1(s, p1, svMain)
    if (m0 != null) m0._2 match {
      case 1 => s = s.dropRight(m0._1.length)
      case _ =>
        val j = s.length - 2
        if (j >= 0 && "bcdfghjklmnoprtvy".indexOf(s.charAt(j)) >= 0)
          s = s.dropRight(1)
    }
    if (svPairs.exists(p => s.length - 2 >= p1 && s.endsWith(p)))
      s = s.dropRight(1)
    val m2 = longestR1(s, p1, svOther)
    if (m2 != null) m2._2 match {
      case 1 => s = s.dropRight(m2._1.length)
      case 2 => s = s.dropRight(m2._1.length) + "lös"
      case _ => s = s.dropRight(m2._1.length) + "full"
    }
    s
  }

  private val noMain: Array[(String, Int)] = Array(
    "a" -> 1, "e" -> 1, "ede" -> 1, "ande" -> 1, "ende" -> 1,
    "ane" -> 1, "ene" -> 1, "hetene" -> 1, "erte" -> 3, "en" -> 1,
    "heten" -> 1, "ar" -> 1, "er" -> 1, "heter" -> 1, "s" -> 2,
    "as" -> 1, "es" -> 1, "edes" -> 1, "endes" -> 1, "enes" -> 1,
    "hetenes" -> 1, "ens" -> 1, "hetens" -> 1, "ers" -> 1, "ets" -> 1,
    "et" -> 1, "het" -> 1, "ert" -> 3, "ast" -> 1)
  private val noPairs = Array("dt", "vt")
  private val noOther: Array[(String, Int)] = Array(
    "leg" -> 1, "eleg" -> 1, "ig" -> 1, "eig" -> 1, "lig" -> 1,
    "elig" -> 1, "els" -> 1, "lov" -> 1, "elov" -> 1, "slov" -> 1,
    "hetslov" -> 1)

  /** Norwegian Snowball (reference ext/NorwegianStemmer.java:80-330;
    * norwegian.sbl, Bokmål): main-suffix delete with 's' gated on the
    * s-ending set (b c d f g h j l m n o p r t v y z — no 'k') OR a 'k'
    * preceded by a non-vowel; erte/ert -> er; dt/vt undouble inside R1;
    * leg/eleg/ig/eig/lig/elig/els/lov/elov/slov/hetslov delete. */
  def norwegian(w: String): String = {
    val isV = (c: Char) => "aeiouyåæø".indexOf(c) >= 0
    val p1 = scandinavianP1(w, isV)
    var s = w
    val m0 = longestR1(s, p1, noMain)
    if (m0 != null) m0._2 match {
      case 1 => s = s.dropRight(m0._1.length)
      case 2 =>
        val j = s.length - 2
        if (j >= 0) {
          val c = s.charAt(j)
          if ("bcdfghjlmnoprtvyz".indexOf(c) >= 0) s = s.dropRight(1)
          else if (c == 'k' && j >= 1 && !isV(s.charAt(j - 1)))
            s = s.dropRight(1)
        }
      case _ => s = s.dropRight(m0._1.length) + "er"
    }
    if (noPairs.exists(p => s.length - 2 >= p1 && s.endsWith(p)))
      s = s.dropRight(1)
    val m2 = longestR1(s, p1, noOther)
    if (m2 != null) s = s.dropRight(m2._1.length)
    s
  }

  // ------------------------------------------------------------------
  // Russian (reference ext/RussianStemmer.java; russian.sbl). All steps
  // run inside setlimit tomark pV (RV); find_among_b takes the LONGEST
  // match and a failed а/я gate fails the whole step with no
  // shorter-suffix retry.
  // ------------------------------------------------------------------

  private val ruGerund: Array[(String, Int)] = Array(
    "в" -> 1, "ив" -> 2, "ыв" -> 2, "вши" -> 1, "ивши" -> 2, "ывши" -> 2,
    "вшись" -> 1, "ившись" -> 2, "ывшись" -> 2)
  private val ruAdjective: Array[(String, Int)] = Array(
    "ее" -> 1, "ие" -> 1, "ое" -> 1, "ые" -> 1, "ими" -> 1, "ыми" -> 1,
    "ей" -> 1, "ий" -> 1, "ой" -> 1, "ый" -> 1, "ем" -> 1, "им" -> 1,
    "ом" -> 1, "ым" -> 1, "его" -> 1, "ого" -> 1, "ему" -> 1, "ому" -> 1,
    "их" -> 1, "ых" -> 1, "ею" -> 1, "ою" -> 1, "ую" -> 1, "юю" -> 1,
    "ая" -> 1, "яя" -> 1)
  private val ruParticiple: Array[(String, Int)] = Array(
    "ем" -> 1, "нн" -> 1, "вш" -> 1, "ивш" -> 2, "ывш" -> 2, "щ" -> 1,
    "ющ" -> 1, "ующ" -> 2)
  private val ruVerb: Array[(String, Int)] = Array(
    "ла" -> 1, "ила" -> 2, "ыла" -> 2, "на" -> 1, "ена" -> 2, "ете" -> 1,
    "ите" -> 2, "йте" -> 1, "ейте" -> 2, "уйте" -> 2, "ли" -> 1,
    "или" -> 2, "ыли" -> 2, "й" -> 1, "ей" -> 2, "уй" -> 2, "л" -> 1,
    "ил" -> 2, "ыл" -> 2, "ем" -> 1, "им" -> 2, "ым" -> 2, "н" -> 1,
    "ен" -> 2, "ло" -> 1, "ило" -> 2, "ыло" -> 2, "но" -> 1, "ено" -> 2,
    "нно" -> 1, "ет" -> 1, "ует" -> 2, "ит" -> 2, "ыт" -> 2, "ют" -> 1,
    "уют" -> 2, "ят" -> 2, "ны" -> 1, "ены" -> 2, "ть" -> 1, "ить" -> 2,
    "ыть" -> 2, "ешь" -> 1, "ишь" -> 2, "ю" -> 2, "ую" -> 2)
  private val ruNoun: Array[(String, Int)] = Array(
    "а" -> 1, "ев" -> 1, "ов" -> 1, "е" -> 1, "ие" -> 1, "ье" -> 1,
    "и" -> 1, "еи" -> 1, "ии" -> 1, "ами" -> 1, "ями" -> 1, "иями" -> 1,
    "й" -> 1, "ей" -> 1, "ией" -> 1, "ий" -> 1, "ой" -> 1, "ам" -> 1,
    "ем" -> 1, "ием" -> 1, "ом" -> 1, "ям" -> 1, "иям" -> 1, "о" -> 1,
    "у" -> 1, "ах" -> 1, "ях" -> 1, "иях" -> 1, "ы" -> 1, "ь" -> 1,
    "ю" -> 1, "ию" -> 1, "ью" -> 1, "я" -> 1, "ия" -> 1, "ья" -> 1)
  private val ruDeriv: Array[(String, Int)] = Array("ост" -> 1, "ость" -> 1)
  private val ruTidy: Array[(String, Int)] = Array(
    "ейше" -> 1, "н" -> 2, "ейш" -> 1, "ь" -> 3)

  /** Russian Snowball (reference ext/RussianStemmer.java:188-720):
    * perfective gerund (а/я-gated group 1) OR (try reflexive; then
    * adjectival-with-optional-participle OR verb OR noun), then a final
    * -и, then ост/ость in R2, then the нн/ейш(е)/ь tidy-up — every
    * suffix (and gate char) inside RV. */
  def russian(w: String): String = {
    val vs = "аеиоуыэюя"
    def isV(c: Char) = vs.indexOf(c) >= 0
    val n = w.length
    var pV = n
    var p2 = n
    var i = 0
    while (i < n && !isV(w.charAt(i))) i += 1
    if (i < n) {
      i += 1; pV = i
      while (i < n && isV(w.charAt(i))) i += 1
      if (i < n) {
        i += 1 // p1 (unused)
        while (i < n && !isV(w.charAt(i))) i += 1
        if (i < n) {
          i += 1
          while (i < n && isV(w.charAt(i))) i += 1
          if (i < n) { i += 1; p2 = i }
        }
      }
    }
    var s = w
    // а/я gate: the char preceding the suffix, itself inside RV
    def gated(suf: String): Boolean = {
      val j = s.length - suf.length - 1
      j >= pV && (s.charAt(j) == 'а' || s.charAt(j) == 'я')
    }
    // step 1
    val g = longestR1(s, pV, ruGerund)
    var done1 = false
    if (g != null) {
      if (g._2 == 2) { s = s.dropRight(g._1.length); done1 = true }
      else if (gated(g._1)) { s = s.dropRight(g._1.length); done1 = true }
    }
    if (!done1) {
      // try reflexive
      val r = longestR1(s, pV, Array("сь" -> 1, "ся" -> 1))
      if (r != null) s = s.dropRight(r._1.length)
      // or(adjectival, verb, noun)
      var matched = false
      val a = longestR1(s, pV, ruAdjective)
      if (a != null) {
        s = s.dropRight(a._1.length)
        matched = true
        val p = longestR1(s, pV, ruParticiple)
        if (p != null) {
          if (p._2 == 2) s = s.dropRight(p._1.length)
          else if (gated(p._1)) s = s.dropRight(p._1.length)
        }
      }
      if (!matched) {
        val v = longestR1(s, pV, ruVerb)
        if (v != null) {
          if (v._2 == 2) { s = s.dropRight(v._1.length); matched = true }
          else if (gated(v._1)) { s = s.dropRight(v._1.length); matched = true }
        }
      }
      if (!matched) {
        val nn = longestR1(s, pV, ruNoun)
        if (nn != null) s = s.dropRight(nn._1.length)
      }
    }
    // step 2: final и
    if (s.endsWith("и") && s.length - 1 >= pV) s = s.dropRight(1)
    // step 3: derivational in R2
    val d = longestR1(s, pV, ruDeriv)
    if (d != null && s.length - d._1.length >= p2) s = s.dropRight(d._1.length)
    // step 4: tidy up
    val t = longestR1(s, pV, ruTidy)
    if (t != null) t._2 match {
      case 1 =>
        s = s.dropRight(t._1.length)
        if (s.endsWith("нн") && s.length - 2 >= pV) s = s.dropRight(1)
      case 2 =>
        if (s.length >= 2 && s.charAt(s.length - 2) == 'н' &&
          s.length - 2 >= pV) s = s.dropRight(1)
      case _ => s = s.dropRight(1)
    }
    s
  }

  // ------------------------------------------------------------------
  // English Porter2 (reference ext/EnglishStemmer.java; english.sbl —
  // the SnowballPorterFilterFactory language=English alternative to the
  // chain's Porter1). Porter1 lives in analysis/PorterStemmer.
  // ------------------------------------------------------------------

  private val enExc1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")
  private val enExc2 = Set("inning", "outing", "canning", "herring",
    "earring", "proceed", "exceed", "succeed")
  private val enStep2: Array[(String, String)] = Array(
    "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "abli" -> "able", "entli" -> "ent", "izer" -> "ize",
    "ization" -> "ize", "ational" -> "ate", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "aliti" -> "al", "alli" -> "al",
    "fulness" -> "ful", "ousli" -> "ous", "ousness" -> "ous",
    "iveness" -> "ive", "iviti" -> "ive", "biliti" -> "ble",
    "bli" -> "ble", "fulli" -> "ful", "lessli" -> "less",
    "ogi" -> "og", "li" -> "") // ogi/li carry extra gates (below)
  private val enStep3: Array[(String, String)] = Array(
    "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
    "icate" -> "ic", "iciti" -> "ic", "ical" -> "ic", "ful" -> "",
    "ness" -> "", "ative" -> "") // ative carries the R2 gate (below)
  private val enStep4 = Array("ement", "ance", "ence", "able", "ible",
    "ment", "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic")

  /** English Porter2 (ext/EnglishStemmer.java:179-1250): prelude
    * (leading-' strip, consonant-y marking), gener/commun/arsen R1
    * override, apostrophe step, 1a with the ied/ies hop-2 rule and the
    * exception2 stop list, 1b with at/bl/iz + undouble + short-word 'e',
    * y->i, the R1 suffix maps, R2 deletions (ion gated on s/t), e/l
    * tidy with the backward shortv test. Words under 3 chars unchanged. */
  def english2(w0: String): String = {
    enExc1.get(w0) match {
      case Some(r) => return r
      case None =>
    }
    if (w0.length < 3) return w0
    val vg = "aeiouy"
    // prelude: strip ONE leading ', then mark consonant y as Y
    var w = if (w0.startsWith("'")) w0.substring(1) else w0
    val sb = new StringBuilder(w)
    if (sb.nonEmpty && sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var k = 1
    while (k < sb.length) {
      if (sb.charAt(k) == 'y' && vg.indexOf(sb.charAt(k - 1)) >= 0)
        sb.setCharAt(k, 'Y')
      k += 1
    }
    w = sb.toString
    def isV(c: Char) = vg.indexOf(c) >= 0
    // mark_regions with the gener/commun/arsen override
    val n0 = w.length
    var p1 = n0
    var p2 = n0
    val pref = Seq("gener", "commun", "arsen").find(w.startsWith)
    var i = 0
    var haveP1 = false
    pref match {
      case Some(p) => i = p.length; p1 = i; haveP1 = true
      case None =>
        while (i < n0 && !isV(w.charAt(i))) i += 1
        if (i < n0) {
          i += 1
          while (i < n0 && !(!isV(w.charAt(i)))) i += 1 // gopast non-v
          if (i < n0) { i += 1; p1 = i; haveP1 = true }
        }
    }
    if (haveP1) {
      var j = p1
      while (j < n0 && !isV(w.charAt(j))) j += 1
      if (j < n0) {
        j += 1
        while (j < n0 && isV(w.charAt(j))) j += 1
        if (j < n0) { j += 1; p2 = j }
      }
    }
    var s = w
    def inR1(sufLen: Int) = s.length - sufLen >= p1
    def inR2(sufLen: Int) = s.length - sufLen >= p2
    // backward shortv at position `end` (exclusive): non-vWXY v non-v,
    // or (v non-v) at the very start
    def shortv(end: Int): Boolean = {
      def vW(c: Char) = isV(c) || c == 'w' || c == 'x' || c == 'Y'
      (end >= 3 && !vW(s.charAt(end - 1)) && isV(s.charAt(end - 2)) &&
        !isV(s.charAt(end - 3))) ||
      (end == 2 && !isV(s.charAt(end - 1)) && isV(s.charAt(end - 2)))
    }
    // Step 1a: try apostrophe suffixes, then the s-family
    for (ap <- Seq("'s'", "'s", "'").find(s.endsWith)) s = s.dropRight(ap.length)
    if (s.endsWith("sses")) s = s.dropRight(2)
    else if (s.endsWith("ied") || s.endsWith("ies")) {
      s = if (s.length - 3 > 1) s.dropRight(2) else s.dropRight(1)
    } else if (s.endsWith("us") || s.endsWith("ss")) { /* keep */ }
    else if (s.endsWith("s")) {
      // a vowel must exist before the char preceding the s
      var j = s.length - 3
      var found = false
      while (j >= 0 && !found) { if (isV(s.charAt(j))) found = true; j -= 1 }
      if (found) s = s.dropRight(1)
    }
    if (enExc2.contains(s)) return s.replace('Y', 'y')
    // Step 1b
    if (s.endsWith("eedly")) { if (inR1(5)) s = s.dropRight(5) + "ee" }
    else if (s.endsWith("eed")) { if (inR1(3)) s = s.dropRight(3) + "ee" }
    else {
      val suf = Seq("ingly", "edly", "ing", "ed").find(s.endsWith)
      for (sf <- suf) {
        val stemEnd = s.length - sf.length
        if ((0 until stemEnd).exists(x => isV(s.charAt(x)))) {
          s = s.dropRight(sf.length)
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz"))
            s = s + "e"
          else if (Seq("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr",
            "tt").exists(s.endsWith)) s = s.dropRight(1)
          else if (s.length == p1 && shortv(s.length)) s = s + "e"
        }
      }
    }
    // Step 1c: y/Y -> i after a non-vowel that is not the first char
    if (s.length >= 3 && (s.endsWith("y") || s.endsWith("Y")) &&
      !isV(s.charAt(s.length - 2)))
      s = s.dropRight(1) + "i"
    // Step 2 (longest match, R1)
    locally {
      var best: (String, String) = null
      for (e <- enStep2)
        if (s.endsWith(e._1) && (best == null || e._1.length > best._1.length))
          best = e
      if (best != null && inR1(best._1.length)) best._1 match {
        case "ogi" => // preceded by l -> og
          if (s.length - 4 >= 0 && s.charAt(s.length - 4) == 'l')
            s = s.dropRight(3) + "og"
        case "li" => // valid_LI (c d e g h k m n r t) before it
          if (s.length - 3 >= 0 &&
            "cdeghkmnrt".indexOf(s.charAt(s.length - 3)) >= 0)
            s = s.dropRight(2)
        case _ => s = s.dropRight(best._1.length) + best._2
      }
    }
    // Step 3 (longest match, R1; ative needs R2)
    locally {
      var best: (String, String) = null
      for (e <- enStep3)
        if (s.endsWith(e._1) && (best == null || e._1.length > best._1.length))
          best = e
      if (best != null && inR1(best._1.length)) best._1 match {
        case "ative" => if (inR2(5)) s = s.dropRight(5)
        case _ => s = s.dropRight(best._1.length) + best._2
      }
    }
    // Step 4 (longest match, R2; ion gated on preceding s/t)
    locally {
      var best: String = null
      for (e <- enStep4)
        if (s.endsWith(e) && (best == null || e.length > best.length))
          best = e
      if (best != null && inR2(best.length)) {
        if (best == "ion") {
          val j = s.length - 4
          if (j >= 0 && (s.charAt(j) == 's' || s.charAt(j) == 't'))
            s = s.dropRight(3)
        } else s = s.dropRight(best.length)
      }
    }
    // Step 5
    if (s.endsWith("e") &&
      (inR2(1) || (inR1(1) && !shortv(s.length - 1)))) s = s.dropRight(1)
    else if (s.endsWith("l") && inR2(1) && s.length >= 2 &&
      s.charAt(s.length - 2) == 'l') s = s.dropRight(1)
    // postlude
    s.replace('Y', 'y')
  }

  // ------------------------------------------------------------------
  // Spanish (reference ext/SpanishStemmer.java; spanish.sbl).
  // ------------------------------------------------------------------

  private val esV = "aeiouáéíóúü"

  /** Romance RV (spanish.sbl mark_regions, shared shape): second letter
    * consonant -> after the next vowel; first two vowels -> after the
    * next consonant; consonant-vowel start -> after the third letter. */
  private def romanceRV(w: String, vowels: String): Int = {
    val n = w.length
    def isV(i: Int) = vowels.indexOf(w.charAt(i)) >= 0
    if (n < 3) return n
    if (!isV(1)) {
      var i = 2
      while (i < n && !isV(i)) i += 1
      if (i < n) i + 1 else n
    } else if (isV(0)) {
      var i = 2
      while (i < n && isV(i)) i += 1
      if (i < n) i + 1 else n
    } else 3
  }

  /** Standard R1/R2 over an arbitrary vowel set. */
  private def stdR1R2(w: String, vowels: String): (Int, Int) = {
    val n = w.length
    def isV(i: Int) = vowels.indexOf(w.charAt(i)) >= 0
    def mark(from: Int): Int = {
      var i = from
      while (i < n && !isV(i)) i += 1
      if (i >= n) return n
      i += 1
      while (i < n && isV(i)) i += 1
      if (i >= n) return n
      i + 1
    }
    // gopast v, gopast non-v
    var i = 0
    while (i < n && !isV(i)) i += 1
    var p1 = n
    if (i < n) {
      i += 1
      while (i < n && isV(i)) i += 1
      if (i < n) p1 = i + 1
    }
    val p2 = if (p1 >= n) n else mark(p1)
    (p1, p2)
  }

  private val esPronouns = Array("la", "sela", "le", "me", "se", "lo",
    "selo", "las", "selas", "les", "los", "selos", "nos")
  private val esPreStem: Array[(String, Int)] = Array(
    "ando" -> 6, "iendo" -> 6, "yendo" -> 7, "ándo" -> 2, "iéndo" -> 1,
    "ar" -> 6, "er" -> 6, "ir" -> 6, "ár" -> 3, "ér" -> 4, "ír" -> 5)
  private val esStd: Array[(String, Int)] = Array(
    "ica" -> 1, "ancia" -> 2, "encia" -> 5, "adora" -> 2, "osa" -> 1,
    "ista" -> 1, "iva" -> 9, "anza" -> 1, "logía" -> 3, "idad" -> 8,
    "able" -> 1, "ible" -> 1, "ante" -> 2, "mente" -> 7, "amente" -> 6,
    "ación" -> 2, "ución" -> 4, "ico" -> 1, "ismo" -> 1, "oso" -> 1,
    "amiento" -> 1, "imiento" -> 1, "ivo" -> 9, "ador" -> 2, "icas" -> 1,
    "ancias" -> 2, "encias" -> 5, "adoras" -> 2, "osas" -> 1,
    "istas" -> 1, "ivas" -> 9, "anzas" -> 1, "logías" -> 3,
    "idades" -> 8, "ables" -> 1, "ibles" -> 1, "aciones" -> 2,
    "uciones" -> 4, "adores" -> 2, "antes" -> 2, "icos" -> 1,
    "ismos" -> 1, "osos" -> 1, "amientos" -> 1, "imientos" -> 1,
    "ivos" -> 9)
  private val esYVerb = Array("ya", "ye", "yan", "yen", "yeron", "yendo",
    "yo", "yas", "yes", "yais", "yamos", "yó")
  private val esVerb: Array[(String, Int)] = Array(
    "aba" -> 2, "ada" -> 2, "ida" -> 2, "ara" -> 2, "iera" -> 2,
    "ía" -> 2, "aría" -> 2, "ería" -> 2, "iría" -> 2, "ad" -> 2,
    "ed" -> 2, "id" -> 2, "ase" -> 2, "iese" -> 2, "aste" -> 2,
    "iste" -> 2, "an" -> 2, "aban" -> 2, "aran" -> 2, "ieran" -> 2,
    "ían" -> 2, "arían" -> 2, "erían" -> 2, "irían" -> 2, "en" -> 1,
    "asen" -> 2, "iesen" -> 2, "aron" -> 2, "ieron" -> 2, "arán" -> 2,
    "erán" -> 2, "irán" -> 2, "ado" -> 2, "ido" -> 2, "ando" -> 2,
    "iendo" -> 2, "ar" -> 2, "er" -> 2, "ir" -> 2, "as" -> 2,
    "abas" -> 2, "adas" -> 2, "idas" -> 2, "aras" -> 2, "ieras" -> 2,
    "ías" -> 2, "arías" -> 2, "erías" -> 2, "irías" -> 2, "es" -> 1,
    "ases" -> 2, "ieses" -> 2, "abais" -> 2, "arais" -> 2,
    "ierais" -> 2, "íais" -> 2, "aríais" -> 2, "eríais" -> 2,
    "iríais" -> 2, "aseis" -> 2, "ieseis" -> 2, "asteis" -> 2,
    "isteis" -> 2, "áis" -> 2, "éis" -> 1, "aréis" -> 2, "eréis" -> 2,
    "iréis" -> 2, "ados" -> 2, "idos" -> 2, "amos" -> 2, "ábamos" -> 2,
    "áramos" -> 2, "iéramos" -> 2, "íamos" -> 2, "aríamos" -> 2,
    "eríamos" -> 2, "iríamos" -> 2, "emos" -> 1, "aremos" -> 2,
    "eremos" -> 2, "iremos" -> 2, "ásemos" -> 2, "iésemos" -> 2,
    "imos" -> 2, "arás" -> 2, "erás" -> 2, "irás" -> 2, "ís" -> 2,
    "ará" -> 2, "erá" -> 2, "irá" -> 2, "aré" -> 2, "eré" -> 2,
    "iré" -> 2, "ió" -> 2)
  private val esResidual: Array[(String, Int)] = Array(
    "a" -> 1, "e" -> 2, "o" -> 1, "os" -> 1, "á" -> 1, "é" -> 2,
    "í" -> 1, "ó" -> 1)

  /** Spanish Snowball (reference ext/SpanishStemmer.java:30-760;
    * spanish.sbl): attached-pronoun strip (de-accenting the carrier
    * ending), standard suffixes OR y-verb OR verb forms, residual
    * vowels, final de-accent postlude. */
  def spanish(w: String): String = {
    val pV = romanceRV(w, esV)
    val (p1, p2) = stdR1R2(w, esV)
    var s = w
    def endsInR(sufLen: Int, p: Int) = s.length - sufLen >= p
    // step 0: attached pronoun
    locally {
      var pron: String = null
      for (p <- esPronouns)
        if (s.endsWith(p) && (pron == null || p.length > pron.length)) pron = p
      if (pron != null) {
        val base = s.dropRight(pron.length)
        var pre: (String, Int) = null
        for (e <- esPreStem)
          if (base.endsWith(e._1) && (pre == null || e._1.length > pre._1.length))
            pre = e
        if (pre != null && base.length - pre._1.length >= pV) {
          pre._2 match {
            case 1 => s = base.dropRight(pre._1.length) + "iendo"
            case 2 => s = base.dropRight(pre._1.length) + "ando"
            case 3 => s = base.dropRight(pre._1.length) + "ar"
            case 4 => s = base.dropRight(pre._1.length) + "er"
            case 5 => s = base.dropRight(pre._1.length) + "ir"
            case 6 => s = base
            case _ => // yendo: requires a 'u' right before
              if (base.length - pre._1.length - 1 >= 0 &&
                base.charAt(base.length - pre._1.length - 1) == 'u') s = base
          }
        }
      }
    }
    // step 1: standard suffix (or-chain with the verb steps)
    var did1 = false
    locally {
      var best: (String, Int) = null
      for (e <- esStd)
        if (s.endsWith(e._1) && (best == null || e._1.length > best._1.length))
          best = e
      if (best != null) {
        val L = best._1.length
        def tryDrop(sufs: Seq[String]): Unit = {
          var b: String = null
          for (x <- sufs)
            if (s.endsWith(x) && (b == null || x.length > b.length)) b = x
          if (b != null && endsInR(b.length, p2)) s = s.dropRight(b.length)
        }
        best._2 match {
          case 1 => if (endsInR(L, p2)) { s = s.dropRight(L); did1 = true }
          case 2 => if (endsInR(L, p2)) {
            s = s.dropRight(L); did1 = true
            if (s.endsWith("ic") && endsInR(2, p2)) s = s.dropRight(2)
          }
          case 3 => if (endsInR(L, p2)) { s = s.dropRight(L) + "log"; did1 = true }
          case 4 => if (endsInR(L, p2)) { s = s.dropRight(L) + "u"; did1 = true }
          case 5 => if (endsInR(L, p2)) { s = s.dropRight(L) + "ente"; did1 = true }
          case 6 => if (endsInR(L, p1)) {
            s = s.dropRight(L); did1 = true
            if (s.endsWith("iv") && endsInR(2, p2)) {
              s = s.dropRight(2)
              if (s.endsWith("at") && endsInR(2, p2)) s = s.dropRight(2)
            } else tryDrop(Seq("os", "ic", "ad"))
          }
          case 7 => if (endsInR(L, p2)) {
            s = s.dropRight(L); did1 = true
            tryDrop(Seq("ante", "able", "ible"))
          }
          case 8 => if (endsInR(L, p2)) {
            s = s.dropRight(L); did1 = true
            tryDrop(Seq("abil", "ic", "iv"))
          }
          case _ => if (endsInR(L, p2)) {
            s = s.dropRight(L); did1 = true
            if (s.endsWith("at") && endsInR(2, p2)) s = s.dropRight(2)
          }
        }
      }
    }
    // step 2a: y-verb (only if step 1 did nothing)
    var did2a = false
    if (!did1) {
      val best = longestR1(s, pV, esYVerb.map(_ -> 1))
      if (best != null) {
        val j = s.length - best._1.length - 1
        if (j >= 0 && s.charAt(j) == 'u') {
          s = s.dropRight(best._1.length); did2a = true
        }
      }
    }
    // step 2b: verb forms
    if (!did1 && !did2a) {
      val best = longestR1(s, pV, esVerb)
      if (best != null) {
        s = s.dropRight(best._1.length)
        if (best._2 == 1 && s.endsWith("gu")) s = s.dropRight(1)
      }
    }
    // step 3: residual
    locally {
      var best: (String, Int) = null
      for (e <- esResidual)
        if (s.endsWith(e._1) && (best == null || e._1.length > best._1.length))
          best = e
      if (best != null && s.length - best._1.length >= pV) {
        if (best._2 == 1) s = s.dropRight(best._1.length)
        else {
          s = s.dropRight(best._1.length)
          if (s.endsWith("gu") && s.length - 1 >= pV) s = s.dropRight(1)
        }
      }
    }
    // postlude: strip acute accents
    s.map {
      case 'á' => 'a'
      case 'é' => 'e'
      case 'í' => 'i'
      case 'ó' => 'o'
      case 'ú' => 'u'
      case c => c
    }
  }


  // ------------------------------------------------------------------
  // Portuguese (reference ext/PortugueseStemmer.java; portuguese.sbl).
  // Complements the analyzer-default light stemmer and the RSLP Orengo
  // port.
  // ------------------------------------------------------------------

  private val ptV = "aeiouáéíóúâêô"
  private val ptStd: Array[(String, Int)] = Array(
    "ica" -> 1, "ância" -> 1, "ência" -> 4, "ira" -> 9, "adora" -> 1,
    "osa" -> 1, "ista" -> 1, "iva" -> 8, "eza" -> 1, "logía" -> 2,
    "idade" -> 7, "ante" -> 1, "mente" -> 6, "amente" -> 5, "ável" -> 1,
    "ível" -> 1, "ución" -> 3, "ico" -> 1, "ismo" -> 1, "oso" -> 1,
    "amento" -> 1, "imento" -> 1, "ivo" -> 8, "aça~o" -> 1, "ador" -> 1,
    "icas" -> 1, "ências" -> 4, "iras" -> 9, "adoras" -> 1, "osas" -> 1,
    "istas" -> 1, "ivas" -> 8, "ezas" -> 1, "logías" -> 2,
    "idades" -> 7, "uciones" -> 3, "adores" -> 1, "antes" -> 1,
    "aço~es" -> 1, "icos" -> 1, "ismos" -> 1, "osos" -> 1,
    "amentos" -> 1, "imentos" -> 1, "ivos" -> 8)
  private val ptVerb: Array[(String, Int)] = Array(
    "ada", "ida", "ia", "aria", "eria", "iria", "ara", "era", "ira",
    "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei",
    "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam",
    "aram", "eram", "iram", "avam", "em", "arem", "erem", "irem",
    "assem", "essem", "issem", "ado", "ido", "ando", "endo", "indo",
    "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas", "idas",
    "ias", "arias", "erias", "irias", "aras", "eras", "iras", "avas",
    "es", "ardes", "erdes", "irdes", "ares", "eres", "ires", "asses",
    "esses", "isses", "astes", "estes", "istes", "is", "ais", "eis",
    "areis", "ereis", "ireis", "áreis", "éreis", "íreis", "ásseis",
    "ésseis", "ísseis", "áveis", "íeis", "aríeis", "eríeis", "iríeis",
    "ados", "idos", "amos", "áramos", "éramos", "íramos", "ávamos",
    "íamos", "aríamos", "eríamos", "iríamos", "emos", "aremos",
    "eremos", "iremos", "ássemos", "êssemos", "íssemos", "imos",
    "armos", "ermos", "irmos", "ámos", "arás", "erás", "irás", "eu",
    "iu", "ou", "ará", "erá", "irá").map(_ -> 1)
  private val ptResidual = Array("a", "i", "o", "os", "á", "í", "ó")

  /** Portuguese Snowball (reference ext/PortugueseStemmer.java:30-900):
    * nasal-vowel prelude (ã/õ -> a~/o~), free-match standard suffixes
    * with per-case R1/R2/RV gates (incl. eira->eir), RV-limited verb
    * forms, the [i]c cleanup after any suffix removal, residual vowels
    * and the e/é/ê + gu/ci residual form, nasal postlude. */
  def portugueseSnowball(w0: String): String = {
    val w = w0.replace("ã", "a~").replace("õ", "o~")
    val pV = romanceRV(w, ptV)
    val (p1, p2) = stdR1R2(w, ptV)
    var s = w
    var did = false
    // standard_suffix: free longest, gates per case
    locally {
      var best: (String, Int) = null
      for (e <- ptStd)
        if (s.endsWith(e._1) && (best == null || e._1.length > best._1.length))
          best = e
      if (best != null) {
        val L = best._1.length
        def r2(k: Int) = s.length - k >= p2
        def tryDrop(sufs: Seq[String]): Unit = {
          var b: String = null
          for (x <- sufs)
            if (s.endsWith(x) && (b == null || x.length > b.length)) b = x
          if (b != null && s.length - b.length >= p2) s = s.dropRight(b.length)
        }
        best._2 match {
          case 1 => if (r2(L)) { s = s.dropRight(L); did = true }
          case 2 => if (r2(L)) { s = s.dropRight(L) + "log"; did = true }
          case 3 => if (r2(L)) { s = s.dropRight(L) + "u"; did = true }
          case 4 => if (r2(L)) { s = s.dropRight(L) + "ente"; did = true }
          case 5 => if (s.length - L >= p1) {
            s = s.dropRight(L); did = true
            if (s.endsWith("iv") && s.length - 2 >= p2) {
              s = s.dropRight(2)
              if (s.endsWith("at") && s.length - 2 >= p2) s = s.dropRight(2)
            } else tryDrop(Seq("os", "ic", "ad"))
          }
          case 6 => if (r2(L)) {
            s = s.dropRight(L); did = true
            tryDrop(Seq("ante", "avel", "ível"))
          }
          case 7 => if (r2(L)) {
            s = s.dropRight(L); did = true
            tryDrop(Seq("abil", "ic", "iv"))
          }
          case 8 => if (r2(L)) {
            s = s.dropRight(L); did = true
            if (s.endsWith("at") && s.length - 2 >= p2) s = s.dropRight(2)
          }
          case _ => // ira(s) in RV preceded by e -> ir
            if (s.length - L >= pV &&
              s.length - L - 1 >= 0 && s.charAt(s.length - L - 1) == 'e') {
              s = s.dropRight(L) + "ir"; did = true
            }
        }
      }
    }
    // verb_suffix under the RV limit
    if (!did) {
      val best = longestR1(s, pV, ptVerb)
      if (best != null) { s = s.dropRight(best._1.length); did = true }
    }
    if (did) {
      // [i] preceded by c, i in RV
      if (s.endsWith("i") && s.length - 1 >= pV && s.length >= 2 &&
        s.charAt(s.length - 2) == 'c') s = s.dropRight(1)
    } else {
      // residual_suffix: free longest + RV gate
      var best: String = null
      for (x <- ptResidual)
        if (s.endsWith(x) && (best == null || x.length > best.length)) best = x
      if (best != null && s.length - best.length >= pV)
        s = s.dropRight(best.length)
    }
    // residual_form
    locally {
      var best: (String, Int) = null
      for (e <- Array("e" -> 1, "é" -> 1, "ê" -> 1, "ç" -> 2))
        if (s.endsWith(e._1) && (best == null || e._1.length > best._1.length))
          best = e
      if (best != null) {
        if (best._2 == 2) s = s.dropRight(1) + "c"
        else if (s.length - 1 >= pV) {
          s = s.dropRight(1)
          if (s.endsWith("gu") && s.length - 1 >= pV) s = s.dropRight(1)
          else if (s.endsWith("ci") && s.length - 1 >= pV) s = s.dropRight(1)
        }
      }
    }
    s.replace("a~", "ã").replace("o~", "õ")
  }


  // ------------------------------------------------------------------
  // Italian (reference ext/ItalianStemmer.java; italian.sbl).
  // ------------------------------------------------------------------

  private val itV = "aeiouàèìòù"
  private val itPronouns = Array("la", "cela", "gliela", "mela", "tela",
    "vela", "le", "cele", "gliele", "mele", "tele", "vele", "ne", "cene",
    "gliene", "mene", "sene", "tene", "vene", "ci", "li", "celi",
    "glieli", "meli", "teli", "veli", "gli", "mi", "si", "ti", "vi",
    "lo", "celo", "glielo", "melo", "telo", "velo")
  private val itPreStem: Array[(String, Int)] = Array(
    "ando" -> 1, "endo" -> 1, "ar" -> 2, "er" -> 2, "ir" -> 2)
  private val itStd: Array[(String, Int)] = Array(
    "ica" -> 1, "logia" -> 3, "osa" -> 1, "ista" -> 1, "iva" -> 9,
    "anza" -> 1, "enza" -> 5, "ice" -> 1, "atrice" -> 1, "iche" -> 1,
    "logie" -> 3, "abile" -> 1, "ibile" -> 1, "usione" -> 4,
    "azione" -> 2, "uzione" -> 4, "atore" -> 2, "ose" -> 1, "ante" -> 1,
    "mente" -> 1, "amente" -> 7, "iste" -> 1, "ive" -> 9, "anze" -> 1,
    "enze" -> 5, "ici" -> 1, "atrici" -> 1, "ichi" -> 1, "abili" -> 1,
    "ibili" -> 1, "ismi" -> 1, "usioni" -> 4, "azioni" -> 2,
    "uzioni" -> 4, "atori" -> 2, "osi" -> 1, "anti" -> 1,
    "amenti" -> 6, "imenti" -> 6, "isti" -> 1, "ivi" -> 9, "ico" -> 1,
    "ismo" -> 1, "oso" -> 1, "amento" -> 6, "imento" -> 6, "ivo" -> 9,
    "ità" -> 8, "istà" -> 1, "istè" -> 1, "istì" -> 1)
  private val itVerb: Array[(String, Int)] = Array(
    "isca", "enda", "ata", "ita", "uta", "ava", "eva", "iva", "erebbe",
    "irebbe", "isce", "ende", "are", "ere", "ire", "asse", "ate",
    "avate", "evate", "ivate", "ete", "erete", "irete", "ite",
    "ereste", "ireste", "ute", "erai", "irai", "isci", "endi", "erei",
    "irei", "assi", "ati", "iti", "eresti", "iresti", "uti", "avi",
    "evi", "ivi", "isco", "ando", "endo", "Yamo", "iamo", "avamo",
    "evamo", "ivamo", "eremo", "iremo", "assimo", "ammo", "emmo",
    "eremmo", "iremmo", "immo", "ano", "iscano", "avano", "evano",
    "ivano", "eranno", "iranno", "ono", "iscono", "arono", "erono",
    "irono", "erebbero", "irebbero", "assero", "essero", "issero",
    "ato", "ito", "uto", "avo", "evo", "ivo", "ar", "ir", "erà",
    "irà", "erò", "irò").map(_ -> 1)

  /** Italian Snowball (reference ext/ItalianStemmer.java:30-900):
    * accent-normalizing prelude with qU and intervocalic U/I marking,
    * attached pronoun (ando/endo keep, ar/er/ir -> e), free-match
    * standard suffixes with per-case R1/R2/RV gates, RV-limited verb
    * forms, final-vowel (+i) removal and the c/g-h cleanup, marker
    * postlude. */
  def italian(w0: String): String = {
    // prelude
    var w = w0.map {
      case 'á' => 'à'
      case 'é' => 'è'
      case 'í' => 'ì'
      case 'ó' => 'ò'
      case 'ú' => 'ù'
      case c => c
    }
    w = w.replace("qu", "qU")
    val sb = new StringBuilder(w)
    var k = 1
    while (k < sb.length - 1) {
      val c = sb.charAt(k)
      if ((c == 'u' || c == 'i') &&
        itV.indexOf(sb.charAt(k - 1)) >= 0 &&
        itV.indexOf(sb.charAt(k + 1)) >= 0)
        sb.setCharAt(k, if (c == 'u') 'U' else 'I')
      k += 1
    }
    w = sb.toString
    val pV = romanceRV(w, itV)
    val (p1, p2) = stdR1R2(w, itV)
    var s = w
    // attached pronoun
    locally {
      var pron: String = null
      for (p <- itPronouns)
        if (s.endsWith(p) && (pron == null || p.length > pron.length)) pron = p
      if (pron != null) {
        val base = s.dropRight(pron.length)
        var pre: (String, Int) = null
        for (e <- itPreStem)
          if (base.endsWith(e._1) && (pre == null || e._1.length > pre._1.length))
            pre = e
        if (pre != null && base.length - pre._1.length >= pV) {
          if (pre._2 == 1) s = base
          else s = base + "e"
        }
      }
    }
    var did = false
    // standard_suffix: free longest + per-case gates
    locally {
      var best: (String, Int) = null
      for (e <- itStd)
        if (s.endsWith(e._1) && (best == null || e._1.length > best._1.length))
          best = e
      if (best != null) {
        val L = best._1.length
        def r2(kk: Int) = s.length - kk >= p2
        best._2 match {
          case 1 => if (r2(L)) { s = s.dropRight(L); did = true }
          case 2 => if (r2(L)) {
            s = s.dropRight(L); did = true
            if (s.endsWith("ic") && r2(2)) s = s.dropRight(2)
          }
          case 3 => if (r2(L)) { s = s.dropRight(L) + "log"; did = true }
          case 4 => if (r2(L)) { s = s.dropRight(L) + "u"; did = true }
          case 5 => if (r2(L)) { s = s.dropRight(L) + "ente"; did = true }
          case 6 => if (s.length - L >= pV) { s = s.dropRight(L); did = true }
          case 7 => if (s.length - L >= p1) {
            s = s.dropRight(L); did = true
            var b: String = null
            for (x <- Seq("abil", "ic", "os", "iv"))
              if (s.endsWith(x) && (b == null || x.length > b.length)) b = x
            if (b != null && r2(b.length)) {
              s = s.dropRight(b.length)
              if (b == "iv" && s.endsWith("at") && r2(2)) s = s.dropRight(2)
            }
          }
          case 8 => if (r2(L)) {
            s = s.dropRight(L); did = true
            var b: String = null
            for (x <- Seq("abil", "ic", "iv"))
              if (s.endsWith(x) && (b == null || x.length > b.length)) b = x
            if (b != null && r2(b.length)) s = s.dropRight(b.length)
          }
          case _ => if (r2(L)) {
            s = s.dropRight(L); did = true
            if (s.endsWith("at") && r2(2)) {
              s = s.dropRight(2)
              if (s.endsWith("ic") && r2(2)) s = s.dropRight(2)
            }
          }
        }
      }
    }
    // verb_suffix under the RV limit
    if (!did) {
      val best = longestR1(s, pV, itVerb)
      if (best != null) s = s.dropRight(best._1.length)
    }
    // vowel_suffix
    if (s.nonEmpty && "aeioàèìò".indexOf(s.last) >= 0 &&
      s.length - 1 >= pV) {
      s = s.dropRight(1)
      if (s.endsWith("i") && s.length - 1 >= pV) s = s.dropRight(1)
    }
    // [h] after c/g: the RV test runs after CONSUMING the c/g, so the
    // c/g itself must sit inside RV (ItalianStemmer.java r_vowel_suffix)
    if (s.endsWith("h") && s.length >= 2 &&
      (s.charAt(s.length - 2) == 'c' || s.charAt(s.length - 2) == 'g') &&
      s.length - 2 >= pV) s = s.dropRight(1)
    // postlude
    s.map {
      case 'I' => 'i'
      case 'U' => 'u'
      case c => c
    }
  }


  // ------------------------------------------------------------------
  // French (reference ext/FrenchStemmer.java; french.sbl).
  // ------------------------------------------------------------------

  private val frV = "aeiouyàâèéêëîïôùû"
  private val frStd: Array[(String, Int)] = Array(
    "iqUe" -> 1, "atrice" -> 2, "ance" -> 1, "ence" -> 5, "logie" -> 3,
    "able" -> 1, "isme" -> 1, "euse" -> 11, "iste" -> 1, "ive" -> 8,
    "if" -> 8, "usion" -> 4, "ation" -> 2, "ution" -> 4, "ateur" -> 2,
    "iqUes" -> 1, "atrices" -> 2, "ances" -> 1, "ences" -> 5,
    "logies" -> 3, "ables" -> 1, "ismes" -> 1, "euses" -> 11,
    "istes" -> 1, "ives" -> 8, "ifs" -> 8, "usions" -> 4,
    "ations" -> 2, "utions" -> 4, "ateurs" -> 2, "ments" -> 15,
    "ements" -> 6, "issements" -> 12, "ités" -> 7, "ment" -> 15,
    "ement" -> 6, "issement" -> 12, "amment" -> 13, "emment" -> 14,
    "aux" -> 10, "eaux" -> 9, "eux" -> 1, "ité" -> 7)
  private val frIVerb: Array[(String, Int)] = Array(
    "ira", "ie", "isse", "issante", "i", "irai", "ir", "iras", "ies",
    "îmes", "isses", "issantes", "îtes", "is", "irais", "issais",
    "irions", "issions", "irons", "issons", "issants", "it", "irait",
    "issait", "issant", "iraIent", "issaIent", "irent", "issent",
    "iront", "ît", "iriez", "issiez", "irez", "issez").map(_ -> 1)
  private val frVerb: Array[(String, Int)] = Array(
    "a" -> 3, "era" -> 2, "asse" -> 3, "ante" -> 3, "ée" -> 2,
    "ai" -> 3, "erai" -> 2, "er" -> 2, "as" -> 3, "eras" -> 2,
    "âmes" -> 3, "asses" -> 3, "antes" -> 3, "âtes" -> 3, "ées" -> 2,
    "ais" -> 3, "erais" -> 2, "ions" -> 1, "erions" -> 2,
    "assions" -> 3, "erons" -> 2, "ants" -> 3, "és" -> 2, "ait" -> 3,
    "erait" -> 2, "ant" -> 3, "aIent" -> 3, "eraIent" -> 2,
    "èrent" -> 2, "assent" -> 3, "eront" -> 2, "ât" -> 3, "ez" -> 2,
    "iez" -> 2, "eriez" -> 2, "assiez" -> 3, "erez" -> 2, "é" -> 2)
  private val frResidual: Array[(String, Int)] = Array(
    "e" -> 3, "Ière" -> 2, "ière" -> 2, "ion" -> 1, "Ier" -> 2,
    "ier" -> 2, "ë" -> 4)

  /** French Snowball (reference ext/FrenchStemmer.java:30-1330;
    * french.sbl): intervocalic U/I + vowel-adjacent Y + qU prelude, the
    * par/col/tap RV override, the dense standard-suffix table
    * (ment-family gates, eaux/aux, amment/emment, issement), i-verb and
    * verb conjugations under RV, residual s/ion/ier/e/ë, un_double
    * (ell/eill/enn/onn/ett) and un_accent (é|è + final consonants ->
    * e), marker postlude. */
  def french(w0: String): String = {
    // prelude: scan left-to-right like the reference's repeat-goto
    val sb = new StringBuilder(w0)
    def isVb(c: Char) = frV.indexOf(c) >= 0
    var k = 0
    while (k < sb.length) {
      val c = sb.charAt(k)
      if ((c == 'u' || c == 'i') && k > 0 && k + 1 < sb.length &&
        isVb(sb.charAt(k - 1)) && isVb(sb.charAt(k + 1)))
        sb.setCharAt(k, if (c == 'u') 'U' else 'I')
      else if (c == 'y' && ((k > 0 && isVb(sb.charAt(k - 1))) ||
        (k + 1 < sb.length && isVb(sb.charAt(k + 1)))))
        sb.setCharAt(k, 'Y')
      else if (c == 'u' && k > 0 && sb.charAt(k - 1) == 'q')
        sb.setCharAt(k, 'U')
      k += 1
    }
    val w = sb.toString
    val n = w.length
    def isV(i: Int) = frV.indexOf(w.charAt(i)) >= 0
    // RV: two leading vowels -> 3; par/col/tap prefix -> 3; else after
    // the first vowel past position 0
    var pV = n
    if (n >= 2 && isV(0) && isV(1)) pV = math.min(3, n)
    else if (Seq("par", "col", "tap").exists(w.startsWith)) pV = 3
    else {
      var i = 1
      while (i < n && !isV(i)) i += 1
      if (i < n) pV = i + 1
    }
    if (pV > n) pV = n
    val (p1, p2) = stdR1R2(w, frV)
    var s = w
    var did = false
    def r2(kk: Int) = s.length - kk >= p2
    def r1(kk: Int) = s.length - kk >= p1
    def rv(kk: Int) = s.length - kk >= pV
    // standard_suffix: free longest + per-case gates
    locally {
      var best: (String, Int) = null
      for (e <- frStd)
        if (s.endsWith(e._1) && (best == null || e._1.length > best._1.length))
          best = e
      if (best != null) {
        val L = best._1.length
        best._2 match {
          case 1 => if (r2(L)) { s = s.dropRight(L); did = true }
          case 2 => if (r2(L)) {
            s = s.dropRight(L); did = true
            if (s.endsWith("ic")) {
              if (r2(2)) s = s.dropRight(2) else s = s.dropRight(2) + "iqU"
            }
          }
          case 3 => if (r2(L)) { s = s.dropRight(L) + "log"; did = true }
          case 4 => if (r2(L)) { s = s.dropRight(L) + "u"; did = true }
          case 5 => if (r2(L)) { s = s.dropRight(L) + "ent"; did = true }
          case 6 => if (rv(L)) {
            s = s.dropRight(L); did = true
            if (s.endsWith("iv") && r2(2)) {
              s = s.dropRight(2)
              if (s.endsWith("at") && r2(2)) s = s.dropRight(2)
            } else if (s.endsWith("eus")) {
              if (r2(3)) s = s.dropRight(3)
              else if (r1(3)) s = s.dropRight(3) + "eux"
            } else if (s.endsWith("abl") && r2(3)) s = s.dropRight(3)
            else if (s.endsWith("iqU") && r2(3)) s = s.dropRight(3)
            else if (s.endsWith("Ièr") && rv(3)) s = s.dropRight(3) + "i"
            else if (s.endsWith("ièr") && rv(3)) s = s.dropRight(3) + "i"
          }
          case 7 => if (r2(L)) {
            s = s.dropRight(L); did = true
            if (s.endsWith("abil")) {
              if (r2(4)) s = s.dropRight(4) else s = s.dropRight(4) + "abl"
            } else if (s.endsWith("ic")) {
              if (r2(2)) s = s.dropRight(2) else s = s.dropRight(2) + "iqU"
            } else if (s.endsWith("iv") && r2(2)) s = s.dropRight(2)
          }
          case 8 => if (r2(L)) {
            s = s.dropRight(L); did = true
            if (s.endsWith("at") && r2(2)) {
              s = s.dropRight(2)
              if (s.endsWith("ic")) {
                if (r2(2)) s = s.dropRight(2) else s = s.dropRight(2) + "iqU"
              }
            }
          }
          case 9 => { s = s.dropRight(L) + "eau"; did = true }
          case 10 => if (r1(L)) { s = s.dropRight(L) + "al"; did = true }
          case 11 =>
            if (r2(L)) { s = s.dropRight(L); did = true }
            else if (r1(L)) { s = s.dropRight(L) + "eux"; did = true }
          case 12 => if (r1(L) && s.length - L - 1 >= 0 &&
            frV.indexOf(s.charAt(s.length - L - 1)) < 0) {
            s = s.dropRight(L); did = true
          }
          // amment/emment/ment(s) rewrite and then FAIL the routine
          // (french.sbl `fail`): the verb suffixes still run on the
          // rewritten stem
          case 13 => if (rv(L)) s = s.dropRight(L) + "ant"
          case 14 => if (rv(L)) s = s.dropRight(L) + "ent"
          case _ => // ment(s): preceded by a vowel in RV
            val j = s.length - L - 1
            if (j >= 0 && frV.indexOf(s.charAt(j)) >= 0 && j >= pV)
              s = s.dropRight(L)
        }
      }
    }
    // i_verb_suffix: RV-limited, preceding non-vowel also inside RV
    if (!did) {
      val best = longestR1(s, pV, frIVerb)
      if (best != null) {
        val j = s.length - best._1.length - 1
        if (j >= pV && frV.indexOf(s.charAt(j)) < 0) {
          s = s.dropRight(best._1.length); did = true
        }
      }
    }
    // verb_suffix: RV-limited
    if (!did) {
      val best = longestR1(s, pV, frVerb)
      if (best != null) {
        best._2 match {
          case 1 => if (r2(best._1.length)) {
            s = s.dropRight(best._1.length); did = true
          }
          case 2 => s = s.dropRight(best._1.length); did = true
          case _ =>
            s = s.dropRight(best._1.length); did = true
            if (s.endsWith("e") && s.length - 1 >= pV) s = s.dropRight(1)
        }
      }
    }
    if (did) {
      // try [Y] -> i or [ç] -> c at the end
      if (s.endsWith("Y")) s = s.dropRight(1) + "i"
      else if (s.endsWith("ç")) s = s.dropRight(1) + "c"
    } else {
      // residual_suffix
      if (s.endsWith("s") && s.length >= 2 &&
        "aiouès".indexOf(s.charAt(s.length - 2)) < 0) s = s.dropRight(1)
      val best = longestR1(s, pV, frResidual)
      if (best != null) best._2 match {
        case 1 =>
          val j = s.length - 4
          if (r2(3) && j >= 0 &&
            (s.charAt(j) == 's' || s.charAt(j) == 't'))
            s = s.dropRight(3)
        case 2 => s = s.dropRight(best._1.length) + "i"
        case 3 => s = s.dropRight(1)
        case _ => if (s.endsWith("guë")) s = s.dropRight(1)
      }
    }
    // un_double: ends ell/eill/enn/onn/ett -> drop the last letter
    if (Seq("ell", "eill", "enn", "onn", "ett").exists(s.endsWith))
      s = s.dropRight(1)
    // un_accent: é/è followed only by 1+ non-vowels at the end -> e
    locally {
      var i2 = s.length - 1
      var cnt = 0
      while (i2 >= 0 && frV.indexOf(s.charAt(i2)) < 0) { i2 -= 1; cnt += 1 }
      if (cnt >= 1 && i2 >= 0 &&
        (s.charAt(i2) == 'é' || s.charAt(i2) == 'è'))
        s = s.substring(0, i2) + "e" + s.substring(i2 + 1)
    }
    // postlude
    s.map {
      case 'I' => 'i'
      case 'U' => 'u'
      case 'Y' => 'y'
      case c => c
    }
  }


  // ------------------------------------------------------------------
  // Finnish (reference ext/FinnishStemmer.java; finnish.sbl).
  // ------------------------------------------------------------------

  private val fiV1 = "aeiouyäö"
  private val fiV2 = "aeiouäö"
  private val fiAEI = "aeiä"
  private val fiParticleEnd = "aeinotuyäö"
  private val fiLong = Array("aa", "ee", "ii", "oo", "uu", "ää", "öö")
  private val fiParticle: Array[(String, Int)] = Array(
    "pa" -> 1, "sti" -> 2, "kaan" -> 1, "han" -> 1, "kin" -> 1,
    "hän" -> 1, "kään" -> 1, "ko" -> 1, "pä" -> 1, "kö" -> 1)
  private val fiPoss: Array[(String, Int)] = Array(
    "nsa" -> 3, "mme" -> 3, "nne" -> 3, "ni" -> 2, "si" -> 1,
    "an" -> 4, "en" -> 6, "än" -> 5, "nsä" -> 3)
  private val fiCase: Array[(String, Int)] = Array(
    "a" -> 8, "lla" -> -1, "na" -> -1, "ssa" -> -1, "ta" -> -1,
    "lta" -> -1, "sta" -> -1, "tta" -> 9, "lle" -> -1, "ine" -> -1,
    "ksi" -> -1, "n" -> 7, "han" -> 1, "den" -> -2, "seen" -> -3,
    "hen" -> 2, "tten" -> -2, "hin" -> 3, "siin" -> -2, "hon" -> 4,
    "hän" -> 5, "hön" -> 6, "ä" -> 8, "llä" -> -1, "nä" -> -1,
    "ssä" -> -1, "tä" -> -1, "ltä" -> -1, "stä" -> -1, "ttä" -> 9)
  private val fiOther: Array[(String, Int)] = Array(
    "eja" -> -1, "mma" -> 1, "imma" -> -1, "mpa" -> 1, "impa" -> -1,
    "mmi" -> 1, "immi" -> -1, "mpi" -> 1, "impi" -> -1, "ejä" -> -1,
    "mmä" -> 1, "immä" -> -1, "mpä" -> 1, "impä" -> -1)

  /** Finnish Snowball (reference ext/FinnishStemmer.java:30-1100;
    * finnish.sbl): particle, possessive (with the kse->ksi restore),
    * case endings (h-harmony vowels, the n + LONG/ie extra vowel, the
    * cons+vowel gate on a/ä), comparative other-endings ('po' guard),
    * i/t plural keyed on the case-ending flag, and the tidy pass (LONG
    * shorten, AEI after consonant, oj/uj/jo, final consonant
    * undoubling). R1-limited matching throughout; den/tten (-2) carry
    * no extra gate, seen/siin (-3) require the long-vowel VI test. */
  def finnish(w: String): String = {
    val n = w.length
    def isV1(c: Char) = fiV1.indexOf(c) >= 0
    // p1/p2 over V1
    var i = 0
    var p1 = n
    var p2 = n
    while (i < n && !isV1(w.charAt(i))) i += 1
    if (i < n) {
      i += 1
      while (i < n && isV1(w.charAt(i))) i += 1
      if (i < n) {
        i += 1; p1 = i
        while (i < n && !isV1(w.charAt(i))) i += 1
        if (i < n) {
          i += 1
          while (i < n && isV1(w.charAt(i))) i += 1
          if (i < n) { i += 1; p2 = i }
        }
      }
    }
    var s = w
    def endsLong(p: Int): Boolean =
      fiLong.exists(lv => s.endsWith(lv) && s.length - 2 >= p)
    // particle_etc (R1-limited)
    locally {
      val best = longestR1(s, p1, fiParticle)
      if (best != null) {
        val j = s.length - best._1.length - 1
        if (best._2 == 1) {
          if (j >= 0 && fiParticleEnd.indexOf(s.charAt(j)) >= 0)
            s = s.dropRight(best._1.length)
        } else if (s.length - best._1.length >= p2)
          s = s.dropRight(best._1.length)
      }
    }
    // possessive (R1-limited)
    locally {
      val best = longestR1(s, p1, fiPoss)
      if (best != null) {
        val L = best._1.length
        val j = s.length - L - 1
        best._2 match {
          case 1 => // si: not preceded by k
            if (!(j >= 0 && s.charAt(j) == 'k')) s = s.dropRight(L)
          case 2 =>
            s = s.dropRight(L)
            if (s.endsWith("kse")) s = s.dropRight(1) + "i"
          case 3 => s = s.dropRight(L)
          case 4 =>
            if (Seq("ta", "ssa", "sta", "lla", "lta", "na").exists(x =>
              s.length - L >= x.length &&
                s.regionMatches(s.length - L - x.length, x, 0, x.length)))
              s = s.dropRight(L)
          case 5 =>
            if (Seq("tä", "ssä", "stä", "llä", "ltä", "nä").exists(x =>
              s.length - L >= x.length &&
                s.regionMatches(s.length - L - x.length, x, 0, x.length)))
              s = s.dropRight(L)
          case _ =>
            if (Seq("lle", "ine").exists(x =>
              s.length - L >= x.length &&
                s.regionMatches(s.length - L - x.length, x, 0, x.length)))
              s = s.dropRight(L)
        }
      }
    }
    // case_ending (R1-limited); sets endingRemoved
    var endingRemoved = false
    locally {
      val best = longestR1(s, p1, fiCase)
      if (best != null) {
        val L = best._1.length
        val j = s.length - L - 1
        def harmony(v: Char): Unit =
          if (j >= 0 && s.charAt(j) == v) {
            s = s.dropRight(L); endingRemoved = true
          }
        best._2 match {
          case 1 => harmony('a')
          case 2 => harmony('e')
          case 3 => harmony('i')
          case 4 => harmony('o')
          case 5 => harmony('ä')
          case 6 => harmony('ö')
          case 7 => // n: delete, then LONG or "ie" drops one more char
            s = s.dropRight(1); endingRemoved = true
            if (fiLong.exists(s.endsWith) || s.endsWith("ie"))
              s = s.dropRight(1)
          case 8 => // a/ä preceded by (consonant, vowel)
            if (j >= 1 && isV1(s.charAt(j)) &&
              !isV1(s.charAt(j - 1))) {
              s = s.dropRight(L); endingRemoved = true
            }
          case 9 => // tta/ttä preceded by e
            if (j >= 0 && s.charAt(j) == 'e') {
              s = s.dropRight(L); endingRemoved = true
            }
          case -2 => // den/tten/siin: VI gate ('i' after a V2 vowel),
            // else find_among_b falls back to the parent entry "n"
            if (j >= p1 && s.charAt(j) == 'i' && j - 1 >= p1 &&
              fiV2.indexOf(s.charAt(j - 1)) >= 0) {
              s = s.dropRight(L); endingRemoved = true
            } else {
              s = s.dropRight(1); endingRemoved = true // parent "n"
              if (fiLong.exists(s.endsWith) || s.endsWith("ie"))
                s = s.dropRight(1)
            }
          case -3 => // seen: LONG gate, else fall back to "n"
            if (s.length - L - 2 >= p1 &&
              fiLong.exists(lv => s.regionMatches(s.length - L - 2, lv, 0, 2))) {
              s = s.dropRight(L); endingRemoved = true
            } else {
              s = s.dropRight(1); endingRemoved = true // parent "n"
              if (fiLong.exists(s.endsWith) || s.endsWith("ie"))
                s = s.dropRight(1)
            }
          case _ => s = s.dropRight(L); endingRemoved = true
        }
      }
    }
    // other_endings (R2-limited)
    locally {
      val best = longestR1(s, p2, fiOther)
      if (best != null) {
        val L = best._1.length
        if (best._2 == 1) {
          if (!(s.length - L >= 2 &&
            s.regionMatches(s.length - L - 2, "po", 0, 2)))
            s = s.dropRight(L)
        } else s = s.dropRight(L)
      }
    }
    // i_plural when a case ending was removed; else t_plural
    if (endingRemoved) {
      if ((s.endsWith("i") || s.endsWith("j")) && s.length - 1 >= p1)
        s = s.dropRight(1)
    } else {
      if (s.endsWith("t") && s.length - 1 >= p1 &&
        s.length >= 2 && isV1(s.charAt(s.length - 2)) &&
        s.length - 2 >= p1) {
        s = s.dropRight(1)
        val best = longestR1(s, p2, Array("mma" -> 1, "imma" -> -1))
        if (best != null) {
          if (best._2 == 1) {
            if (!(s.length - 3 >= 2 &&
              s.regionMatches(s.length - 5, "po", 0, 2)))
              s = s.dropRight(3)
          } else s = s.dropRight(4)
        }
      }
    }
    // tidy (R1-limited parts)
    if (endsLong(p1)) s = s.dropRight(1)
    if (s.nonEmpty && fiAEI.indexOf(s.last) >= 0 && s.length - 1 >= p1 &&
      s.length >= 2 && !isV1(s.charAt(s.length - 2)) &&
      s.length - 2 >= p1) s = s.dropRight(1)
    if (s.endsWith("oj") || s.endsWith("uj")) {
      if (s.length - 1 >= p1 && s.length - 2 >= p1) s = s.dropRight(1)
    }
    if (s.endsWith("jo") && s.length - 1 >= p1 && s.length - 2 >= p1)
      s = s.dropRight(1)
    // final undouble: last consonant after trailing vowels, doubled
    locally {
      var k = s.length - 1
      while (k >= 0 && isV1(s.charAt(k))) k -= 1
      if (k >= 1 && s.charAt(k - 1) == s.charAt(k))
        s = s.substring(0, k) + s.substring(k + 1)
    }
    s
  }

}
