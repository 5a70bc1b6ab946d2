package graft.analysis

import java.util.Locale

/** Snowball stemmers for Armenian, Basque and Catalan — the remaining
  * reference analyzers that delegate to org.tartarus generated code
  * (reference `hy/ArmenianAnalyzer.java:56` -> `ext/ArmenianStemmer.java`,
  * `eu/BasqueAnalyzer.java:54` -> `ext/BasqueStemmer.java`,
  * `ca/CatalanAnalyzer.java:61` -> `ext/CatalanStemmer.java`).
  *
  * Fresh Scala implementations of the published Snowball algorithms
  * (snowballstem.org). The suffix tables carry the published scripts'
  * (suffix, action) rows; the control flow is direct string code rather
  * than a generated cursor machine. Semantics carried over exactly:
  *
  *   - `find_among_b` longest-match-THEN-gate: the longest matching
  *     suffix is found first and its region condition checked second —
  *     a gate failure fails the whole rule with no shorter-suffix retry.
  *   - Basque/Catalan `repeat`: after a successful delete or rewrite the
  *     cursor rests at the match start and matching continues against
  *     the remaining prefix (the `end` parameter below); region marks
  *     stay absolute, exactly like SnowballProgram's I_p* fields.
  *   - Armenian `setlimit tomark pV`: suffixes may not extend left of
  *     pV (the `bound` parameter), and a word with no vowel is returned
  *     unchanged (the `tomark` fails).
  */
object SnowballStemmers2 {

  /** Longest (start, action) of a table suffix of w[0..end) whose match
    * start is >= bound, or null if none matches. */
  private def longestB(w: String, end: Int, bound: Int,
                       tbl: Array[(String, Int)]): (Int, Int) = {
    var bestLen = -1
    var bestCode = 0
    var i = 0
    while (i < tbl.length) {
      val s = tbl(i)._1
      val st = end - s.length
      if (s.length > bestLen && st >= bound &&
          w.regionMatches(st, s, 0, s.length)) {
        bestLen = s.length; bestCode = tbl(i)._2
      }
      i += 1
    }
    if (bestLen < 0) null else (end - bestLen, bestCode)
  }

  // ------------------------------------------------------------------
  // Armenian (reference ext/ArmenianStemmer.java; published armenian
  // script by Astghik Mkrtchyan)
  // ------------------------------------------------------------------

  /** Armenian vowels (the g_v bitmap over U+0561..U+0585). */
  private val hyV: Set[Char] =
    "աեէըիուօ".toSet

  /** pV = just past the first vowel; p2 = just past the second
    * vowel-then-consonant transition (armenian.sbl mark_regions). */
  private def hyMarks(w: String): (Int, Int) = {
    val n = w.length
    var i = 0
    // gopast semantics: skip to the first char in the class, consume it
    def goPast(inClass: Boolean): Boolean = {
      while (i < n && hyV(w(i)) != inClass) i += 1
      if (i >= n) false else { i += 1; true }
    }
    var pV = n
    var p2 = n
    if (goPast(true)) {
      pV = i
      if (goPast(false) && goPast(true) && goPast(false)) p2 = i
    }
    (pV, p2)
  }

  /** Armenian Snowball stemmer (lowercases first; the reference chain
    * runs LowerCaseFilter before SnowballFilter). Four independent
    * longest-match suffix deletions bounded by pV: ending (R2-gated),
    * verb, adjective, noun — ArmenianStemmer.java stem(). */
  def armenian(word: String): String = {
    var w = word.toLowerCase(Locale.ROOT)
    val (pV, p2) = hyMarks(w)
    def strip(tbl: Array[(String, Int)], gate: Int): Unit = {
      val m = longestB(w, w.length, pV, tbl)
      if (m != null && m._1 >= gate) w = w.substring(0, m._1)
    }
    strip(hy3, p2) // ending (R2)
    strip(hy1, 0)  // verb
    strip(hy0, 0)  // adjective
    strip(hy2, 0)  // noun
    w
  }

  // ------------------------------------------------------------------
  // Basque (reference ext/BasqueStemmer.java; published basque.sbl)
  // ------------------------------------------------------------------

  private val euV: Set[Char] = "aeiou".toSet

  /** The Romance RV rule (basque.sbl mark_regions, identical shape to
    * spanish.sbl): vowel+consonant start -> past the next vowel;
    * vowel+vowel -> past the next consonant; consonant+consonant ->
    * past the next vowel; consonant+vowel -> after the third letter;
    * end of word when the landmark is missing. */
  private def romanceRV(w: String, isV: Char => Boolean): Int = {
    val n = w.length
    if (n < 2) return n
    def past(from: Int, inClass: Boolean): Int = {
      var i = from
      while (i < n && isV(w(i)) != inClass) i += 1
      if (i >= n) n else i + 1
    }
    if (isV(w(0))) {
      if (!isV(w(1))) past(2, true) else past(2, false)
    } else {
      if (!isV(w(1))) past(2, true)
      else if (n >= 3) 3
      else n
    }
  }

  /** Standard R1/R2 pair over a vowel class. */
  private def r1r2(w: String, isV: Char => Boolean): (Int, Int) = {
    val n = w.length
    var i = 0
    def goPast(inClass: Boolean): Boolean = {
      while (i < n && isV(w(i)) != inClass) i += 1
      if (i >= n) false else { i += 1; true }
    }
    var p1 = n
    var p2 = n
    if (goPast(true) && goPast(false)) {
      p1 = i
      if (goPast(true) && goPast(false)) p2 = i
    }
    (p1, p2)
  }

  /** Basque Snowball stemmer (lowercases first): repeat aditzak (verb
    * suffixes), repeat izenak (noun suffixes), then adjetiboak once —
    * BasqueStemmer.java stem(). Region marks are absolute; `end` is
    * the backward cursor. */
  def basque(word: String): String = {
    var w = word.toLowerCase(Locale.ROOT)
    val pV = romanceRV(w, euV)
    val (p1, p2) = r1r2(w, euV)
    var end = w.length

    // one aditzak step; returns true if the rule applied
    def aditzak(): Boolean = {
      val m = longestB(w, end, 0, eu0)
      if (m == null) return false
      val (st, code) = m
      code match {
        case 1 => if (st < pV) return false
          w = w.substring(0, st) + w.substring(end)
        case 2 => if (st < p2) return false
          w = w.substring(0, st) + w.substring(end)
        case 3 => w = w.substring(0, st) + "atseden" + w.substring(end)
        case 4 => w = w.substring(0, st) + "arabera" + w.substring(end)
        case 5 => w = w.substring(0, st) + "baditu" + w.substring(end)
      }
      end = st
      true
    }
    def izenak(): Boolean = {
      val m = longestB(w, end, 0, eu1)
      if (m == null) return false
      val (st, code) = m
      def repl(s: String): Unit = {
        w = w.substring(0, st) + s + w.substring(end)
      }
      code match {
        case 1 => if (st < pV) return false; repl("")
        case 2 => if (st < p2) return false; repl("")
        case 3 => repl("jok")
        case 4 => if (st < p1) return false; repl("")
        case 5 => repl("tra")
        case 6 => repl("minutu")
        case 7 => repl("zehar")
        case 8 => repl("geldi")
        case 9 => repl("igaro")
        case 10 => repl("aurka")
      }
      end = st
      true
    }
    def adjetiboak(): Boolean = {
      val m = longestB(w, end, 0, eu2)
      if (m == null) return false
      val (st, code) = m
      code match {
        case 1 => if (st < pV) return false
          w = w.substring(0, st) + w.substring(end)
        case 2 => w = w.substring(0, st) + "z" + w.substring(end)
      }
      end = st
      true
    }

    while (aditzak()) {}
    while (izenak()) {}
    adjetiboak()
    w
  }

  // ------------------------------------------------------------------
  // Catalan (reference ext/CatalanStemmer.java; published catalan
  // script by Israel Olalla)
  // ------------------------------------------------------------------

  private val caV: Set[Char] =
    "aeiouàáèéíïòóúü".toSet

  /** Catalan Snowball stemmer (lowercases first): attached_pronoun,
    * then standard_suffix OR verb_suffix, then residual_suffix — each
    * against the full current word — then the forward cleaning pass
    * (accent folding) — CatalanStemmer.java stem(). */
  def catalan(word: String): String = {
    var w = word.toLowerCase(Locale.ROOT)
    val (p1, p2) = r1r2(w, caV)

    // attached_pronoun: R1-gated delete
    val pron = longestB(w, w.length, 0, ca1)
    if (pron != null && pron._1 >= p1) w = w.substring(0, pron._1)

    // standard_suffix: delete/rewrite gated per action row
    def standard(): Boolean = {
      val m = longestB(w, w.length, 0, ca2)
      if (m == null) return false
      val (st, code) = m
      code match {
        case 1 => if (st < p1) return false; w = w.substring(0, st)
        case 2 => if (st < p2) return false; w = w.substring(0, st)
        case 3 => if (st < p2) return false; w = w.substring(0, st) + "log"
        case 4 => if (st < p2) return false; w = w.substring(0, st) + "ic"
        case 5 => if (st < p1) return false; w = w.substring(0, st) + "c"
      }
      true
    }
    // verb_suffix: R1/R2-gated delete
    def verb(): Boolean = {
      val m = longestB(w, w.length, 0, ca3)
      if (m == null) return false
      val (st, code) = m
      code match {
        case 1 => if (st < p1) return false; w = w.substring(0, st)
        case 2 => if (st < p2) return false; w = w.substring(0, st)
      }
      true
    }
    if (!standard()) verb()

    // residual_suffix
    val res = longestB(w, w.length, 0, ca4)
    if (res != null) {
      val (st, code) = res
      if (code == 1) { if (st >= p1) w = w.substring(0, st) }
      else if (st >= p1) w = w.substring(0, st) + "ic" // iqu -> ic
    }

    // cleaning: fold accents, interpunct -> '.' (forward repeat over
    // single chars, CatalanStemmer.java r_cleaning)
    w.map {
      case 'à' | 'á' => 'a'
      case 'è' | 'é' => 'e'
      case 'ì' | 'í' | 'ï' => 'i'
      case 'ò' | 'ó' => 'o'
      case 'ú' | 'ü' => 'u'
      case '·' => '.'
      case c => c
    }
  }

  /** ArmenianStemmer.java a_0 (23 entries). */
  private val hy0: Array[(String, Int)] = Array(
    ("\u0580\u0578\u0580\u0564", 1), ("\u0565\u0580\u0578\u0580\u0564", 1),
    ("\u0561\u056C\u056B", 1), ("\u0561\u056F\u056B", 1),
    ("\u0578\u0580\u0561\u056F", 1), ("\u0565\u0572", 1),
    ("\u0561\u056F\u0561\u0576", 1), ("\u0561\u0580\u0561\u0576", 1),
    ("\u0565\u0576", 1), ("\u0565\u056F\u0565\u0576", 1),
    ("\u0565\u0580\u0565\u0576", 1), ("\u0578\u0580\u0567\u0576", 1),
    ("\u056B\u0576", 1), ("\u0563\u056B\u0576", 1),
    ("\u0578\u057E\u056B\u0576", 1), ("\u056C\u0561\u0575\u0576", 1),
    ("\u057E\u0578\u0582\u0576", 1), ("\u057A\u0565\u057D", 1),
    ("\u056B\u057E", 1), ("\u0561\u057F", 1),
    ("\u0561\u057E\u0565\u057F", 1), ("\u056F\u0578\u057F", 1),
    ("\u0562\u0561\u0580", 1)
  )

  /** ArmenianStemmer.java a_1 (71 entries). */
  private val hy1: Array[(String, Int)] = Array(
    ("\u0561", 1), ("\u0561\u0581\u0561", 1), ("\u0565\u0581\u0561", 1),
    ("\u057E\u0565", 1), ("\u0561\u0581\u0580\u056B", 1),
    ("\u0561\u0581\u056B", 1), ("\u0565\u0581\u056B", 1),
    ("\u057E\u0565\u0581\u056B", 1), ("\u0561\u056C", 1),
    ("\u0568\u0561\u056C", 1), ("\u0561\u0576\u0561\u056C", 1),
    ("\u0565\u0576\u0561\u056C", 1), ("\u0561\u0581\u0576\u0561\u056C", 1),
    ("\u0565\u056C", 1), ("\u0568\u0565\u056C", 1),
    ("\u0576\u0565\u056C", 1), ("\u0581\u0576\u0565\u056C", 1),
    ("\u0565\u0581\u0576\u0565\u056C", 1), ("\u0579\u0565\u056C", 1),
    ("\u057E\u0565\u056C", 1), ("\u0561\u0581\u057E\u0565\u056C", 1),
    ("\u0565\u0581\u057E\u0565\u056C", 1), ("\u057F\u0565\u056C", 1),
    ("\u0561\u057F\u0565\u056C", 1), ("\u0578\u057F\u0565\u056C", 1),
    ("\u056F\u0578\u057F\u0565\u056C", 1), ("\u057E\u0561\u056E", 1),
    ("\u0578\u0582\u0574", 1), ("\u057E\u0578\u0582\u0574", 1),
    ("\u0561\u0576", 1), ("\u0581\u0561\u0576", 1),
    ("\u0561\u0581\u0561\u0576", 1), ("\u0561\u0581\u0580\u056B\u0576", 1),
    ("\u0561\u0581\u056B\u0576", 1), ("\u0565\u0581\u056B\u0576", 1),
    ("\u057E\u0565\u0581\u056B\u0576", 1), ("\u0561\u056C\u056B\u057D", 1),
    ("\u0565\u056C\u056B\u057D", 1), ("\u0561\u057E", 1),
    ("\u0561\u0581\u0561\u057E", 1), ("\u0565\u0581\u0561\u057E", 1),
    ("\u0561\u056C\u0578\u057E", 1), ("\u0565\u056C\u0578\u057E", 1),
    ("\u0561\u0580", 1), ("\u0561\u0581\u0561\u0580", 1),
    ("\u0565\u0581\u0561\u0580", 1), ("\u0561\u0581\u0580\u056B\u0580", 1),
    ("\u0561\u0581\u056B\u0580", 1), ("\u0565\u0581\u056B\u0580", 1),
    ("\u057E\u0565\u0581\u056B\u0580", 1), ("\u0561\u0581", 1),
    ("\u0565\u0581", 1), ("\u0561\u0581\u0580\u0565\u0581", 1),
    ("\u0561\u056C\u0578\u0582\u0581", 1),
    ("\u0565\u056C\u0578\u0582\u0581", 1), ("\u0561\u056C\u0578\u0582", 1),
    ("\u0565\u056C\u0578\u0582", 1), ("\u0561\u0584", 1),
    ("\u0581\u0561\u0584", 1), ("\u0561\u0581\u0561\u0584", 1),
    ("\u0561\u0581\u0580\u056B\u0584", 1), ("\u0561\u0581\u056B\u0584", 1),
    ("\u0565\u0581\u056B\u0584", 1), ("\u057E\u0565\u0581\u056B\u0584", 1),
    ("\u0561\u0576\u0584", 1), ("\u0581\u0561\u0576\u0584", 1),
    ("\u0561\u0581\u0561\u0576\u0584", 1),
    ("\u0561\u0581\u0580\u056B\u0576\u0584", 1),
    ("\u0561\u0581\u056B\u0576\u0584", 1),
    ("\u0565\u0581\u056B\u0576\u0584", 1),
    ("\u057E\u0565\u0581\u056B\u0576\u0584", 1)
  )

  /** ArmenianStemmer.java a_2 (40 entries). */
  private val hy2: Array[(String, Int)] = Array(
    ("\u0578\u0580\u0564", 1), ("\u0578\u0582\u0575\u0569", 1),
    ("\u0578\u0582\u0570\u056B", 1), ("\u0581\u056B", 1),
    ("\u056B\u056C", 1), ("\u0561\u056F", 1), ("\u0575\u0561\u056F", 1),
    ("\u0561\u0576\u0561\u056F", 1), ("\u056B\u056F", 1),
    ("\u0578\u0582\u056F", 1), ("\u0561\u0576", 1),
    ("\u057A\u0561\u0576", 1), ("\u057D\u057F\u0561\u0576", 1),
    ("\u0561\u0580\u0561\u0576", 1), ("\u0565\u0572\u0567\u0576", 1),
    ("\u0575\u0578\u0582\u0576", 1),
    ("\u0578\u0582\u0569\u0575\u0578\u0582\u0576", 1),
    ("\u0561\u056E\u0578", 1), ("\u056B\u0579", 1),
    ("\u0578\u0582\u057D", 1), ("\u0578\u0582\u057D\u057F", 1),
    ("\u0563\u0561\u0580", 1), ("\u057E\u0578\u0580", 1),
    ("\u0561\u057E\u0578\u0580", 1), ("\u0578\u0581", 1),
    ("\u0561\u0576\u0585\u0581", 1), ("\u0578\u0582", 1), ("\u0584", 1),
    ("\u0579\u0565\u0584", 1), ("\u056B\u0584", 1),
    ("\u0561\u056C\u056B\u0584", 1), ("\u0561\u0576\u056B\u0584", 1),
    ("\u057E\u0561\u056E\u0584", 1), ("\u0578\u0582\u0575\u0584", 1),
    ("\u0565\u0576\u0584", 1), ("\u0578\u0576\u0584", 1),
    ("\u0578\u0582\u0576\u0584", 1), ("\u0574\u0578\u0582\u0576\u0584", 1),
    ("\u056B\u0579\u0584", 1), ("\u0561\u0580\u0584", 1)
  )

  /** ArmenianStemmer.java a_3 (57 entries). */
  private val hy3: Array[(String, Int)] = Array(
    ("\u057D\u0561", 1), ("\u057E\u0561", 1), ("\u0561\u0574\u0562", 1),
    ("\u0564", 1), ("\u0561\u0576\u0564", 1),
    ("\u0578\u0582\u0569\u0575\u0561\u0576\u0564", 1),
    ("\u057E\u0561\u0576\u0564", 1), ("\u0578\u057B\u0564", 1),
    ("\u0565\u0580\u0564", 1), ("\u0576\u0565\u0580\u0564", 1),
    ("\u0578\u0582\u0564", 1), ("\u0568", 1), ("\u0561\u0576\u0568", 1),
    ("\u0578\u0582\u0569\u0575\u0561\u0576\u0568", 1),
    ("\u057E\u0561\u0576\u0568", 1), ("\u0578\u057B\u0568", 1),
    ("\u0565\u0580\u0568", 1), ("\u0576\u0565\u0580\u0568", 1),
    ("\u056B", 1), ("\u057E\u056B", 1), ("\u0565\u0580\u056B", 1),
    ("\u0576\u0565\u0580\u056B", 1), ("\u0561\u0576\u0578\u0582\u0574", 1),
    ("\u0565\u0580\u0578\u0582\u0574", 1),
    ("\u0576\u0565\u0580\u0578\u0582\u0574", 1), ("\u0576", 1),
    ("\u0561\u0576", 1), ("\u0578\u0582\u0569\u0575\u0561\u0576", 1),
    ("\u057E\u0561\u0576", 1), ("\u056B\u0576", 1),
    ("\u0565\u0580\u056B\u0576", 1), ("\u0576\u0565\u0580\u056B\u0576", 1),
    ("\u0578\u0582\u0569\u0575\u0561\u0576\u0576", 1),
    ("\u0565\u0580\u0576", 1), ("\u0576\u0565\u0580\u0576", 1),
    ("\u0578\u0582\u0576", 1), ("\u0578\u057B", 1),
    ("\u0578\u0582\u0569\u0575\u0561\u0576\u057D", 1),
    ("\u057E\u0561\u0576\u057D", 1), ("\u0578\u057B\u057D", 1),
    ("\u0578\u057E", 1), ("\u0561\u0576\u0578\u057E", 1),
    ("\u057E\u0578\u057E", 1), ("\u0565\u0580\u0578\u057E", 1),
    ("\u0576\u0565\u0580\u0578\u057E", 1), ("\u0565\u0580", 1),
    ("\u0576\u0565\u0580", 1), ("\u0581", 1), ("\u056B\u0581", 1),
    ("\u057E\u0561\u0576\u056B\u0581", 1), ("\u0578\u057B\u056B\u0581", 1),
    ("\u057E\u056B\u0581", 1), ("\u0565\u0580\u056B\u0581", 1),
    ("\u0576\u0565\u0580\u056B\u0581", 1), ("\u0581\u056B\u0581", 1),
    ("\u0578\u0581", 1), ("\u0578\u0582\u0581", 1)
  )

  /** BasqueStemmer.java a_0 (109 entries). */
  private val eu0: Array[(String, Int)] = Array(
    ("idea", 1), ("bidea", 1), ("kidea", 1), ("pidea", 1), ("kundea", 1),
    ("galea", 1), ("tailea", 1), ("tzailea", 1), ("gunea", 1), ("kunea", 1),
    ("tzaga", 1), ("gaia", 1), ("aldia", 1), ("taldia", 1), ("karia", 1),
    ("garria", 2), ("karria", 1), ("ka", 1), ("tzaka", 1), ("la", 1),
    ("mena", 1), ("pena", 1), ("kina", 1), ("ezina", 1), ("tezina", 1),
    ("kuna", 1), ("tuna", 1), ("kizuna", 1), ("era", 1), ("bera", 1),
    ("arabera", 4), ("kera", 1), ("pera", 1), ("orra", 1), ("korra", 1),
    ("dura", 1), ("gura", 1), ("kura", 1), ("tura", 1), ("eta", 1),
    ("keta", 1), ("gailua", 1), ("eza", 1), ("erreza", 1), ("tza", 2),
    ("gaitza", 1), ("kaitza", 1), ("kuntza", 1), ("ide", 1), ("bide", 1),
    ("kide", 1), ("pide", 1), ("kunde", 1), ("tzake", 1), ("tzeke", 1),
    ("le", 1), ("gale", 1), ("taile", 1), ("tzaile", 1), ("gune", 1),
    ("kune", 1), ("tze", 1), ("atze", 1), ("gai", 1), ("aldi", 1),
    ("taldi", 1), ("ki", 1), ("ari", 1), ("kari", 1), ("lari", 1),
    ("tari", 1), ("etari", 1), ("garri", 2), ("karri", 1), ("arazi", 1),
    ("tarazi", 1), ("an", 1), ("ean", 1), ("rean", 1), ("kan", 1),
    ("etan", 1), ("atseden", 3), ("men", 1), ("pen", 1), ("kin", 1),
    ("rekin", 1), ("ezin", 1), ("tezin", 1), ("tun", 1), ("kizun", 1),
    ("go", 1), ("ago", 1), ("tio", 1), ("dako", 1), ("or", 1), ("kor", 1),
    ("tzat", 1), ("du", 1), ("gailu", 1), ("tu", 1), ("atu", 1),
    ("aldatu", 1), ("tatu", 1), ("baditu", 5), ("ez", 1), ("errez", 1),
    ("tzez", 1), ("gaitz", 1), ("kaitz", 1)
  )

  /** BasqueStemmer.java a_1 (295 entries). */
  private val eu1: Array[(String, Int)] = Array(
    ("ada", 1), ("kada", 1), ("anda", 1), ("denda", 1), ("gabea", 1),
    ("kabea", 1), ("aldea", 1), ("kaldea", 1), ("taldea", 1), ("ordea", 1),
    ("zalea", 1), ("tzalea", 1), ("gilea", 1), ("emea", 1), ("kumea", 1),
    ("nea", 1), ("enea", 1), ("zionea", 1), ("unea", 1), ("gunea", 1),
    ("pea", 1), ("aurrea", 1), ("tea", 1), ("kotea", 1), ("artea", 1),
    ("ostea", 1), ("etxea", 1), ("ga", 1), ("anga", 1), ("gaia", 1),
    ("aldia", 1), ("taldia", 1), ("handia", 1), ("mendia", 1), ("geia", 1),
    ("egia", 1), ("degia", 1), ("tegia", 1), ("nahia", 1), ("ohia", 1),
    ("kia", 1), ("tokia", 1), ("oia", 1), ("koia", 1), ("aria", 1),
    ("karia", 1), ("laria", 1), ("taria", 1), ("eria", 1), ("keria", 1),
    ("teria", 1), ("garria", 2), ("larria", 1), ("kirria", 1), ("duria", 1),
    ("asia", 1), ("tia", 1), ("ezia", 1), ("bizia", 1), ("ontzia", 1),
    ("ka", 1), ("joka", 3), ("aurka", 10), ("ska", 1), ("xka", 1),
    ("zka", 1), ("gibela", 1), ("gela", 1), ("kaila", 1), ("skila", 1),
    ("tila", 1), ("ola", 1), ("na", 1), ("kana", 1), ("ena", 1),
    ("garrena", 1), ("gerrena", 1), ("urrena", 1), ("zaina", 1),
    ("tzaina", 1), ("kina", 1), ("mina", 1), ("garna", 1), ("una", 1),
    ("duna", 1), ("asuna", 1), ("tasuna", 1), ("ondoa", 1), ("kondoa", 1),
    ("ngoa", 1), ("zioa", 1), ("koa", 1), ("takoa", 1), ("zkoa", 1),
    ("noa", 1), ("zinoa", 1), ("aroa", 1), ("taroa", 1), ("zaroa", 1),
    ("eroa", 1), ("oroa", 1), ("osoa", 1), ("toa", 1), ("ttoa", 1),
    ("ztoa", 1), ("txoa", 1), ("tzoa", 1), ("\u00F1oa", 1), ("ra", 1),
    ("ara", 1), ("dara", 1), ("liara", 1), ("tiara", 1), ("tara", 1),
    ("etara", 1), ("tzara", 1), ("bera", 1), ("kera", 1), ("pera", 1),
    ("ora", 2), ("tzarra", 1), ("korra", 1), ("tra", 1), ("sa", 1),
    ("osa", 1), ("ta", 1), ("eta", 1), ("keta", 1), ("sta", 1), ("dua", 1),
    ("mendua", 1), ("ordua", 1), ("lekua", 1), ("burua", 1), ("durua", 1),
    ("tsua", 1), ("tua", 1), ("mentua", 1), ("estua", 1), ("txua", 1),
    ("zua", 1), ("tzua", 1), ("za", 1), ("eza", 1), ("eroza", 1), ("tza", 2),
    ("koitza", 1), ("antza", 1), ("gintza", 1), ("kintza", 1), ("kuntza", 1),
    ("gabe", 1), ("kabe", 1), ("kide", 1), ("alde", 1), ("kalde", 1),
    ("talde", 1), ("orde", 1), ("ge", 1), ("zale", 1), ("tzale", 1),
    ("gile", 1), ("eme", 1), ("kume", 1), ("ne", 1), ("zione", 1),
    ("une", 1), ("gune", 1), ("pe", 1), ("aurre", 1), ("te", 1), ("kote", 1),
    ("arte", 1), ("oste", 1), ("etxe", 1), ("gai", 1), ("di", 1),
    ("aldi", 1), ("taldi", 1), ("geldi", 8), ("handi", 1), ("mendi", 1),
    ("gei", 1), ("egi", 1), ("degi", 1), ("tegi", 1), ("nahi", 1),
    ("ohi", 1), ("ki", 1), ("toki", 1), ("oi", 1), ("goi", 1), ("koi", 1),
    ("ari", 1), ("kari", 1), ("lari", 1), ("tari", 1), ("garri", 2),
    ("larri", 1), ("kirri", 1), ("duri", 1), ("asi", 1), ("ti", 1),
    ("ontzi", 1), ("\u00F1i", 1), ("ak", 1), ("ek", 1), ("tarik", 1),
    ("gibel", 1), ("ail", 1), ("kail", 1), ("kan", 1), ("tan", 1),
    ("etan", 1), ("en", 4), ("ren", 2), ("garren", 1), ("gerren", 1),
    ("urren", 1), ("ten", 4), ("tzen", 4), ("zain", 1), ("tzain", 1),
    ("kin", 1), ("min", 1), ("dun", 1), ("asun", 1), ("tasun", 1),
    ("aizun", 1), ("ondo", 1), ("kondo", 1), ("go", 1), ("ngo", 1),
    ("zio", 1), ("ko", 1), ("trako", 5), ("tako", 1), ("etako", 1),
    ("eko", 1), ("tariko", 1), ("sko", 1), ("tuko", 1), ("minutuko", 6),
    ("zko", 1), ("no", 1), ("zino", 1), ("ro", 1), ("aro", 1), ("igaro", 9),
    ("taro", 1), ("zaro", 1), ("ero", 1), ("giro", 1), ("oro", 1),
    ("oso", 1), ("to", 1), ("tto", 1), ("zto", 1), ("txo", 1), ("tzo", 1),
    ("gintzo", 1), ("\u00F1o", 1), ("zp", 1), ("ar", 1), ("dar", 1),
    ("behar", 1), ("zehar", 7), ("liar", 1), ("tiar", 1), ("tar", 1),
    ("tzar", 1), ("or", 2), ("kor", 1), ("os", 1), ("ket", 1), ("du", 1),
    ("mendu", 1), ("ordu", 1), ("leku", 1), ("buru", 2), ("duru", 1),
    ("tsu", 1), ("tu", 1), ("tatu", 4), ("mentu", 1), ("estu", 1),
    ("txu", 1), ("zu", 1), ("tzu", 1), ("gintzu", 1), ("z", 1), ("ez", 1),
    ("eroz", 1), ("tz", 1), ("koitz", 1)
  )

  /** BasqueStemmer.java a_2 (19 entries). */
  private val eu2: Array[(String, Int)] = Array(
    ("zlea", 2), ("keria", 1), ("la", 1), ("era", 1), ("dade", 1),
    ("tade", 1), ("date", 1), ("tate", 1), ("gi", 1), ("ki", 1), ("ik", 1),
    ("lanik", 1), ("rik", 1), ("larik", 1), ("ztik", 1), ("go", 1),
    ("ro", 1), ("ero", 1), ("to", 1)
  )

  /** CatalanStemmer.java a_1 (39 entries). */
  private val ca1: Array[(String, Int)] = Array(
    ("la", 1), ("-la", 1), ("sela", 1), ("le", 1), ("me", 1), ("-me", 1),
    ("se", 1), ("-te", 1), ("hi", 1), ("'hi", 1), ("li", 1), ("-li", 1),
    ("'l", 1), ("'m", 1), ("-m", 1), ("'n", 1), ("-n", 1), ("ho", 1),
    ("'ho", 1), ("lo", 1), ("selo", 1), ("'s", 1), ("las", 1), ("selas", 1),
    ("les", 1), ("-les", 1), ("'ls", 1), ("-ls", 1), ("'ns", 1), ("-ns", 1),
    ("ens", 1), ("los", 1), ("selos", 1), ("nos", 1), ("-nos", 1),
    ("vos", 1), ("us", 1), ("-us", 1), ("'t", 1)
  )

  /** CatalanStemmer.java a_2 (200 entries). */
  private val ca2: Array[(String, Int)] = Array(
    ("ica", 4), ("l\u00F3gica", 3), ("enca", 1), ("ada", 2), ("ancia", 1),
    ("encia", 1), ("\u00E8ncia", 1), ("\u00EDcia", 1), ("logia", 3),
    ("inia", 1), ("\u00EDinia", 1), ("eria", 1), ("\u00E0ria", 1),
    ("at\u00F2ria", 1), ("alla", 1), ("ella", 1), ("\u00EDvola", 1),
    ("ima", 1), ("\u00EDssima", 1), ("qu\u00EDssima", 5), ("ana", 1),
    ("ina", 1), ("era", 1), ("sfera", 1), ("ora", 1), ("dora", 1),
    ("adora", 1), ("adura", 1), ("esa", 1), ("osa", 1), ("assa", 1),
    ("essa", 1), ("issa", 1), ("eta", 1), ("ita", 1), ("ota", 1),
    ("ista", 1), ("ialista", 1), ("ionista", 1), ("iva", 1), ("ativa", 1),
    ("n\u00E7a", 1), ("log\u00EDa", 3), ("ic", 4), ("\u00EDstic", 1),
    ("enc", 1), ("esc", 1), ("ud", 1), ("atge", 1), ("ble", 1), ("able", 1),
    ("ible", 1), ("isme", 1), ("ialisme", 1), ("ionisme", 1), ("ivisme", 1),
    ("aire", 1), ("icte", 1), ("iste", 1), ("ici", 1), ("\u00EDci", 1),
    ("logi", 3), ("ari", 1), ("tori", 1), ("al", 1), ("il", 1), ("all", 1),
    ("ell", 1), ("\u00EDvol", 1), ("isam", 1), ("issem", 1),
    ("\u00ECssem", 1), ("\u00EDssem", 1), ("\u00EDssim", 1),
    ("qu\u00EDssim", 5), ("amen", 1), ("\u00ECssin", 1), ("ar", 1),
    ("ificar", 1), ("egar", 1), ("ejar", 1), ("itar", 1), ("itzar", 1),
    ("fer", 1), ("or", 1), ("dor", 1), ("dur", 1), ("doras", 1), ("ics", 4),
    ("l\u00F3gics", 3), ("uds", 1), ("nces", 1), ("ades", 2), ("ancies", 1),
    ("encies", 1), ("\u00E8ncies", 1), ("\u00EDcies", 1), ("logies", 3),
    ("inies", 1), ("\u00EDnies", 1), ("eries", 1), ("\u00E0ries", 1),
    ("at\u00F2ries", 1), ("bles", 1), ("ables", 1), ("ibles", 1),
    ("imes", 1), ("\u00EDssimes", 1), ("qu\u00EDssimes", 5), ("formes", 1),
    ("ismes", 1), ("ialismes", 1), ("ines", 1), ("eres", 1), ("ores", 1),
    ("dores", 1), ("idores", 1), ("dures", 1), ("eses", 1), ("oses", 1),
    ("asses", 1), ("ictes", 1), ("ites", 1), ("otes", 1), ("istes", 1),
    ("ialistes", 1), ("ionistes", 1), ("iques", 4), ("l\u00F3giques", 3),
    ("ives", 1), ("atives", 1), ("log\u00EDes", 3), ("alleng\u00FCes", 1),
    ("icis", 1), ("\u00EDcis", 1), ("logis", 3), ("aris", 1), ("toris", 1),
    ("ls", 1), ("als", 1), ("ells", 1), ("ims", 1), ("\u00EDssims", 1),
    ("qu\u00EDssims", 5), ("ions", 1), ("cions", 1), ("acions", 2),
    ("esos", 1), ("osos", 1), ("assos", 1), ("issos", 1), ("ers", 1),
    ("ors", 1), ("dors", 1), ("adors", 1), ("idors", 1), ("ats", 1),
    ("itats", 1), ("bilitats", 1), ("ivitats", 1), ("ativitats", 1),
    ("\u00EFtats", 1), ("ets", 1), ("ants", 1), ("ents", 1), ("ments", 1),
    ("aments", 1), ("ots", 1), ("uts", 1), ("ius", 1), ("trius", 1),
    ("atius", 1), ("\u00E8s", 1), ("\u00E9s", 1), ("\u00EDs", 1),
    ("d\u00EDs", 1), ("\u00F3s", 1), ("itat", 1), ("bilitat", 1),
    ("ivitat", 1), ("ativitat", 1), ("\u00EFtat", 1), ("et", 1), ("ant", 1),
    ("ent", 1), ("ient", 1), ("ment", 1), ("ament", 1), ("isament", 1),
    ("ot", 1), ("isseu", 1), ("\u00ECsseu", 1), ("\u00EDsseu", 1),
    ("triu", 1), ("\u00EDssiu", 1), ("atiu", 1), ("\u00F3", 1),
    ("i\u00F3", 1), ("ci\u00F3", 1), ("aci\u00F3", 1)
  )

  /** CatalanStemmer.java a_3 (283 entries). */
  private val ca3: Array[(String, Int)] = Array(
    ("aba", 1), ("esca", 1), ("isca", 1), ("\u00EFsca", 1), ("ada", 1),
    ("ida", 1), ("uda", 1), ("\u00EFda", 1), ("ia", 1), ("aria", 1),
    ("iria", 1), ("ara", 1), ("iera", 1), ("ira", 1), ("adora", 1),
    ("\u00EFra", 1), ("ava", 1), ("ixa", 1), ("itza", 1), ("\u00EDa", 1),
    ("ar\u00EDa", 1), ("er\u00EDa", 1), ("ir\u00EDa", 1), ("\u00EFa", 1),
    ("isc", 1), ("\u00EFsc", 1), ("ad", 1), ("ed", 1), ("id", 1), ("ie", 1),
    ("re", 1), ("dre", 1), ("ase", 1), ("iese", 1), ("aste", 1), ("iste", 1),
    ("ii", 1), ("ini", 1), ("esqui", 1), ("eixi", 1), ("itzi", 1), ("am", 1),
    ("em", 1), ("arem", 1), ("irem", 1), ("\u00E0rem", 1), ("\u00EDrem", 1),
    ("\u00E0ssem", 1), ("\u00E9ssem", 1), ("iguem", 1), ("\u00EFguem", 1),
    ("avem", 1), ("\u00E0vem", 1), ("\u00E1vem", 1), ("ir\u00ECem", 1),
    ("\u00EDem", 1), ("ar\u00EDem", 1), ("ir\u00EDem", 1), ("assim", 1),
    ("essim", 1), ("issim", 1), ("\u00E0ssim", 1), ("\u00E8ssim", 1),
    ("\u00E9ssim", 1), ("\u00EDssim", 1), ("\u00EFm", 1), ("an", 1),
    ("aban", 1), ("arian", 1), ("aran", 1), ("ieran", 1), ("iran", 1),
    ("\u00EDan", 1), ("ar\u00EDan", 1), ("er\u00EDan", 1), ("ir\u00EDan", 1),
    ("en", 1), ("ien", 1), ("arien", 1), ("irien", 1), ("aren", 1),
    ("eren", 1), ("iren", 1), ("\u00E0ren", 1), ("\u00EFren", 1),
    ("asen", 1), ("iesen", 1), ("assen", 1), ("essen", 1), ("issen", 1),
    ("\u00E9ssen", 1), ("\u00EFssen", 1), ("esquen", 1), ("isquen", 1),
    ("\u00EFsquen", 1), ("aven", 1), ("ixen", 1), ("eixen", 1),
    ("\u00EFxen", 1), ("\u00EFen", 1), ("in", 1), ("inin", 1), ("sin", 1),
    ("isin", 1), ("assin", 1), ("essin", 1), ("issin", 1), ("\u00EFssin", 1),
    ("esquin", 1), ("eixin", 1), ("aron", 1), ("ieron", 1), ("ar\u00E1n", 1),
    ("er\u00E1n", 1), ("ir\u00E1n", 1), ("i\u00EFn", 1), ("ado", 1),
    ("ido", 1), ("ando", 2), ("iendo", 1), ("io", 1), ("ixo", 1),
    ("eixo", 1), ("\u00EFxo", 1), ("itzo", 1), ("ar", 1), ("tzar", 1),
    ("er", 1), ("eixer", 1), ("ir", 1), ("ador", 1), ("as", 1), ("abas", 1),
    ("adas", 1), ("idas", 1), ("aras", 1), ("ieras", 1), ("\u00EDas", 1),
    ("ar\u00EDas", 1), ("er\u00EDas", 1), ("ir\u00EDas", 1), ("ids", 1),
    ("es", 1), ("ades", 1), ("ides", 1), ("udes", 1), ("\u00EFdes", 1),
    ("atges", 1), ("ies", 1), ("aries", 1), ("iries", 1), ("ares", 1),
    ("ires", 1), ("adores", 1), ("\u00EFres", 1), ("ases", 1), ("ieses", 1),
    ("asses", 1), ("esses", 1), ("isses", 1), ("\u00EFsses", 1), ("ques", 1),
    ("esques", 1), ("\u00EFsques", 1), ("aves", 1), ("ixes", 1),
    ("eixes", 1), ("\u00EFxes", 1), ("\u00EFes", 1), ("abais", 1),
    ("arais", 1), ("ierais", 1), ("\u00EDais", 1), ("ar\u00EDais", 1),
    ("er\u00EDais", 1), ("ir\u00EDais", 1), ("aseis", 1), ("ieseis", 1),
    ("asteis", 1), ("isteis", 1), ("inis", 1), ("sis", 1), ("isis", 1),
    ("assis", 1), ("essis", 1), ("issis", 1), ("\u00EFssis", 1),
    ("esquis", 1), ("eixis", 1), ("itzis", 1), ("\u00E1is", 1),
    ("ar\u00E9is", 1), ("er\u00E9is", 1), ("ir\u00E9is", 1), ("ams", 1),
    ("ados", 1), ("idos", 1), ("amos", 1), ("\u00E1bamos", 1),
    ("\u00E1ramos", 1), ("i\u00E9ramos", 1), ("\u00EDamos", 1),
    ("ar\u00EDamos", 1), ("er\u00EDamos", 1), ("ir\u00EDamos", 1),
    ("aremos", 1), ("eremos", 1), ("iremos", 1), ("\u00E1semos", 1),
    ("i\u00E9semos", 1), ("imos", 1), ("adors", 1), ("ass", 1), ("erass", 1),
    ("ess", 1), ("ats", 1), ("its", 1), ("ents", 1), ("\u00E0s", 1),
    ("ar\u00E0s", 1), ("ir\u00E0s", 1), ("ar\u00E1s", 1), ("er\u00E1s", 1),
    ("ir\u00E1s", 1), ("\u00E9s", 1), ("ar\u00E9s", 1), ("\u00EDs", 1),
    ("i\u00EFs", 1), ("at", 1), ("it", 1), ("ant", 1), ("ent", 1),
    ("int", 1), ("ut", 1), ("\u00EFt", 1), ("au", 1), ("erau", 1),
    ("ieu", 1), ("ineu", 1), ("areu", 1), ("ireu", 1), ("\u00E0reu", 1),
    ("\u00EDreu", 1), ("asseu", 1), ("esseu", 1), ("eresseu", 1),
    ("\u00E0sseu", 1), ("\u00E9sseu", 1), ("igueu", 1), ("\u00EFgueu", 1),
    ("\u00E0veu", 1), ("\u00E1veu", 1), ("itzeu", 1), ("\u00ECeu", 1),
    ("ir\u00ECeu", 1), ("\u00EDeu", 1), ("ar\u00EDeu", 1), ("ir\u00EDeu", 1),
    ("assiu", 1), ("issiu", 1), ("\u00E0ssiu", 1), ("\u00E8ssiu", 1),
    ("\u00E9ssiu", 1), ("\u00EDssiu", 1), ("\u00EFu", 1), ("ix", 1),
    ("eix", 1), ("\u00EFx", 1), ("itz", 1), ("i\u00E0", 1), ("ar\u00E0", 1),
    ("ir\u00E0", 1), ("itz\u00E0", 1), ("ar\u00E1", 1), ("er\u00E1", 1),
    ("ir\u00E1", 1), ("ir\u00E8", 1), ("ar\u00E9", 1), ("er\u00E9", 1),
    ("ir\u00E9", 1), ("\u00ED", 1), ("i\u00EF", 1), ("i\u00F3", 1)
  )

  /** CatalanStemmer.java a_4 (22 entries). */
  private val ca4: Array[(String, Int)] = Array(
    ("a", 1), ("e", 1), ("i", 1), ("\u00EFn", 1), ("o", 1), ("ir", 1),
    ("s", 1), ("is", 1), ("os", 1), ("\u00EFs", 1), ("it", 1), ("eu", 1),
    ("iu", 1), ("iqu", 2), ("itz", 1), ("\u00E0", 1), ("\u00E1", 1),
    ("\u00E9", 1), ("\u00EC", 1), ("\u00ED", 1), ("\u00EF", 1),
    ("\u00F3", 1)
  )

  // ------------------------------------------------------------------
  // Irish (reference ga/IrishAnalyzer.java:150 -> ext/IrishStemmer.java;
  // published irish.sbl by Jim O'Regan)
  // ------------------------------------------------------------------

  private val gaV: Set[Char] = "aeiou\u00E1\u00E9\u00ED\u00F3\u00FA".toSet

  /** initial_morph prefix table (IrishStemmer.java a_0): eclipsis /
    * lenition / elision markers at the word START; "" = delete. Longest
    * prefix wins (find_among forward at cursor 0). */
  private val gaPre: Array[(String, String)] = Array(
    ("b'", ""), ("bh", "b"), ("bhf", "f"), ("bp", "p"), ("ch", "c"),
    ("d'", ""), ("d'fh", "f"), ("dh", "d"), ("dt", "t"), ("fh", "f"),
    ("gc", "c"), ("gh", "g"), ("h-", ""), ("m'", ""), ("mb", "b"),
    ("mh", "m"), ("n-", ""), ("nd", "d"), ("ng", "g"), ("ph", "p"),
    ("sh", "s"), ("t-", ""), ("th", "t"), ("ts", "s"))

  /** noun_sfx (a_1): 1 = R1-gated delete, 2 = R2-gated delete. */
  private val ga1: Array[(String, Int)] = Array(
    ("\u00EDochta", 1), ("a\u00EDochta", 1), ("ire", 2), ("aire", 2),
    ("abh", 1), ("eabh", 1), ("ibh", 1), ("aibh", 1), ("amh", 1),
    ("eamh", 1), ("imh", 1), ("aimh", 1), ("\u00EDocht", 1),
    ("a\u00EDocht", 1), ("ir\u00ED", 2), ("air\u00ED", 2))

  /** deriv (a_2): 1 = R2-gated delete; 2.."arc" 3.."gin" 4.."graf"
    * 5.."paite" 6.."\u00F3id" replacements, ungated. */
  private val ga2: Array[(String, Int)] = Array(
    ("\u00F3ideacha", 6), ("patacha", 5), ("achta", 1), ("arcachta", 2),
    ("eachta", 1), ("grafa\u00EDochta", 4), ("paite", 5), ("ach", 1),
    ("each", 1), ("\u00F3ideach", 6), ("gineach", 3), ("patach", 5),
    ("grafa\u00EDoch", 4), ("pataigh", 5), ("\u00F3idigh", 6),
    ("acht\u00FAil", 1), ("eacht\u00FAil", 1), ("gineas", 3),
    ("ginis", 3), ("acht", 1), ("arcacht", 2), ("eacht", 1),
    ("grafa\u00EDocht", 4), ("arcachta\u00ED", 2),
    ("grafa\u00EDochta\u00ED", 4))

  private val ga2Repl = Map(2 -> "arc", 3 -> "gin", 4 -> "graf",
    5 -> "paite", 6 -> "\u00F3id")

  /** verb_sfx (a_3): 1 = RV-gated delete, 2 = R1-gated delete. */
  private val ga3: Array[(String, Int)] = Array(
    ("imid", 1), ("aimid", 1), ("\u00EDmid", 1), ("a\u00EDmid", 1),
    ("adh", 2), ("eadh", 2), ("faidh", 1), ("fidh", 1), ("\u00E1il", 2),
    ("ain", 2), ("tear", 2), ("tar", 2))

  /** Irish Snowball stemmer (IrishStemmer.java stem()): initial_morph
    * prefix rewrite, regions marked on the REWRITTEN word, then three
    * independent backward rules (noun, deriv, verb), each longest-match
    * with a region gate that fails the whole rule. Runs after the ga
    * chain's IrishLowerCaseFilter. */
  def irish(word: String): String = {
    var w = word.toLowerCase(Locale.ROOT)
    // initial_morph: longest matching prefix
    var best = -1
    var bestRepl = ""
    var i = 0
    while (i < gaPre.length) {
      val (p, r) = gaPre(i)
      if (p.length > best && w.startsWith(p)) { best = p.length; bestRepl = r }
      i += 1
    }
    if (best > 0) w = bestRepl + w.substring(best)
    // mark_regions on the rewritten word
    val n0 = w.length
    var j = 0
    while (j < n0 && !gaV(w(j))) j += 1
    val pV = if (j >= n0) n0 else j + 1
    val (p1, p2) = r1r2(w, gaV)
    // backward rules, each tried once against the current end
    def applyB(tbl: Array[(String, Int)],
               act: (Int, Int) => Option[String]): Unit = {
      val m = longestB(w, w.length, 0, tbl)
      if (m != null) act(m._1, m._2).foreach { repl =>
        w = w.substring(0, m._1) + repl
      }
    }
    applyB(ga1, (st, code) => code match {
      case 1 => if (st >= p1) Some("") else None
      case _ => if (st >= p2) Some("") else None
    })
    applyB(ga2, (st, code) => code match {
      case 1 => if (st >= p2) Some("") else None
      case c => Some(ga2Repl(c))
    })
    applyB(ga3, (st, code) => code match {
      case 1 => if (st >= pV) Some("") else None
      case _ => if (st >= p1) Some("") else None
    })
    w
  }
}
