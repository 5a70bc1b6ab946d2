package graft.analysis

/** Double Metaphone phonetic encoder (Lawrence Philips, C/C++ Users
  * Journal, June 2000 — a public algorithm). The reference exposes it via
  * lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/
  * DoubleMetaphoneFilter.java:1, which delegates to commons-codec's
  * DoubleMetaphone; this is a fresh Scala implementation of the published
  * rules, matched to the filter's test vectors
  * (DoubleMetaphoneFilterTest.java: international -> ANTR/ANTRNXNL,
  * Kuczewski -> KSSK alt KXFS, hello -> HL; TestPhoneticFilter.java:
  * aaa/bbb/ccc/easgasg -> A/PP/KK/ASKS).
  *
  * Produces a primary and an alternate code, each capped at `maxCodeLen`
  * characters over the alphabet {A,F,H,J,K,L,M,N,P,R,S,T,X,0}. */
final class DoubleMetaphone(val maxCodeLen: Int = 4) {

  private val Vowels = "AEIOUY"
  private val SilentStart = Array("GN", "KN", "PN", "WR", "PS")
  private val LRNMBHFVW = Array("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
  private val EsEpEb = Array("ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN",
    "IE", "EI", "ER")
  private val LTKSNMBZ = Array("L", "T", "K", "S", "N", "M", "B", "Z")

  /** Primary code, or "" for input with no encodable letters. */
  def encode(value: String): String = encode(value, alternate = false)

  def encode(value0: String, alternate: Boolean): String = {
    val value = clean(value0)
    if (value == null) return ""
    val slavo = isSlavoGermanic(value)
    var index = if (isSilentStart(value)) 1 else 0
    val r = new Result(maxCodeLen)
    while (!r.complete && index <= value.length - 1) {
      value.charAt(index) match {
        case 'A' | 'E' | 'I' | 'O' | 'U' | 'Y' =>
          if (index == 0) r.append('A')
          index += 1
        case 'B' =>
          r.append('P')
          index += (if (charAt(value, index + 1) == 'B') 2 else 1)
        case 'Ç' => r.append('S'); index += 1
        case 'C' => index = handleC(value, r, index)
        case 'D' => index = handleD(value, r, index)
        case 'F' =>
          r.append('F')
          index += (if (charAt(value, index + 1) == 'F') 2 else 1)
        case 'G' => index = handleG(value, r, index, slavo)
        case 'H' => index = handleH(value, r, index)
        case 'J' => index = handleJ(value, r, index, slavo)
        case 'K' =>
          r.append('K')
          index += (if (charAt(value, index + 1) == 'K') 2 else 1)
        case 'L' =>
          if (charAt(value, index + 1) == 'L') {
            if (conditionL0(value, index)) r.appendPrimary('L')
            else r.append('L')
            index += 2
          } else { r.append('L'); index += 1 }
        case 'M' =>
          r.append('M')
          index += (if (conditionM0(value, index)) 2 else 1)
        case 'N' =>
          r.append('N')
          index += (if (charAt(value, index + 1) == 'N') 2 else 1)
        case 'Ñ' => r.append('N'); index += 1
        case 'P' => index = handleP(value, r, index)
        case 'Q' =>
          r.append('K')
          index += (if (charAt(value, index + 1) == 'Q') 2 else 1)
        case 'R' => index = handleR(value, r, index, slavo)
        case 'S' => index = handleS(value, r, index, slavo)
        case 'T' => index = handleT(value, r, index)
        case 'V' =>
          r.append('F')
          index += (if (charAt(value, index + 1) == 'V') 2 else 1)
        case 'W' => index = handleW(value, r, index)
        case 'X' => index = handleX(value, r, index)
        case 'Z' => index = handleZ(value, r, index, slavo)
        case _ => index += 1
      }
    }
    if (alternate) r.alternate else r.primary
  }

  // -- per-letter rules ----------------------------------------------------

  private def handleC(value: String, r: Result, index0: Int): Int = {
    var index = index0
    if (conditionC0(value, index)) { r.append('K'); index += 2 }
    else if (index == 0 && contains(value, index, "CAESAR")) {
      r.append('S'); index += 2
    } else if (contains(value, index, "CH")) index = handleCH(value, r, index)
    else if (contains(value, index, "CZ") &&
             !contains(value, index - 2, "WICZ")) {
      r.append('S', 'X'); index += 2
    } else if (contains(value, index + 1, "CIA")) { r.append('X'); index += 3 }
    else if (contains(value, index, "CC") &&
             !(index == 1 && charAt(value, 0) == 'M'))
      index = handleCC(value, r, index)
    else if (contains(value, index, "CK") || contains(value, index, "CG") ||
             contains(value, index, "CQ")) { r.append('K'); index += 2 }
    else if (contains(value, index, "CI") || contains(value, index, "CE") ||
             contains(value, index, "CY")) {
      if (contains(value, index, "CIO") || contains(value, index, "CIE") ||
          contains(value, index, "CIA")) r.append('S', 'X')
      else r.append('S')
      index += 2
    } else {
      r.append('K')
      if (containsAny(value, index + 1, " C", " Q", " G")) index += 3
      else if (containsAny(value, index + 1, "C", "K", "Q") &&
               !containsAny(value, index + 1, "CE", "CI")) index += 2
      else index += 1
    }
    index
  }

  private def handleCC(value: String, r: Result, index0: Int): Int = {
    var index = index0
    if (containsAny(value, index + 2, "I", "E", "H") &&
        !contains(value, index + 2, "HU")) {
      if ((index == 1 && charAt(value, index - 1) == 'A') ||
          containsAny(value, index - 1, "UCCEE", "UCCES")) r.append("KS")
      else r.append('X')
      index += 3
    } else { r.append('K'); index += 2 }
    index
  }

  private def handleCH(value: String, r: Result, index: Int): Int = {
    if (index > 0 && contains(value, index, "CHAE")) {
      r.append('K', 'X'); index + 2
    } else if (conditionCH0(value, index)) { r.append('X'); index + 2 }
    else if (conditionCH1(value, index)) { r.append('K'); index + 2 }
    else {
      if (index > 0) {
        if (contains(value, 0, "MC")) r.append('K') else r.append('X', 'K')
      } else r.append('X')
      index + 2
    }
  }

  private def handleD(value: String, r: Result, index0: Int): Int = {
    var index = index0
    if (contains(value, index, "DG")) {
      if (containsAny(value, index + 2, "I", "E", "Y")) {
        r.append('J'); index += 3
      } else { r.append("TK"); index += 2 }
    } else if (contains(value, index, "DT") || contains(value, index, "DD")) {
      r.append('T'); index += 2
    } else { r.append('T'); index += 1 }
    index
  }

  private def handleG(value: String, r: Result, index0: Int,
                      slavo: Boolean): Int = {
    var index = index0
    if (charAt(value, index + 1) == 'H') index = handleGH(value, r, index)
    else if (charAt(value, index + 1) == 'N') {
      if (index == 1 && isVowel(charAt(value, 0)) && !slavo)
        r.append("KN", "N")
      else if (!contains(value, index + 2, "EY") &&
               charAt(value, index + 1) != 'Y' && !slavo)
        r.append("N", "KN")
      else r.append("KN")
      index += 2
    } else if (contains(value, index + 1, "LI") && !slavo) {
      r.append("KL", "L"); index += 2
    } else if (index == 0 && (charAt(value, index + 1) == 'Y' ||
               containsOneOf(value, index + 1, EsEpEb))) {
      r.append('K', 'J'); index += 2
    } else if ((contains(value, index + 1, "ER") ||
                charAt(value, index + 1) == 'Y') &&
               !containsAny(value, 0, "DANGER", "RANGER", "MANGER") &&
               !containsAny(value, index - 1, "E", "I") &&
               !containsAny(value, index - 1, "RGY", "OGY")) {
      r.append('K', 'J'); index += 2
    } else if (containsAny(value, index + 1, "E", "I", "Y") ||
               containsAny(value, index - 1, "AGGI", "OGGI")) {
      if (containsAny(value, 0, "VAN ", "VON ") || contains(value, 0, "SCH") ||
          contains(value, index + 1, "ET")) r.append('K')
      else if (contains(value, index + 1, "IER")) r.append('J')
      else r.append('J', 'K')
      index += 2
    } else if (charAt(value, index + 1) == 'G') { index += 2; r.append('K') }
    else { index += 1; r.append('K') }
    index
  }

  private def handleGH(value: String, r: Result, index0: Int): Int = {
    var index = index0
    if (index > 0 && !isVowel(charAt(value, index - 1))) {
      r.append('K'); index += 2
    } else if (index == 0) {
      if (charAt(value, index + 2) == 'I') r.append('J') else r.append('K')
      index += 2
    } else if ((index > 1 && containsAny(value, index - 2, "B", "H", "D")) ||
               (index > 2 && containsAny(value, index - 3, "B", "H", "D")) ||
               (index > 3 && containsAny(value, index - 4, "B", "H"))) {
      index += 2 // silent GH
    } else {
      if (index > 2 && charAt(value, index - 1) == 'U' &&
          containsAny(value, index - 3, "C", "G", "L", "R", "T"))
        r.append('F')
      else if (index > 0 && charAt(value, index - 1) != 'I') r.append('K')
      index += 2
    }
    index
  }

  private def handleH(value: String, r: Result, index0: Int): Int = {
    var index = index0
    if ((index == 0 || isVowel(charAt(value, index - 1))) &&
        isVowel(charAt(value, index + 1))) {
      r.append('H'); index += 2
    } else index += 1
    index
  }

  private def handleJ(value: String, r: Result, index0: Int,
                      slavo: Boolean): Int = {
    var index = index0
    if (contains(value, index, "JOSE") || contains(value, 0, "SAN ")) {
      if ((index == 0 && charAt(value, index + 4) == ' ') ||
          value.length == 4 || contains(value, 0, "SAN ")) r.append('H')
      else r.append('J', 'H')
      index += 1
    } else {
      if (index == 0 && !contains(value, index, "JOSE")) r.append('J', 'A')
      else if (isVowel(charAt(value, index - 1)) && !slavo &&
               (charAt(value, index + 1) == 'A' ||
                charAt(value, index + 1) == 'O')) r.append('J', 'H')
      else if (index == value.length - 1) r.append('J', ' ')
      else if (!containsOneOf(value, index + 1, LTKSNMBZ) &&
               !containsAny(value, index - 1, "S", "K", "L")) r.append('J')
      if (charAt(value, index + 1) == 'J') index += 2 else index += 1
    }
    index
  }

  private def handleP(value: String, r: Result, index0: Int): Int = {
    var index = index0
    if (charAt(value, index + 1) == 'H') { r.append('F'); index += 2 }
    else {
      r.append('P')
      index += (if (containsAny(value, index + 1, "P", "B")) 2 else 1)
    }
    index
  }

  private def handleR(value: String, r: Result, index: Int,
                      slavo: Boolean): Int = {
    if (index == value.length - 1 && !slavo &&
        contains(value, index - 2, "IE") &&
        !containsAny(value, index - 4, "ME", "MA")) r.appendAlternate('R')
    else r.append('R')
    index + (if (charAt(value, index + 1) == 'R') 2 else 1)
  }

  private def handleS(value: String, r: Result, index0: Int,
                      slavo: Boolean): Int = {
    var index = index0
    if (containsAny(value, index - 1, "ISL", "YSL")) index += 1 // silent
    else if (index == 0 && contains(value, index, "SUGAR")) {
      r.append('X', 'S'); index += 1
    } else if (contains(value, index, "SH")) {
      if (containsAny(value, index + 1, "HEIM", "HOEK", "HOLM", "HOLZ"))
        r.append('S')
      else r.append('X')
      index += 2
    } else if (containsAny(value, index, "SIO", "SIA") ||
               contains(value, index, "SIAN")) {
      if (slavo) r.append('S') else r.append('S', 'X')
      index += 3
    } else if ((index == 0 &&
                containsAny(value, index + 1, "M", "N", "L", "W")) ||
               contains(value, index + 1, "Z")) {
      r.append('S', 'X')
      index += (if (contains(value, index + 1, "Z")) 2 else 1)
    } else if (contains(value, index, "SC")) index = handleSC(value, r, index)
    else {
      if (index == value.length - 1 && containsAny(value, index - 2, "AI", "OI"))
        r.appendAlternate('S')
      else r.append('S')
      index += (if (containsAny(value, index + 1, "S", "Z")) 2 else 1)
    }
    index
  }

  private def handleSC(value: String, r: Result, index: Int): Int = {
    if (charAt(value, index + 2) == 'H') {
      if (containsAny(value, index + 3, "OO", "ER", "EN", "UY", "ED", "EM")) {
        if (containsAny(value, index + 3, "ER", "EN")) r.append("X", "SK")
        else r.append("SK")
      } else {
        if (index == 0 && !isVowel(charAt(value, 3)) && charAt(value, 3) != 'W')
          r.append('X', 'S')
        else r.append('X')
      }
    } else if (containsAny(value, index + 2, "I", "E", "Y")) r.append('S')
    else r.append("SK")
    index + 3
  }

  private def handleT(value: String, r: Result, index0: Int): Int = {
    var index = index0
    if (contains(value, index, "TION")) { r.append('X'); index += 3 }
    else if (containsAny(value, index, "TIA", "TCH")) {
      r.append('X'); index += 3
    } else if (contains(value, index, "TH") || contains(value, index, "TTH")) {
      if (containsAny(value, index + 2, "OM", "AM") ||
          containsAny(value, 0, "VAN ", "VON ") || contains(value, 0, "SCH"))
        r.append('T')
      else r.append('0', 'T')
      index += 2
    } else {
      r.append('T')
      index += (if (containsAny(value, index + 1, "T", "D")) 2 else 1)
    }
    index
  }

  private def handleW(value: String, r: Result, index0: Int): Int = {
    var index = index0
    if (contains(value, index, "WR")) { r.append('R'); index += 2 }
    else if (index == 0 && (isVowel(charAt(value, index + 1)) ||
             contains(value, index, "WH"))) {
      if (isVowel(charAt(value, index + 1))) r.append('A', 'F')
      else r.append('A')
      index += 1
    } else if ((index == value.length - 1 &&
                isVowel(charAt(value, index - 1))) ||
               containsAny(value, index - 1,
                 "EWSKI", "EWSKY", "OWSKI", "OWSKY") ||
               contains(value, 0, "SCH")) {
      r.appendAlternate('F'); index += 1
    } else if (containsAny(value, index, "WICZ", "WITZ")) {
      r.append("TS", "FX"); index += 4
    } else index += 1
    index
  }

  private def handleX(value: String, r: Result, index0: Int): Int = {
    var index = index0
    if (index == 0) { r.append('S'); index += 1 }
    else {
      if (!(index == value.length - 1 &&
            (containsAny(value, index - 3, "IAU", "EAU") ||
             containsAny(value, index - 2, "AU", "OU")))) r.append("KS")
      index += (if (containsAny(value, index + 1, "C", "X")) 2 else 1)
    }
    index
  }

  private def handleZ(value: String, r: Result, index0: Int,
                      slavo: Boolean): Int = {
    var index = index0
    if (charAt(value, index + 1) == 'H') { r.append('J'); index += 2 }
    else {
      if (containsAny(value, index + 1, "ZO", "ZI", "ZA") ||
          (slavo && index > 0 && charAt(value, index - 1) != 'T'))
        r.append("S", "TS")
      else r.append('S')
      index += (if (charAt(value, index + 1) == 'Z') 2 else 1)
    }
    index
  }

  // -- conditions ----------------------------------------------------------

  private def conditionC0(value: String, index: Int): Boolean = {
    if (contains(value, index, "CHIA")) true
    else if (index <= 1) false
    else if (isVowel(charAt(value, index - 2))) false
    else if (!contains(value, index - 1, "ACH")) false
    else {
      val c = charAt(value, index + 2)
      (c != 'I' && c != 'E') ||
        containsAny(value, index - 2, "BACHER", "MACHER")
    }
  }

  private def conditionCH0(value: String, index: Int): Boolean = {
    if (index != 0) false
    else if (!containsAny(value, index + 1, "HARAC", "HARIS") &&
             !containsAny(value, index + 1, "HOR", "HYM", "HIA", "HEM")) false
    else if (contains(value, 0, "CHORE")) false
    else true
  }

  private def conditionCH1(value: String, index: Int): Boolean =
    containsAny(value, 0, "VAN ", "VON ") || contains(value, 0, "SCH") ||
      containsAny(value, index - 2, "ORCHES", "ARCHIT", "ORCHID") ||
      containsAny(value, index + 2, "T", "S") ||
      ((containsAny(value, index - 1, "A", "O", "U", "E") || index == 0) &&
       (containsOneOf(value, index + 2, LRNMBHFVW) ||
        index + 1 == value.length - 1))

  private def conditionL0(value: String, index: Int): Boolean = {
    if (index == value.length - 3 &&
        containsAny(value, index - 1, "ILLO", "ILLA", "ALLE")) true
    else if ((containsAny(value, value.length - 2, "AS", "OS") ||
              containsAny(value, value.length - 1, "A", "O")) &&
             contains(value, index - 1, "ALLE")) true
    else false
  }

  private def conditionM0(value: String, index: Int): Boolean =
    charAt(value, index + 1) == 'M' ||
      (contains(value, index - 1, "UMB") &&
       (index + 1 == value.length - 1 || contains(value, index + 2, "ER")))

  // -- helpers -------------------------------------------------------------

  private def isVowel(c: Char): Boolean = Vowels.indexOf(c.toInt) >= 0

  private def isSlavoGermanic(value: String): Boolean =
    value.indexOf('W') >= 0 || value.indexOf('K') >= 0 ||
      value.contains("CZ") || value.contains("WITZ")

  private def isSilentStart(value: String): Boolean =
    SilentStart.exists(value.startsWith)

  private def clean(input: String): String = {
    if (input == null) return null
    val t = input.trim
    if (t.isEmpty) null else t.toUpperCase(java.util.Locale.ENGLISH)
  }

  private def charAt(value: String, index: Int): Char =
    if (index < 0 || index >= value.length) Character.MIN_VALUE
    else value.charAt(index)

  private def contains(value: String, start: Int, criteria: String): Boolean =
    start >= 0 && start + criteria.length <= value.length &&
      value.regionMatches(start, criteria, 0, criteria.length)

  private def containsAny(value: String, start: Int,
                          criteria: String*): Boolean =
    criteria.exists(contains(value, start, _))

  private def containsOneOf(value: String, start: Int,
                            criteria: Array[String]): Boolean =
    criteria.exists(contains(value, start, _))

  /** Paired primary/alternate accumulator; each side caps at maxLen. */
  private final class Result(maxLen: Int) {
    private val p = new java.lang.StringBuilder(maxLen)
    private val a = new java.lang.StringBuilder(maxLen)
    def append(c: Char): Unit = { appendPrimary(c); appendAlternate(c) }
    def append(cp: Char, ca: Char): Unit = {
      appendPrimary(cp); appendAlternate(ca)
    }
    def append(s: String): Unit = { appendPrimary(s); appendAlternate(s) }
    def append(sp: String, sa: String): Unit = {
      appendPrimary(sp); appendAlternate(sa)
    }
    def appendPrimary(c: Char): Unit = if (p.length < maxLen) p.append(c)
    def appendAlternate(c: Char): Unit = if (a.length < maxLen) a.append(c)
    def appendPrimary(s: String): Unit = {
      val n = maxLen - p.length
      if (s.length <= n) p.append(s) else p.append(s.substring(0, n))
    }
    def appendAlternate(s: String): Unit = {
      val n = maxLen - a.length
      if (s.length <= n) a.append(s) else a.append(s.substring(0, n))
    }
    def complete: Boolean = p.length >= maxLen && a.length >= maxLen
    def primary: String = p.toString
    def alternate: String = a.toString
  }
}

object DoubleMetaphone {
  private val default = new DoubleMetaphone(4)

  /** (primary, alternate) at the default length-4 code. */
  def encodePair(w: String): (String, String) =
    (default.encode(w, alternate = false), default.encode(w, alternate = true))

  /** Filter-semantics token expansion
    * (DoubleMetaphoneFilter.incrementToken): inject=true keeps the
    * original and adds codes at posInc=0; inject=false replaces (keeping
    * the original only when nothing encodable came out, e.g. "12345").
    * The alternate is emitted only when it differs from the primary. */
  def filterTokens(token: String, maxCodeLen: Int = 4,
                   inject: Boolean = false): Seq[String] = {
    if (token.isEmpty) return Seq(token)
    val enc = if (maxCodeLen == 4) default else new DoubleMetaphone(maxCodeLen)
    val primary = enc.encode(token, alternate = false)
    val alt = enc.encode(token, alternate = true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    if (inject) out += token
    if (primary.nonEmpty && primary != token) out += primary
    if (alt.nonEmpty && alt != primary && primary != token) out += alt
    if (out.isEmpty) Seq(token) else out.toSeq
  }
}
