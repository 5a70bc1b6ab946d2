package graft.analysis

/** UAX29URLEmailTokenizer: the StandardTokenizer's UAX#29 word rules plus
  * maximal-munch <URL> and <EMAIL> token rules.
  *
  * Reference grammar:
  * lucene/analysis/common/src/java/org/apache/lucene/analysis/standard/UAX29URLEmailTokenizerImpl.jflex:85-155
  * (RFC-952/1035/1123/1738/3986/5234/5321/5322 productions) and rule order
  * :204-240 — URL first, then the LUCENE-5391 bare-host rules (a
  * scheme-less host is a URL only when NOT followed by [-\w]; the
  * AVOID_BAD_URL pushback re-scans the host as words), the LUCENE-3880
  * "mailto" word split, EMAIL, then the UAX#29 word rules. JFlex picks the
  * longest match INCLUDING lookahead text, ties to the earliest rule —
  * reproduced here by scoring each candidate with its total matched
  * length.
  *
  * The TLD set is the reference's ASCIITLD.jflex-macro (IANA root zone,
  * 2013-12-06), shipped as resource graft/tlds.txt; a strict domain may
  * end with one trailing root dot (ASCIITLD = "." (...) "."?).
  */
object UrlEmail {

  final val UrlType = "<URL>"
  final val EmailType = "<EMAIL>"

  private lazy val tlds: Set[String] = {
    val in = getClass.getResourceAsStream("/graft/tlds.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map(_.trim).filter(_.nonEmpty).toSet finally src.close()
  }
  /** TLD lengths, descending, for prefix probing. */
  private lazy val tldLens: Array[Int] = tlds.map(_.length).toArray.sorted.reverse

  // ---- char classes ----
  private def isAlnum(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
  private def isDigit(c: Char) = c >= '0' && c <= '9'
  private def isHex(c: Char) = isDigit(c) || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def isWordOrHyphen(c: Char) = isAlnum(c) || c == '_' || c == '-' // [-\w]
  private def isUnreserved(c: Char) = isAlnum(c) || c == '-' || c == '.' || c == '_' || c == '~'
  private def isSubDelim(c: Char) = "!$&'()*+,;=".indexOf(c) >= 0
  private def isEmailAtom(c: Char) =
    isAlnum(c) || "!#$%&'*+-/=?^_`{|}~".indexOf(c) >= 0

  /** Longest run end of chars in `ok` treating %xx as a unit (a '%' not
    * followed by two hex digits stops the run). */
  private def pctRun(s: String, from: Int, ok: Char => Boolean): Int = {
    var i = from
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 < n && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) i += 3
        else return i
      } else if (ok(c)) i += 1
      else return i
    }
    i
  }

  // ---- IPv4 ----
  /** Valid octet lengths at `i` (0-padded forms allowed), longest first. */
  private def octetLens(s: String, i: Int): List[Int] = {
    val n = s.length
    var out = List.empty[Int]
    // len 1: [0-9]
    if (i < n && isDigit(s.charAt(i))) out ::= 1
    if (i + 1 < n && isDigit(s.charAt(i)) && isDigit(s.charAt(i + 1))) {
      val c0 = s.charAt(i); val v2 = (c0 - '0') * 10 + (s.charAt(i + 1) - '0')
      // "0"?[1-9][0-9] | "00"[0-9](len3 below) | "0"{0,2}[0-9]: two-digit
      // forms are 0X (X any) via "0"{0,2}[0-9]? No: "0"{1}[0-9] is 0X. And
      // [1-9][0-9] via "0"?[1-9][0-9]. So any two digits whose value fits.
      if (c0 == '0' || v2 >= 10) out ::= 2
    }
    if (i + 2 < n && isDigit(s.charAt(i)) && isDigit(s.charAt(i + 1)) && isDigit(s.charAt(i + 2))) {
      val v = (s.charAt(i) - '0') * 100 + (s.charAt(i + 1) - '0') * 10 + (s.charAt(i + 2) - '0')
      val c0 = s.charAt(i)
      // 00X ("0"{2}[0-9]), 0XY ("0"[1-9][0-9]), 1XY, 2[0-4]Y, 25[0-5]
      if (c0 == '0' || (v >= 100 && v <= 255)) out ::= 3
    }
    out.sorted(Ordering[Int].reverse)
  }

  /** Longest IPv4 match end at `i`, or -1. */
  def matchIPv4(s: String, i: Int): Int = {
    def rec(pos: Int, octet: Int): Int = {
      val lens = octetLens(s, pos)
      if (lens.isEmpty) return -1
      var best = -1
      for (l <- lens) {
        if (octet == 3) { if (pos + l > best) best = pos + l }
        else if (pos + l < s.length && s.charAt(pos + l) == '.') {
          val e = rec(pos + l + 1, octet + 1)
          if (e > best) best = e
        }
      }
      best
    }
    rec(i, 0)
  }

  // ---- IPv6 (exact content validation, used inside brackets) ----
  def isIPv6(s: String): Boolean = {
    if (s.isEmpty) return false
    def hex16(g: String) = g.nonEmpty && g.length <= 4 && g.forall(isHex)
    def units(part: String, allowV4Tail: Boolean): Int = {
      // -1 = invalid; else number of 16-bit units
      if (part.isEmpty) return 0
      val gs = part.split(":", -1)
      if (gs.exists(_.isEmpty)) return -1
      var u = 0
      for ((g, idx) <- gs.zipWithIndex) {
        if (allowV4Tail && idx == gs.length - 1 && g.contains('.')) {
          if (matchIPv4(g, 0) != g.length) return -1
          u += 2
        } else if (hex16(g)) u += 1
        else return -1
      }
      u
    }
    val dc = s.indexOf("::")
    if (dc >= 0) {
      if (s.indexOf("::", dc + 1) >= 0 && s.indexOf("::", dc + 1) != dc) {
        if (s.indexOf("::", dc + 2) >= 0) return false
      }
      val left = s.substring(0, dc)
      val right = s.substring(dc + 2)
      val lu = units(left, allowV4Tail = false)
      val ru = units(right, allowV4Tail = true)
      lu >= 0 && ru >= 0 && lu + ru <= 7
    } else {
      // exactly 8 units, no compression
      units(s, allowV4Tail = true) == 8
    }
  }

  // ---- domain names ----
  /** End of the maximal [alnum-] run at i (a loose/strict label lives in
    * a prefix of it). */
  private def labelRunEnd(s: String, i: Int): Int = {
    var j = i
    while (j < s.length && (isAlnum(s.charAt(j)) || s.charAt(j) == '-')) j += 1
    j
  }

  /** Longest DomainNameLoose end at i, or -1: label ("." label)*. */
  def matchLooseDomain(s: String, i: Int): Int = {
    if (i >= s.length || !isAlnum(s.charAt(i))) return -1
    var pos = i
    var end = -1
    var continue = true
    while (continue) {
      val runEnd = labelRunEnd(s, pos)
      var le = runEnd
      while (le > pos && s.charAt(le - 1) == '-') le -= 1 // label ends alnum
      if (le == pos) { continue = false }
      else {
        end = le
        if (le == runEnd && le < s.length && s.charAt(le) == '.' &&
          le + 1 < s.length && isAlnum(s.charAt(le + 1))) pos = le + 1
        else continue = false
      }
    }
    end
  }

  /** All DomainNameStrict ends at i (ascending): every position where a
    * dotted label sequence ends in a TLD (the TLD may be a PREFIX of the
    * final label — the regex just stops there), each optionally followed
    * by one root dot (ASCIITLD's trailing "."?). */
  def strictDomainEnds(s: String, i: Int): List[Int] = {
    if (i >= s.length || !isAlnum(s.charAt(i))) return Nil
    val out = scala.collection.mutable.SortedSet.empty[Int]
    var pos = i
    var ok = true
    var first = true
    while (ok) {
      val runEnd = labelRunEnd(s, pos)
      val validLabel = runEnd > pos && s.charAt(runEnd - 1) != '-'
      if (!first && runEnd > pos) {
        // does a TLD start at pos (as a prefix of this label)?
        for (l <- tldLens if pos + l <= runEnd) {
          val cand = s.substring(pos, pos + l).toLowerCase(java.util.Locale.ROOT)
          if (tlds.contains(cand)) {
            out += pos + l
            if (pos + l < s.length && s.charAt(pos + l) == '.' &&
                pos + l == runEnd) // root dot only after a complete label
              out += pos + l + 1
          }
        }
      }
      if (validLabel && runEnd < s.length && s.charAt(runEnd) == '.' &&
        runEnd + 1 < s.length && isAlnum(s.charAt(runEnd + 1))) {
        pos = runEnd + 1
        first = false
      } else ok = false
    }
    out.toList
  }

  /** All valid URIhostStrict ends at i (ascending): bracketed IPv6, IPv4,
    * and strict domains. */
  def strictHostEnds(s: String, i: Int): List[Int] = {
    if (i >= s.length) return Nil
    if (s.charAt(i) == '[') {
      val close = s.indexOf(']', i + 1)
      if (close > i + 1 && close - i < 64 && isIPv6(s.substring(i + 1, close)))
        return List(close + 1)
      return Nil
    }
    val out = scala.collection.mutable.SortedSet.empty[Int]
    val v4 = matchIPv4(s, i)
    if (v4 > 0) out += v4
    strictDomainEnds(s, i).foreach(out += _)
    out.toList
  }

  // ---- URI pieces ----
  /** End of URIlogin (".. (:' ..)? @") at i, or -1. */
  private def matchLogin(s: String, i: Int): Int = {
    var j = pctRun(s, i, c => isUnreserved(c) || isSubDelim(c))
    if (j < s.length && s.charAt(j) == ':')
      j = pctRun(s, j + 1, c => isUnreserved(c) || isSubDelim(c))
    if (j < s.length && s.charAt(j) == '@') j + 1 else -1
  }

  private def matchPort(s: String, i: Int): Int = {
    if (i >= s.length || s.charAt(i) != ':') return i
    var j = i + 1
    val lim = math.min(s.length, j + 5)
    var k = j
    while (k < lim && isDigit(s.charAt(k))) k += 1
    if (k == j) i else k
  }

  private def matchHttpPath(s: String, i: Int): Int = {
    var j = i
    while (j < s.length && s.charAt(j) == '/')
      j = pctRun(s, j + 1, c => isUnreserved(c) || ";:@&=".indexOf(c) >= 0)
    j
  }

  private def matchQuery(s: String, i: Int): Int =
    if (i < s.length && s.charAt(i) == '?')
      pctRun(s, i + 1, c => isUnreserved(c) || isSubDelim(c) || ":@/?".indexOf(c) >= 0)
    else i

  private def matchFragment(s: String, i: Int): Int =
    if (i < s.length && s.charAt(i) == '#')
      pctRun(s, i + 1, c => isUnreserved(c) || isSubDelim(c) || ":@/?".indexOf(c) >= 0)
    else i

  /** Longest loose host end at i (bracket IPv6 | IPv4 | loose domain). */
  private def matchLooseHost(s: String, i: Int): Int = {
    if (i < s.length && s.charAt(i) == '[') {
      val close = s.indexOf(']', i + 1)
      if (close > i + 1 && close - i < 64 && isIPv6(s.substring(i + 1, close)))
        return close + 1
      return -1
    }
    val d = matchLooseDomain(s, i) // loose labels subsume IPv4 digits-with-
    val v4 = matchIPv4(s, i)       // dots only when every octet is a label;
    math.max(d, v4)                // "1.2.3.4" parses under both
  }

  private def startsWithIgnoreCase(s: String, i: Int, w: String): Boolean =
    i + w.length <= s.length && s.regionMatches(true, i, w, 0, w.length)

  /** Longest full-URL end at i ({HTTPurl}|{FTPurl}|{FILEurl}), or -1. */
  def matchUrl(s: String, i: Int): Int = {
    var best = -1
    // HTTPurlFull
    val httpScheme =
      if (startsWithIgnoreCase(s, i, "https://")) i + 8
      else if (startsWithIgnoreCase(s, i, "http://")) i + 7
      else -1
    if (httpScheme > 0) {
      val login = matchLogin(s, httpScheme)
      val hostStart = if (login > 0) login else httpScheme
      val host = matchLooseHost(s, hostStart)
      if (host > 0) {
        val e = matchFragment(s, matchQuery(s, matchHttpPath(s, matchPort(s, host))))
        if (e > best) best = e
      }
      if (login > 0) { // regex may also bind no-login (host chars ⊂ login chars)
        val host2 = matchLooseHost(s, httpScheme)
        if (host2 > 0) {
          val e2 = matchFragment(s, matchQuery(s, matchHttpPath(s, matchPort(s, host2))))
          if (e2 > best) best = e2
        }
      }
    }
    // HTTPurlNoScheme: strict host + required port/path/query/fragment
    for (he <- strictHostEnds(s, i)) {
      val afterPort = matchPort(s, he)
      val afterPath = matchHttpPath(s, afterPort)
      val afterQuery = matchQuery(s, afterPath)
      val afterFrag = matchFragment(s, afterQuery)
      if (afterFrag > he && afterFrag > best) best = afterFrag
    }
    // FTPurl: ftp:// authorityLoose path(required) type? fragment?
    if (startsWithIgnoreCase(s, i, "ftp://")) {
      val as = i + 6
      val login = matchLogin(s, as)
      for (hostStart <- (if (login > 0) List(login, as) else List(as))) {
        val host = matchLooseHost(s, hostStart)
        if (host > 0) {
          val afterPort = matchPort(s, host)
          if (afterPort < s.length && s.charAt(afterPort) == '/') {
            var j = afterPort
            while (j < s.length && s.charAt(j) == '/')
              j = pctRun(s, j + 1, c => isUnreserved(c) || "?:@&=".indexOf(c) >= 0)
            // FTPtype ";type=[aid]"
            if (startsWithIgnoreCase(s, j, ";type=") && j + 6 < s.length &&
              "aAiIdD".indexOf(s.charAt(j + 6)) >= 0) j += 7
            val e = matchFragment(s, j)
            if (e > best) best = e
          }
        }
      }
    }
    // FILEurl: file:// hostLoose? path(required) fragment?
    if (startsWithIgnoreCase(s, i, "file://")) {
      val as = i + 7
      val host = matchLooseHost(s, as)
      for (pathStart <- (if (host > 0) List(host, as) else List(as))) {
        if (pathStart < s.length && s.charAt(pathStart) == '/') {
          var j = pathStart
          while (j < s.length && s.charAt(j) == '/')
            j = pctRun(s, j + 1, c => isUnreserved(c) || "?:@&=".indexOf(c) >= 0)
          val e = matchFragment(s, j)
          if (e > best) best = e
        }
      }
    }
    best
  }

  // ---- EMAIL ----
  private def matchQuotedString(s: String, i: Int): Int = {
    if (i >= s.length || s.charAt(i) != '"') return -1
    var j = i + 1
    while (j < s.length) {
      val c = s.charAt(j)
      if (c == '"') return j + 1
      if (c == '\\') {
        if (j + 1 < s.length && s.charAt(j + 1) <= 0x7f) j += 2 else return -1
      } else if (c >= 0x01 && c <= 0x7e && c != '\t' && c != '\n' && c != '\r')
        j += 1
      else return -1
    }
    -1
  }

  /** Longest EMAIL end at i, or -1. */
  def matchEmail(s: String, i: Int): Int = {
    // local part: label ("." label)*, label = atom+ | quoted-string
    def label(j: Int): Int = {
      val q = matchQuotedString(s, j)
      if (q > 0) return q
      var k = j
      while (k < s.length && isEmailAtom(s.charAt(k))) k += 1
      if (k > j) k else -1
    }
    var j = label(i)
    if (j < 0) return -1
    while (j < s.length && s.charAt(j) == '.' && label(j + 1) > 0)
      j = label(j + 1)
    if (j >= s.length || s.charAt(j) != '@') return -1
    val ds = j + 1
    if (ds < s.length && s.charAt(ds) == '[') {
      // EMAILbracketedHost: domain-literal text (incl. IPv4 / "IPv6:"...)
      var k = ds + 1
      var ok = true
      while (ok && k < s.length && s.charAt(k) != ']') {
        val c = s.charAt(k)
        if (c == '\\') { if (k + 1 < s.length && s.charAt(k + 1) <= 0x7f) k += 2 else ok = false }
        else if ((c >= 0x01 && c <= 0x08) || c == 0x0b || c == 0x0c ||
          (c >= 0x0e && c <= 0x5a) || (c >= 0x5e && c <= 0x7f)) k += 1
        else ok = false
      }
      if (ok && k < s.length && s.charAt(k) == ']') k + 1 else -1
    } else {
      // DomainNameStrict only (the grammar's EMAIL domain excludes bare
      // IPv4: EMAIL = .. "@" ({DomainNameStrict} | {EMAILbracketedHost}))
      val ends = strictDomainEnds(s, ds)
      if (ends.nonEmpty) ends.max else -1
    }
  }

  // ---- the tokenizer ----
  /** Tokenize with URL/EMAIL rules; over-length tokens are skipped but
    * still count a position (StandardTokenizer.java:156-166 semantics). */
  def tokenize(text: String,
               maxTokenLength: Int = StandardTokenizer.DefaultMaxTokenLength): Vector[Token] = {
    val n = text.length
    val out = Vector.newBuilder[Token]
    var pending = 0 // posInc accumulated from skipped over-length tokens
    def emit(term: String, start: Int, end: Int, tpe: String): Unit = {
      if (term.length > maxTokenLength) pending += 1
      else { out += Token(term, start, end, 1 + pending, tpe); pending = 0 }
    }

    // pure UAX#29 tokens for the word rules; re-derived when a URL/EMAIL
    // consumes past a word-token boundary
    var words: Vector[Token] = StandardTokenizer.tokenize(text, Int.MaxValue)
    var base = 0  // words are relative to text.substring(base)
    var wi = 0
    def wordAt(i: Int): Option[Token] = {
      while (wi < words.length && words(wi).startOffset + base < i) wi += 1
      if (wi < words.length && words(wi).startOffset + base == i)
        Some(words(wi).copy(startOffset = i, endOffset = words(wi).endOffset + base))
      else None
    }
    def resync(from: Int): Unit = {
      // a URL/EMAIL ended inside a pure token: re-tokenize the remainder
      while (wi < words.length && words(wi).endOffset + base <= from) wi += 1
      if (wi < words.length && words(wi).startOffset + base < from) {
        words = StandardTokenizer.tokenize(text.substring(from), Int.MaxValue)
        base = from
        wi = 0
      }
    }

    var i = 0
    var avoidBadUrl = false
    while (i < n) {
      val c = text.charAt(i)
      val mayStartUrlOrEmail = isEmailAtom(c) || c == '"' || c == '['
      if (!mayStartUrlOrEmail) {
        wordAt(i) match {
          case Some(t) => emit(t.term, t.startOffset, t.endOffset, t.tokenType); i = t.endOffset
          case None => i += 1
        }
        avoidBadUrl = false
      } else {
        // candidates scored by TOTAL matched length (incl. lookahead), tie
        // broken by rule order: URL < hostLA < badURL < mailto < EMAIL < word
        val w = wordAt(i)
        val wlen = w.map(_.endOffset - i).getOrElse(0)
        val ulen = { val e = matchUrl(text, i); if (e > i) e - i else 0 }
        val hostEnds = if (c == '"') Nil else strictHostEnds(text, i)
        val hostLA = hostEnds.filter(e => e < n && !isWordOrHyphen(text.charAt(e)))
          .map(_ - i).sorted.lastOption.getOrElse(0)
        val hostBad = if (avoidBadUrl) 0
          else hostEnds.filter(e => e < n && isWordOrHyphen(text.charAt(e)))
            .map(_ - i).sorted.lastOption.getOrElse(0)
        val hostEof = hostEnds.filter(_ == n).map(_ - i).headOption.getOrElse(0)
        val elen = { val e = matchEmail(text, i); if (e > i) e - i else 0 }
        val mailtoLen =
          if (startsWithIgnoreCase(text, i, "mailto") && i + 6 < n &&
            text.charAt(i + 6) == ':' && matchEmail(text, i + 7) > i + 7)
            6 + 1 + (matchEmail(text, i + 7) - (i + 7))
          else 0
        // totals (lookahead rules add their lookahead to the total)
        val totals = List(
          (ulen, 1), (if (hostLA > 0) hostLA + 1 else 0, 2),
          (if (hostBad > 0) hostBad + 1 else 0, 3), (hostEof, 4),
          (mailtoLen, 5), (elen, 6), (wlen, 7))
        val (bestLen, rule) = totals.filter(_._1 > 0)
          .sortBy { case (l, r) => (-l, r) }.headOption.getOrElse((0, 0))
        if (bestLen == 0) { i += 1; avoidBadUrl = false }
        else rule match {
          case 1 => emit(text.substring(i, i + ulen), i, i + ulen, UrlType)
            i += ulen; resync(i); avoidBadUrl = false
          case 2 => emit(text.substring(i, i + hostLA), i, i + hostLA, UrlType)
            i += hostLA; resync(i); avoidBadUrl = false
          case 3 => avoidBadUrl = true // pushback; rescan same position
          case 4 => emit(text.substring(i, i + hostEof), i, i + hostEof, UrlType)
            i += hostEof; resync(i); avoidBadUrl = false
          case 5 => emit("mailto", i, i + 6, "<ALPHANUM>")
            i += 6; resync(i); avoidBadUrl = false
          case 6 => emit(text.substring(i, i + elen), i, i + elen, EmailType)
            i += elen; resync(i); avoidBadUrl = false
          case 7 => val t = w.get
            emit(t.term, t.startOffset, t.endOffset, t.tokenType)
            i = t.endOffset; avoidBadUrl = false
        }
      }
    }
    out.result()
  }
}
