package graft.analysis

/** HTML/markup stripping char filter — the reference's
  * HTMLStripCharFilter semantics (lucene/analysis/common/src/java/org/
  * apache/lucene/analysis/charfilter/HTMLStripCharFilter.jflex:100-145,
  * 597-749) re-implemented as a single-pass scanner instead of a
  * 31k-line generated JFlex DFA:
  *
  *  - block-level open/close tags -> '\n'; the reference's inline
  *    element set (jflex:113-139) -> removed with no replacement
  *  - comments `<!-- -->` (quote-aware, incl. server-side includes),
  *    `<! >` declarations and `<? ?>` processing instructions -> removed
  *  - `<script>`/`<style>` elements collapse to ONE '\n' including their
  *    content, with quote- and comment-aware scanning for the real
  *    `</script>` (HTMLStripCharFilterTest.testScriptQuotes/testStyle)
  *  - character entities decode via the reference's full 253-entry table
  *    (W3C standard data, HTMLStripCharFilter.java:29841-29980, shipped
  *    verbatim as a resource like the stop sets) plus numeric
  *    `&#dd;`/`&#xhh;` forms; the six reserved entities also accept
  *    their upper-case variants (HTMLStripCharFilter.java:29831-29840)
  *  - `escapedTags` (factory's escapedTags param) pass through verbatim
  *  - a '<' that cannot start a well-formed construct stays literal
  *    (the "< before > inhibits tag recognition" posture of the
  *    reference's malformed-HTML tests)
  *
  * Deliberate scope note: the reference's JFlex grammar additionally
  * chases ~20 heuristics for pathologically malformed attribute quoting;
  * this scanner keeps the quote-aware tag scan but does not replicate
  * those recovery paths byte-for-byte.
  */
object HtmlStrip {

  /** Reference entity table (253 names; values may be multi-char). */
  lazy val Entities: Map[String, String] = {
    val in = getClass.getResourceAsStream("/graft/htmlentities.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { line =>
      val Array(name, cps) = line.split('\t')
      name -> cps.split(' ').map(s => new String(Character.toChars(s.toInt)))
        .mkString
    }.toMap
    finally src.close()
  }

  /** Entities whose ALL-CAPS variants are accepted (reference
    * upperCaseVariantsAccepted). */
  private val UpperOk = Set("QUOT", "COPY", "GT", "LT", "REG", "AMP")

  /** Reference inline-element set (jflex InlineElment, :113-139);
    * everything else is block-level. */
  val InlineElements: Set[String] = Set(
    "a", "abbr", "acronym", "b", "basefont", "bdo", "big", "cite", "code",
    "dfn", "em", "font", "i", "img", "input", "kbd", "label", "q", "s",
    "samp", "select", "small", "span", "strike", "strong", "sub", "sup",
    "textarea", "tt", "u", "var")

  def strip(html: String, escapedTags: Set[String] = Set.empty): String = {
    if (html == null) return null
    val n = html.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') i = tag(html, i, out, escapedTags)
      else if (c == '&') i = entity(html, i, out)
      else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Skip a quoted run starting at `i` (html(i) is ' or "); returns the
    * index after the closing quote, or -1 when the quote never closes.
    * Backslash escapes honored (jflex SingleQuoted/DoubleQuoted). */
  private def skipQuoted(html: String, i: Int): Int = {
    val q = html.charAt(i)
    val n = html.length
    var j = i + 1
    while (j < n) {
      val c = html.charAt(j)
      if (c == '\\' && j + 1 < n) j += 2
      else if (c == q) return j + 1
      else j += 1
    }
    -1
  }

  /** Skip a quote-aware `<!-- -->` comment starting at `i` (html starts
    * with "<!--" there); returns index after "-->" (or n). */
  private def skipComment(html: String, i: Int): Int = {
    val n = html.length
    var j = i + 4
    while (j < n) {
      val c = html.charAt(j)
      if (c == '\'' || c == '"') {
        val q = skipQuoted(html, j)
        j = if (q < 0) n else q
      }
      else if (c == '-' && html.startsWith("-->", j)) return j + 3
      else j += 1
    }
    n
  }

  /** Consume one construct starting at the '<' at `i`; append its
    * replacement; return the next index. */
  private def tag(html: String, i: Int, out: java.lang.StringBuilder,
                  escapedTags: Set[String]): Int = {
    val n = html.length
    if (html.startsWith("<!--", i)) return skipComment(html, i)
    if (html.startsWith("<!", i) || html.startsWith("<?", i)) {
      val close = html.indexOf('>', i + 2)
      return if (close < 0) { out.append('<'); i + 1 } else close + 1
    }
    // tag name: optional '/', then [a-zA-Z][-a-zA-Z0-9]*
    var j = i + 1
    val closing = j < n && html.charAt(j) == '/'
    if (closing) j += 1
    val nameStart = j
    while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-')
      && (j > nameStart || html.charAt(j).isLetter)) j += 1
    if (j == nameStart) { out.append('<'); return i + 1 } // not a tag
    val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
    // scan to the closing '>' (quote-aware); another bare '<' first =>
    // malformed, the original '<' stays literal. An UNTERMINATED quote
    // makes the reference's DFA backtrack to the unquoted alternative —
    // mirror that by rescanning with quotes treated as plain chars.
    var k = j
    var end = -1
    var retryPlain = false
    while (end < 0 && !retryPlain && k < n) {
      val c = html.charAt(k)
      if (c == '"' || c == '\'') {
        val q = skipQuoted(html, k)
        if (q < 0) retryPlain = true else k = q
      }
      else if (c == '>') end = k
      else if (c == '<') { out.append('<'); return i + 1 }
      else k += 1
    }
    if (retryPlain) {
      k = j
      while (end < 0 && k < n) {
        val c = html.charAt(k)
        if (c == '>') end = k
        else if (c == '<') { out.append('<'); return i + 1 }
        else k += 1
      }
    }
    if (end < 0) { out.append('<'); return i + 1 } // unterminated
    if (escapedTags.contains(name)) {
      out.append(html, i, end + 1)
      return end + 1
    }
    if (!closing && (name == "script" || name == "style")) {
      out.append('\n')
      return skipScript(html, end + 1, name)
    }
    if (InlineElements.contains(name)) () // removed, no replacement
    else out.append('\n') // BLOCK_LEVEL_{START,END}_TAG_REPLACEMENT
    end + 1
  }

  /** Skip script/style content (quote- and comment-aware) through its
    * close tag; the element already emitted its single '\n'. */
  private def skipScript(html: String, start: Int, name: String): Int = {
    val n = html.length
    val close = "</" + name
    var j = start
    while (j < n) {
      val c = html.charAt(j)
      if (c == '\'' || c == '"') {
        val q = skipQuoted(html, j)
        j = if (q < 0) n else q
      }
      else if (c == '<' && html.startsWith("<!--", j)) j = skipComment(html, j)
      else if (c == '<' && html.regionMatches(true, j, close, 0, close.length)) {
        val gt = html.indexOf('>', j)
        return if (gt < 0) n else gt + 1
      }
      else j += 1
    }
    n
  }

  /** Decode one entity starting at the '&' at `i`. Unknown / unterminated
    * entities stay literal (reference: "Here is an &." survives). */
  private def entity(html: String, i: Int, out: java.lang.StringBuilder): Int = {
    val n = html.length
    if (i + 1 < n && html.charAt(i + 1) == '#') {
      val hex = i + 2 < n && (html.charAt(i + 2) == 'x' || html.charAt(i + 2) == 'X')
      var j = i + (if (hex) 3 else 2)
      val digStart = j
      while (j < n && j - digStart <= 7 &&
        (if (hex) Character.digit(html.charAt(j), 16) >= 0
         else html.charAt(j).isDigit)) j += 1
      if (j > digStart && j < n && html.charAt(j) == ';') {
        val cp = java.lang.Long.parseLong(html.substring(digStart, j),
          if (hex) 16 else 10)
        if (cp >= 0 && cp <= Character.MAX_CODE_POINT) {
          out.appendCodePoint(cp.toInt)
          return j + 1
        }
      }
      out.append('&'); return i + 1
    }
    var j = i + 1
    val nameStart = j
    while (j < n && j - nameStart <= 10 && html.charAt(j).isLetterOrDigit) j += 1
    if (j > nameStart && j < n && html.charAt(j) == ';') {
      val name = html.substring(nameStart, j)
      val decoded = Entities.get(name).orElse(
        if (UpperOk.contains(name)) Entities.get(name.toLowerCase(java.util.Locale.ROOT))
        else None)
      decoded match {
        case Some(v) => out.append(v); return j + 1
        case None =>
      }
    }
    out.append('&'); i + 1
  }
}
