package graft.analysis

import java.util.regex.Pattern

/** ClassicTokenizer + ClassicFilter — the pre-3.1 Lucene
  * StandardTokenizer: recognizes ALPHANUM, internal-apostrophe words,
  * dotted acronyms, company names (AT&T, Excite@Home), emails, hosts,
  * digit-bearing serial/model/IP numbers, and single CJ chars.
  *
  * Reference semantics — the grammar is executed directly from the
  * published JFlex spec's token definitions, resolved with JFlex's
  * maximal-munch rule (longest match wins, ties broken by rule order):
  * lucene/analysis/common/src/java/org/apache/lucene/analysis/standard/ClassicTokenizerImpl.jflex:75-134,
  * ClassicTokenizer.java:115-140 (too-long skip, ACRONYM_DEP -> HOST
  * with the trailing dot removed), ClassicFilter.java:30-70
  * (possessive strip on APOSTROPHE, dot removal on ACRONYM).
  *
  * NUM's six alternatives are evaluated as separate same-priority
  * patterns with the longest taken, because a Java regex alternation
  * is first-match, not longest-match ("1-a-2" must be one NUM token).
  */
object Classic {

  private final val Cj = "\\u3100-\\u312f\\u3040-\\u309F\\u30A0-\\u30FF" +
    "\\u31F0-\\u31FF\\u3300-\\u337f\\u3400-\\u4dbf\\u4e00-\\u9fff" +
    "\\uf900-\\ufaff\\uff65-\\uff9f"
  private final val L = s"[\\p{L}&&[^$Cj]]" // LETTER = [:letter:] minus CJ
  private final val An = s"[\\p{L}\\p{Nd}\\u0E00-\\u0E59&&[^$Cj]]+" // ALPHANUM
  private final val Alpha = s"$L+"
  private final val P = "[_\\-/.,]"
  private final val Hd = s"(?:$L|\\p{Nd})*\\p{Nd}(?:$L|\\p{Nd})*" // HAS_DIGIT

  /** (pattern, type, priority) in JFlex rule order; the six NUM
    * alternatives share one priority slot. */
  private val Rules: Array[(Pattern, String, Int)] = {
    def p(re: String) = Pattern.compile(re)
    Array(
      (p(An), "<ALPHANUM>", 0),
      (p(s"$Alpha(?:'$Alpha)+"), "<APOSTROPHE>", 1),
      (p(s"$L\\.(?:$L\\.)+"), "<ACRONYM>", 2),
      (p(s"$Alpha[&@]$Alpha"), "<COMPANY>", 3),
      (p(s"$An(?:[._\\-]$An)*@$An(?:[.\\-]$An)+"), "<EMAIL>", 4),
      (p(s"$An(?:\\.$An)+"), "<HOST>", 5),
      (p(s"$An$P$Hd"), "<NUM>", 6),
      (p(s"$Hd$P$An"), "<NUM>", 6),
      (p(s"$An(?:$P$Hd$P$An)+"), "<NUM>", 6),
      (p(s"$Hd(?:$P$An$P$Hd)+"), "<NUM>", 6),
      (p(s"$An$P$Hd(?:$P$An$P$Hd)+"), "<NUM>", 6),
      (p(s"$Hd$P$An(?:$P$Hd$P$An)+"), "<NUM>", 6),
      (p(s"[$Cj]"), "<CJ>", 7),
      (p(s"$An\\.(?:$An\\.)+"), "<ACRONYM_DEP>", 8))
  }

  /** Tokenize with the classic grammar. Too-long tokens are skipped but
    * advance the position, like StandardTokenizer. */
  def tokenize(text: String, maxTokenLength: Int = 255): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    val matchers = Rules.map { case (pat, _, _) => pat.matcher(text) }
    var i = 0
    var skipped = 0
    while (i < text.length) {
      var bestLen = 0
      var bestRule = -1
      var r = 0
      while (r < Rules.length) {
        val m = matchers(r)
        m.region(i, text.length)
        if (m.lookingAt()) {
          val len = m.end - i
          val pri = Rules(r)._3
          if (len > bestLen ||
            (len == bestLen && bestRule >= 0 && pri < Rules(bestRule)._3)) {
            bestLen = len; bestRule = r
          }
        }
        r += 1
      }
      if (bestRule < 0) {
        i += 1 // [^] ignore rule: skip one char, no position cost
      } else {
        val (term0, typ0) =
          (text.substring(i, i + bestLen), Rules(bestRule)._2)
        // ACRONYM_DEP is reported as HOST with the trailing '.' removed
        val (term, typ) =
          if (typ0 == "<ACRONYM_DEP>") (term0.substring(0, term0.length - 1), "<HOST>")
          else (term0, typ0)
        if (term0.length <= maxTokenLength) {
          out += Token(term, i, i + term.length, skipped + 1, typ)
          skipped = 0
        } else skipped += 1
        i += bestLen
      }
    }
    out.result()
  }

  /** ClassicFilter: strip a trailing 's from APOSTROPHE tokens, strip
    * the dots from ACRONYM tokens. */
  def filter(toks: IndexedSeq[Token]): Vector[Token] =
    toks.iterator.map { t =>
      if (t.tokenType == "<APOSTROPHE>" && t.term.length >= 2 &&
        t.term.toLowerCase(java.util.Locale.ROOT).endsWith("'s"))
        t.copy(term = t.term.substring(0, t.term.length - 2))
      else if (t.tokenType == "<ACRONYM>")
        t.copy(term = t.term.replace(".", ""))
      else t
    }.toVector

  /** The full ClassicAnalyzer chain: tokenize -> ClassicFilter ->
    * lowercase -> stop set (position gaps). */
  def analyze(text: String, stopSet: Set[String],
              maxTokenLength: Int = 255): Vector[TermPos] = {
    val out = Vector.newBuilder[TermPos]
    var pos = -1
    for (t <- filter(tokenize(text, maxTokenLength))) {
      pos += t.posInc
      val term = Analyzer.lowerCase(t.term)
      if (!stopSet.contains(term)) out += TermPos(term, pos)
    }
    out.result()
  }
}
