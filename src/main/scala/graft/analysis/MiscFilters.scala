package graft.analysis

/** The reference's small single-purpose token filters.
  *
  * Reference semantics:
  *  - ElisionFilter (strip a qualifying article before the first
  *    apostrophe; fr/it/ca/ga analyzers run it BEFORE LowerCaseFilter):
  *    lucene/analysis/common/src/java/org/apache/lucene/analysis/util/ElisionFilter.java:33-75,
  *    article sets: fr/FrenchAnalyzer.java:61-63, it/ItalianAnalyzer.java:52-57
  *  - LengthFilter / CodepointCountFilter (FilteringTokenFilter — dropped
  *    tokens leave position gaps):
  *    miscellaneous/LengthFilter.java, miscellaneous/CodepointCountFilter.java
  *  - KeepWordFilter: miscellaneous/KeepWordFilter.java
  *  - TrimFilter (whitespace trim, offsets untouched): miscellaneous/TrimFilter.java
  *  - TruncateTokenFilter (keyword-aware): miscellaneous/TruncateTokenFilter.java
  *  - LimitTokenCountFilter: miscellaneous/LimitTokenCountFilter.java
  *  - ApostropheFilter (keep the part before the first ' or U+2019):
  *    tr/ApostropheFilter.java
  *  - RemoveDuplicatesTokenFilter (same term at the same position):
  *    miscellaneous/RemoveDuplicatesTokenFilter.java
  */
object MiscFilters {

  /** FrenchAnalyzer.DEFAULT_ARTICLES (matched case-insensitively). */
  val FrenchArticles: Set[String] = Set(
    "l", "m", "t", "qu", "n", "s", "j", "d", "c",
    "jusqu", "quoiqu", "lorsqu", "puisqu")

  /** ItalianAnalyzer.DEFAULT_ARTICLES. */
  val ItalianArticles: Set[String] = Set(
    "c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
    "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s", "v", "d")

  /** ElisionFilter on one term: if the prefix before the FIRST apostrophe
    * (' or U+2019) is an article, strip prefix + apostrophe. */
  def elision(term: String, articles: Set[String]): String = {
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      if (c == '\'' || c == '’') {
        return if (articles.contains(term.substring(0, i).toLowerCase(
          java.util.Locale.ROOT))) term.substring(i + 1)
        else term
      }
      i += 1
    }
    term
  }

  private def filtering(toks: IndexedSeq[Token])(keep: Token => Boolean): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var gap = 0
    for (t <- toks) {
      if (keep(t)) { out += t.copy(posInc = t.posInc + gap); gap = 0 }
      else gap += t.posInc
    }
    out.result()
  }

  /** LengthFilter: keep tokens whose CHAR length is in [min, max]. */
  def lengthFilter(toks: IndexedSeq[Token], min: Int, max: Int): Vector[Token] = {
    require(min >= 0, "minimum length must be greater than or equal to zero")
    require(min <= max, "maximum length must not be less than minimum length")
    filtering(toks)(t => t.term.length >= min && t.term.length <= max)
  }

  /** CodepointCountFilter: same, counting codepoints. */
  def codepointCountFilter(toks: IndexedSeq[Token], min: Int, max: Int): Vector[Token] =
    filtering(toks) { t =>
      val n = t.term.codePointCount(0, t.term.length)
      n >= min && n <= max
    }

  /** KeepWordFilter (case-sensitivity decided by how `keep` was built —
    * pass lowercased set + lowercase upstream for ignoreCase). */
  def keepWords(toks: IndexedSeq[Token], keep: Set[String],
                ignoreCase: Boolean = false): Vector[Token] =
    filtering(toks) { t =>
      keep.contains(if (ignoreCase) t.term.toLowerCase(java.util.Locale.ROOT)
      else t.term)
    }

  /** TrimFilter: strip leading/trailing whitespace from the term text. */
  def trim(toks: IndexedSeq[Token]): Vector[Token] =
    toks.iterator.map { t =>
      var s = 0
      var e = t.term.length
      while (s < e && Character.isWhitespace(t.term.charAt(s))) s += 1
      while (e > s && Character.isWhitespace(t.term.charAt(e - 1))) e -= 1
      if (s == 0 && e == t.term.length) t else t.copy(term = t.term.substring(s, e))
    }.toVector

  /** TruncateTokenFilter: cap non-keyword tokens at `length` chars. */
  def truncate(toks: IndexedSeq[Token], length: Int,
               keywords: Set[String] = Set.empty): Vector[Token] = {
    require(length >= 1, "length parameter must be a positive number: " + length)
    toks.iterator.map { t =>
      if (t.term.length > length && !keywords.contains(t.term))
        t.copy(term = t.term.substring(0, length))
      else t
    }.toVector
  }

  /** LimitTokenCountFilter: pass through the first `max` tokens. */
  def limitTokenCount(toks: IndexedSeq[Token], max: Int): Vector[Token] = {
    require(max >= 1, "maxTokenCount must be greater than zero")
    toks.take(max).toVector
  }

  /** ApostropheFilter: keep only the part before the first ' / U+2019. */
  def apostrophe(term: String): String = {
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      if (c == '\'' || c == '’') return term.substring(0, i)
      i += 1
    }
    term
  }

  /** TurkishLowerCaseFilter (tr/TurkishLowerCaseFilter.java:35-95):
    * I -> ı (dotless) unless a combining-dot-above follows through
    * non-spacing marks (then I -> i and the dot is removed, mimicking
    * the composed form); everything else per-codepoint lowercase. */
  def turkishLowerCase(term: String): String = {
    val CombiningDotAbove = 0x0307
    val sb = new java.lang.StringBuilder(term.length)
    var iOrAfter = false
    var i = 0
    def isBeforeDot(from: Int): Boolean = {
      var j = from
      while (j < term.length) {
        val c = term.codePointAt(j)
        if (Character.getType(c) != Character.NON_SPACING_MARK) return false
        if (c == CombiningDotAbove) return true
        j += Character.charCount(c)
      }
      false
    }
    while (i < term.length) {
      val ch = term.codePointAt(i)
      iOrAfter = ch == 'I' ||
        (iOrAfter && Character.getType(ch) == Character.NON_SPACING_MARK)
      if (iOrAfter && ch == CombiningDotAbove) {
        // drop the dot (it composed with the preceding I -> i)
      } else if (ch == 'I') {
        if (isBeforeDot(i + 1)) sb.append('i')
        else { sb.append('ı'); iOrAfter = false }
      } else {
        sb.appendCodePoint(Character.toLowerCase(ch))
      }
      i += Character.charCount(ch)
    }
    sb.toString
  }

  /** RemoveDuplicatesTokenFilter: drop a token when the same term was
    * already emitted at the same position (posInc > 0 clears the set);
    * the dropped overlap contributes no gap (its posInc is 0). */
  def removeDuplicates(toks: IndexedSeq[Token]): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    val seen = scala.collection.mutable.HashSet.empty[String]
    for (t <- toks) {
      if (t.posInc > 0) seen.clear()
      if (seen.add(t.term)) out += t
    }
    out.result()
  }
}
