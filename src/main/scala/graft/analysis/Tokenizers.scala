package graft.analysis

/** The reference's core character-class tokenizers and the payload /
  * type token filters that ride on token metadata.
  *
  * Reference semantics:
  *  - WhitespaceTokenizer / LetterTokenizer / LowerCaseTokenizer (maximal
  *    runs of the accepted char class; CharTokenizer contract):
  *    lucene/analysis/common/src/java/org/apache/lucene/analysis/core/WhitespaceTokenizer.java,
  *    core/LetterTokenizer.java, core/LowerCaseTokenizer.java,
  *    util/CharTokenizer.java
  *  - KeywordTokenizer (whole input, one token): core/KeywordTokenizer.java
  *  - TypeTokenFilter (keep/drop by token type, position gaps):
  *    core/TypeTokenFilter.java
  *  - DelimitedPayloadTokenFilter ("term|payload", the payload part is
  *    stripped from the term and carried as an attribute):
  *    payloads/DelimitedPayloadTokenFilter.java:30-80
  */
object Tokenizers {

  private def charRuns(text: String, accept: Int => Boolean,
                       normalize: Int => Int = identity): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    while (i < text.length) {
      while (i < text.length && !accept(text.codePointAt(i)))
        i += Character.charCount(text.codePointAt(i))
      if (i < text.length) {
        val start = i
        val sb = new java.lang.StringBuilder
        while (i < text.length && accept(text.codePointAt(i))) {
          sb.appendCodePoint(normalize(text.codePointAt(i)))
          i += Character.charCount(text.codePointAt(i))
        }
        out += Token(sb.toString, start, i, 1, "word")
      }
    }
    out.result()
  }

  /** WhitespaceTokenizer: maximal non-whitespace runs. */
  def whitespace(text: String): Vector[Token] =
    charRuns(text, cp => !Character.isWhitespace(cp))

  /** LetterTokenizer: maximal letter runs (anything else splits). */
  def letter(text: String): Vector[Token] =
    charRuns(text, Character.isLetter)

  /** LowerCaseTokenizer = LetterTokenizer + per-codepoint lowercase. */
  def lowerCaseLetter(text: String): Vector[Token] =
    charRuns(text, Character.isLetter, Character.toLowerCase)

  /** KeywordTokenizer: the entire input as one token. */
  def keyword(text: String): Vector[Token] =
    if (text.isEmpty) Vector.empty
    else Vector(Token(text, 0, text.length, 1, "word"))

  /** TypeTokenFilter: keep tokens whose type is in `types` (whitelist
    * mode) or not in it (stoplist mode); dropped tokens leave gaps. */
  def typeFilter(toks: IndexedSeq[Token], types: Set[String],
                 useWhitelist: Boolean = false): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var gap = 0
    for (t <- toks) {
      if (types.contains(t.tokenType) == useWhitelist) {
        out += t.copy(posInc = t.posInc + gap); gap = 0
      } else gap += t.posInc
    }
    out.result()
  }

  /** DelimitedPayloadTokenFilter: "term|payload" -> (token without the
    * suffix, Some(payload string)); tokens without the delimiter carry
    * None. Split at the FIRST delimiter (the reference's forward scan —
    * "a|b|c" keeps term "a", payload "b|c"). Encoding (float/int/
    * identity bytes) is the caller's concern. */
  def delimitedPayload(toks: IndexedSeq[Token],
                       delimiter: Char = '|'): Vector[(Token, Option[String])] =
    toks.iterator.map { t =>
      val i = t.term.indexOf(delimiter)
      if (i < 0) (t, None)
      else (t.copy(term = t.term.substring(0, i)),
        Some(t.term.substring(i + 1)))
    }.toVector
}
