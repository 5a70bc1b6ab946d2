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

  /** PayloadHelper.encodeInt/encodeFloat (payloads/PayloadHelper.java:26-44):
    * big-endian 4-byte encodings; float goes through floatToIntBits. */
  def encodeInt(v: Int): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  def encodeFloat(v: Float): Array[Byte] =
    encodeInt(java.lang.Float.floatToIntBits(v))
  def decodeInt(b: Array[Byte], off: Int = 0): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  def decodeFloat(b: Array[Byte], off: Int = 0): Float =
    java.lang.Float.intBitsToFloat(decodeInt(b, off))

  /** NumericPayloadTokenFilter (payloads/NumericPayloadTokenFilter.java:
    * 33-61): tokens whose type equals `typeMatch` carry the
    * encodeFloat(payload) bytes; others keep their current payload. */
  def numericPayload(toks: IndexedSeq[(Token, Option[Array[Byte]])],
                     payload: Float, typeMatch: String): Vector[(Token, Option[Array[Byte]])] = {
    require(typeMatch != null, "typeMatch cannot be null")
    val bytes = encodeFloat(payload)
    toks.iterator.map { case (t, p) =>
      if (t.tokenType == typeMatch) (t, Some(bytes)) else (t, p)
    }.toVector
  }

  /** TokenOffsetPayloadTokenFilter (payloads/TokenOffsetPayloadTokenFilter
    * .java:36-56): every token's payload becomes 8 bytes — encodeInt(start)
    * then encodeInt(end). */
  def tokenOffsetPayload(toks: IndexedSeq[Token]): Vector[(Token, Array[Byte])] =
    toks.iterator.map { t =>
      (t, encodeInt(t.startOffset) ++ encodeInt(t.endOffset))
    }.toVector

  /** TypeAsPayloadTokenFilter (payloads/TypeAsPayloadTokenFilter.java:
    * 36-57): payload = the type's UTF-8 bytes; null/empty types leave the
    * existing payload untouched. */
  def typeAsPayload(toks: IndexedSeq[(Token, Option[Array[Byte]])]): Vector[(Token, Option[Array[Byte]])] =
    toks.iterator.map { case (t, p) =>
      if (t.tokenType != null && t.tokenType.nonEmpty)
        (t, Some(t.tokenType.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      else (t, p)
    }.toVector
}
