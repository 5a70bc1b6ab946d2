package graft.analysis

/** Character n-gram tokenizer + token filters.
  *
  * Reference semantics (Lucene 4.4+ behavior, the non-Lucene43 classes):
  *  - NGramTokenFilter — grams per token, sorted by start offset then
  *    length; all grams of a token share its position (first carries the
  *    token's posInc, rest 0) and its offsets; tokens shorter than
  *    minGram codepoints are dropped but their increments accumulate
  *    (CodepointCountFilter wrapping):
  *    lucene/analysis/common/src/java/org/apache/lucene/analysis/ngram/NGramTokenFilter.java:31-143
  *  - EdgeNGramTokenFilter — front grams minGram..maxGram; the first
  *    emitted gram carries the accumulated posInc:
  *    lucene/analysis/common/src/java/org/apache/lucene/analysis/ngram/EdgeNGramTokenFilter.java:30-120
  *  - NGramTokenizer / EdgeNGramTokenizer — stream tokenizer over
  *    codepoints, grams emitted by increasing start offset, every gram
  *    posInc=1 with REAL per-gram offsets; grams never contain a
  *    non-token char, and edgesOnly additionally requires the char
  *    before the gram to be a non-token char:
  *    lucene/analysis/common/src/java/org/apache/lucene/analysis/ngram/NGramTokenizer.java:30-205
  */
object NGrams {

  private def checkRange(minGram: Int, maxGram: Int): Unit = {
    require(minGram >= 1, "minGram must be greater than zero")
    require(minGram <= maxGram, "minGram must not be greater than maxGram")
  }

  /** NGramTokenFilter (4.4): all grams of each surviving token. */
  def filter(toks: IndexedSeq[Token], minGram: Int, maxGram: Int): Vector[Token] = {
    checkRange(minGram, maxGram)
    val out = Vector.newBuilder[Token]
    var pendingInc = 0
    for (t <- toks) {
      pendingInc += t.posInc
      val cps = t.term.codePointCount(0, t.term.length)
      if (cps >= minGram) { // CodepointCountFilter keeps, else drop + gap
        var pos = 0
        while (pos + minGram <= cps) {
          var size = minGram
          while (size <= maxGram && pos + size <= cps) {
            val start = t.term.offsetByCodePoints(0, pos)
            val end = t.term.offsetByCodePoints(start, size)
            out += Token(t.term.substring(start, end), t.startOffset,
              t.endOffset, pendingInc, t.tokenType)
            pendingInc = 0
            size += 1
          }
          pos += 1
        }
      }
    }
    out.result()
  }

  /** EdgeNGramTokenFilter: front grams only. */
  def edgeFilter(toks: IndexedSeq[Token], minGram: Int, maxGram: Int): Vector[Token] = {
    checkRange(minGram, maxGram)
    val out = Vector.newBuilder[Token]
    var pendingInc = 0
    for (t <- toks) {
      pendingInc += t.posInc
      val cps = t.term.codePointCount(0, t.term.length)
      var size = minGram
      while (size <= maxGram && size <= cps) {
        val end = t.term.offsetByCodePoints(0, size)
        out += Token(t.term.substring(0, end), t.startOffset, t.endOffset,
          if (size == minGram) { val p = pendingInc; pendingInc = 0; p }
          else 0,
          t.tokenType)
        size += 1
      }
    }
    out.result()
  }

  /** NGramTokenizer (edgesOnly=false) / EdgeNGramTokenizer (true). By
    * default every char is a token char (grams cross spaces);
    * `isTokenChar` pre-tokenizes like the reference's overridable hook. */
  def tokenize(text: String, minGram: Int, maxGram: Int,
               edgesOnly: Boolean = false,
               isTokenChar: Int => Boolean = _ => true): Vector[Token] = {
    checkRange(minGram, maxGram)
    val cps = text.codePoints().toArray
    // char offset of each codepoint (+ end sentinel)
    val charOff = new Array[Int](cps.length + 1)
    var i = 0
    while (i < cps.length) {
      charOff(i + 1) = charOff(i) + Character.charCount(cps(i)); i += 1
    }
    val out = Vector.newBuilder[Token]
    var start = 0
    while (start + minGram <= cps.length) {
      val edgeOk = !edgesOnly || start == 0 || !isTokenChar(cps(start - 1))
      if (edgeOk) {
        var size = minGram
        var clean = (start until start + minGram - 1).forall(j => isTokenChar(cps(j)))
        while (size <= maxGram && start + size <= cps.length && clean) {
          if (!isTokenChar(cps(start + size - 1))) clean = false
          else {
            out += Token(text.substring(charOff(start), charOff(start + size)),
              charOff(start), charOff(start + size), 1, "word")
            size += 1
          }
        }
      }
      start += 1
    }
    out.result()
  }
}
