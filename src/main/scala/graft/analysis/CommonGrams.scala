package graft.analysis

/** CommonGramsFilter + CommonGramsQueryFilter: overlay "w1_w2" bigrams
  * wherever either neighbor is a common word (index side), and collapse
  * to grams-only on the query side.
  *
  * Reference semantics:
  *  - index filter (gram emitted after the left unigram, posInc=0, type
  *    "gram", offsets spanning both words):
  *    lucene/analysis/common/src/java/org/apache/lucene/analysis/commongrams/CommonGramsFilter.java:51-183
  *  - query filter (emit bigrams whenever possible; a unigram survives
  *    only if no bigram covers it; surviving grams get posInc=1):
  *    lucene/analysis/common/src/java/org/apache/lucene/analysis/commongrams/CommonGramsQueryFilter.java:58-137
  */
object CommonGrams {

  final val GramType = "gram"
  private final val Separator = '_'

  /** Index-side filter: unigrams pass through; after any unigram where it
    * or its successor is common, the "left_right" gram is injected at the
    * left word's position (posInc 0). */
  def filter(toks: IndexedSeq[Token], common: Set[String]): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var prev: Token = null
    var prevWasCommon = false
    for (t <- toks) {
      val isCommon = common.contains(t.term)
      if (prev != null && (prevWasCommon || isCommon)) {
        out += Token(prev.term + Separator + t.term,
          prev.startOffset, t.endOffset, 0, GramType)
      }
      out += t
      prev = t
      prevWasCommon = isCommon
    }
    out.result()
  }

  /** Query-side composition: run [[filter]], then keep each gram (posInc
    * forced to 1) and only the unigrams no gram covers — the reference's
    * previous/previousType state machine. */
  def queryFilter(toks: IndexedSeq[Token], common: Set[String]): Vector[Token] = {
    val grams = filter(toks, common)
    val out = Vector.newBuilder[Token]
    var previous: Token = null
    var previousType: String = null
    for (t <- grams) {
      if (previous != null && t.tokenType != GramType) {
        val emitted = previous
        previousType = emitted.tokenType
        out += (if (emitted.tokenType == GramType) emitted.copy(posInc = 1)
                else emitted)
      }
      previous = t
    }
    if (previous != null && previousType != GramType) {
      out += (if (previous.tokenType == GramType) previous.copy(posInc = 1)
              else previous)
    }
    out.result()
  }
}
