package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** WordDelimiterFilter: splits tokens into subwords on intra-word
  * delimiters, case transitions and letter/number transitions, with
  * optional catenations and original preservation.
  *
  * Reference semantics (reimplemented, not translated):
  *  - flags + emission/posInc rules:
  *    lucene/analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/WordDelimiterFilter.java:94-556
  *  - subword iteration, char classes, possessive and bounds handling:
  *    lucene/analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/WordDelimiterIterator.java:26-331
  *
  * Notable reference quirks preserved (asserted by WordDelimiterSpec
  * against the reference test vectors, TestWordDelimiterFilter.java):
  *  - catenations are buffered with the parts and re-sorted by
  *    (startOffset asc, posInc desc), so "foo-bar" with CATENATE_ALL
  *    emits foo, foobar, bar with posIncs 1, 0, 1;
  *  - a token of only delimiters is dropped but its extra position
  *    increment accumulates onto the next emitted token ("/" with a
  *    10-gap gives the next word posInc 11);
  *  - with PRESERVE_ORIGINAL the first subword after the original is
  *    emitted at posInc 0;
  *  - per-subword English possessive stripping happens during iteration,
  *    so "O'Neil's" yields "O", "Neil".
  */
object WordDelimiter {

  final val GenerateWordParts = 1
  final val GenerateNumberParts = 2
  final val CatenateWords = 4
  final val CatenateNumbers = 8
  final val CatenateAll = 16
  final val PreserveOriginal = 32
  final val SplitOnCaseChange = 64
  final val SplitOnNumerics = 128
  final val StemEnglishPossessive = 256

  /** Solr WordDelimiterFilterFactory defaults: generate word+number parts,
    * split on case change and numerics, stem English possessives. */
  final val SolrDefaults: Int =
    GenerateWordParts | GenerateNumberParts | SplitOnCaseChange |
      SplitOnNumerics | StemEnglishPossessive

  // char classes (bitmask: a char can be both ALPHA and DIGIT only for
  // surrogates, which must never be split apart)
  private final val Lower = 0x01
  private final val Upper = 0x02
  private final val Digit = 0x04
  private final val Delim = 0x08
  private final val Alpha = Lower | Upper

  private def charType(ch: Char): Int = {
    import java.lang.Character._
    getType(ch) match {
      case UPPERCASE_LETTER => Upper
      case LOWERCASE_LETTER => Lower
      case TITLECASE_LETTER | MODIFIER_LETTER | OTHER_LETTER |
           NON_SPACING_MARK | ENCLOSING_MARK | COMBINING_SPACING_MARK => Alpha
      case DECIMAL_DIGIT_NUMBER | LETTER_NUMBER | OTHER_NUMBER => Digit
      case SURROGATE => Alpha | Digit // never split a surrogate pair
      case _ => Delim
    }
  }

  private def isAlpha(t: Int) = (t & Alpha) != 0
  private def isDigit(t: Int) = (t & Digit) != 0
  private def isDelim(t: Int) = (t & Delim) != 0

  /** One subword span [start, end) of the current token text. */
  private final case class Span(start: Int, end: Int)

  /** Split one token's text into subword spans, with reference bounds /
    * possessive semantics. Returns (spans, startBounds, endBounds,
    * hadPossessiveTail) — empty spans means delimiters-only. */
  private def spansOf(text: String, splitCase: Boolean, splitNum: Boolean,
                      stemPoss: Boolean): (Vector[Span], Int, Int) = {
    val len = text.length
    var startBounds = 0
    while (startBounds < len && isDelim(charType(text(startBounds)))) startBounds += 1
    var endBounds = len
    while (endBounds > startBounds && isDelim(charType(text(endBounds - 1)))) endBounds -= 1

    def possessiveAt(pos: Int): Boolean =
      stemPoss && pos > 2 && text(pos - 2) == '\'' &&
        (text(pos - 1) == 's' || text(pos - 1) == 'S') &&
        isAlpha(charType(text(pos - 3))) &&
        (pos == endBounds || isDelim(charType(text(pos))))

    def isBreak(lastType: Int, tpe: Int): Boolean = {
      if ((tpe & lastType) != 0) false
      else if (!splitCase && isAlpha(lastType) && isAlpha(tpe)) false
      else if ((lastType & Upper) != 0 && isAlpha(tpe)) false // UPPER->letter run (e.g. acronym tail)
      else if (!splitNum && ((isAlpha(lastType) && isDigit(tpe)) ||
        (isDigit(lastType) && isAlpha(tpe)))) false
      else true
    }

    val spans = Vector.newBuilder[Span]
    var cur = startBounds
    var skipPossessive = false
    var done = false
    while (!done) {
      if (skipPossessive) { cur += 2; skipPossessive = false }
      var lastType = 0
      while (cur < endBounds && { lastType = charType(text(cur)); isDelim(lastType) }) cur += 1
      if (cur >= endBounds) done = true
      else {
        var end = cur + 1
        var break = false
        while (end < endBounds && !break) {
          val t = charType(text(end))
          if (isBreak(lastType, t)) break = true
          else { lastType = t; end += 1 }
        }
        if (end < endBounds - 1 && possessiveAt(end + 2)) skipPossessive = true
        spans += Span(cur, end)
        cur = end
      }
    }
    (spans.result(), startBounds, endBounds)
  }

  /** Apply the filter to an analyzed token stream. */
  def filter(toks: IndexedSeq[Token], flags: Int,
             protWords: Set[String] = Set.empty): Vector[Token] = {
    def has(f: Int) = (flags & f) != 0
    val splitCase = has(SplitOnCaseChange)
    val splitNum = has(SplitOnNumerics)
    val stemPoss = has(StemEnglishPossessive)

    val out = Vector.newBuilder[Token]
    var accumPosInc = 0
    var first = true

    def emit(t: Token): Unit = { out += t; first = false }

    for (tok <- toks) {
      accumPosInc += tok.posInc
      val text = tok.term
      val len = text.length
      val (spans, _, endBounds) =
        spansOf(text, splitCase, splitNum, stemPoss)
      val hasFinalPossessive = stemPoss && endBounds > 2 &&
        text(endBounds - 2) == '\'' &&
        (text(endBounds - 1) == 's' || text(endBounds - 1) == 'S') &&
        isAlpha(charType(text(endBounds - 3)))
      val startBounds = if (spans.nonEmpty) spans.head.start else len

      if (spans.nonEmpty && spans.head.start == 0 && spans.head.end == len) {
        // whole token is one delimiter-free subword: pass through unchanged
        emit(tok.copy(posInc = accumPosInc)); accumPosInc = 0
      } else if (protWords.contains(text)) {
        emit(tok.copy(posInc = accumPosInc)); accumPosInc = 0
      } else if (spans.isEmpty && !has(PreserveOriginal)) {
        // delimiters only: vanish, but leave any gap in the accumulator
        if (tok.posInc == 1 && !first) accumPosInc -= 1
      } else {
        val illegalOffsets = tok.endOffset - tok.startOffset != len
        var hasOutputToken = false
        var hasOutputFollowingOriginal = !has(PreserveOriginal)

        if (has(PreserveOriginal)) {
          emit(tok.copy(posInc = accumPosInc)); accumPosInc = 0
        }

        // posInc bookkeeping identical to the reference position(inject)
        def position(inject: Boolean): Int = {
          val p = accumPosInc
          if (hasOutputToken) {
            accumPosInc = 0
            if (inject) 0 else math.max(1, p)
          } else {
            hasOutputToken = true
            if (!hasOutputFollowingOriginal) { hasOutputFollowingOriginal = true; 0 }
            else { accumPosInc = 0; math.max(1, p) }
          }
        }

        def partOffsets(s: Span, single: Boolean): (Int, Int) =
          if (illegalOffsets) {
            val so = tok.startOffset + s.start
            if (single && so <= tok.endOffset) (so, tok.endOffset)
            else (tok.startOffset, tok.endOffset)
          } else (tok.startOffset + s.start, tok.startOffset + s.end)

        if (spans.length == 1 && spans.head.start == startBounds &&
          spans.head.end == (if (hasFinalPossessive) endBounds - 2 else endBounds)) {
          // lone subword surrounded by delimiters: always output directly
          val s = spans.head
          val (so, eo) = partOffsets(s, single = true)
          emit(Token(text.substring(s.start, s.end), so, eo,
            position(inject = false), tok.tokenType))
        } else {
          // general case: buffer the parts + catenations, then re-sort
          final case class Part(term: String, so: Int, eo: Int, posInc: Int)
          val buffered = new ArrayBuffer[Part]

          var concatBuf = new StringBuilder
          var concatType = 0
          var concatCount = 0
          var concatSo = 0
          var concatEo = 0
          var lastConcatCount = 0
          val allBuf = new StringBuilder
          var allCount = 0
          var allSo = 0
          var allEo = 0

          def typeOf(s: Span): Int = {
            val t = charType(text(s.start))
            if (isAlpha(t)) Alpha else t
          }
          def shouldConcat(t: Int) =
            (has(CatenateWords) && isAlpha(t)) || (has(CatenateNumbers) && isDigit(t))
          def shouldGenerate(t: Int) =
            (has(GenerateWordParts) && isAlpha(t)) || (has(GenerateNumberParts) && isDigit(t))

          def concatOffsets(so: Int, eo: Int): (Int, Int) =
            if (illegalOffsets) (tok.startOffset, tok.endOffset) else (so, eo)

          /** write-and-clear of the words/numbers run; true if written */
          def flushConcat(): Boolean = {
            lastConcatCount = concatCount
            val keep = concatCount != 1 || !shouldGenerate(concatType)
            if (keep) {
              val (so, eo) = concatOffsets(concatSo, concatEo)
              buffered += Part(concatBuf.toString, so, eo, position(inject = true))
              accumPosInc = 0
            }
            concatBuf = new StringBuilder; concatCount = 0; concatType = 0
            keep
          }

          var i = 0
          while (i < spans.length) {
            val s = spans(i)
            val t = typeOf(s)
            var reprocess = false
            if (concatCount > 0 && (concatType & t) == 0) {
              // incompatible run queued: flush it, then reprocess this span
              if (flushConcat()) reprocess = true
              hasOutputToken = false
            }
            if (!reprocess) {
              if (shouldConcat(t)) {
                if (concatCount == 0) { concatType = t; concatSo = tok.startOffset + s.start }
                concatBuf.append(text.substring(s.start, s.end))
                concatCount += 1
                concatEo = tok.startOffset + s.end
              }
              if (has(CatenateAll)) {
                if (allCount == 0) allSo = tok.startOffset + s.start
                allBuf.append(text.substring(s.start, s.end))
                allCount += 1
                allEo = tok.startOffset + s.end
              }
              if (shouldGenerate(t)) {
                val (so, eo) = partOffsets(s, single = false)
                buffered += Part(text.substring(s.start, s.end), so, eo,
                  position(inject = false))
              }
              i += 1
            }
          }
          if (concatCount > 0) flushConcat()
          if (allCount > 0) {
            if (allCount > lastConcatCount) {
              val (so, eo) = concatOffsets(allSo, allEo)
              buffered += Part(allBuf.toString, so, eo, position(inject = true))
              accumPosInc = 0
            }
          }

          // stable re-sort by (startOffset asc, posInc desc) — the
          // reference's OffsetSorter over the buffered parts
          val sorted = buffered.sortWith { (a, b) =>
            if (a.so != b.so) a.so < b.so else a.posInc > b.posInc
          }
          for (p <- sorted) {
            val pi = if (first && p.posInc == 0) 1 else p.posInc
            emit(Token(p.term, p.so, p.eo, pi, tok.tokenType))
          }
        }
      }
    }
    out.result()
  }
}
