package graft.analysis

import java.util.regex.{Matcher, Pattern}

/** The rest of the reference's `pattern` analysis package (PatternTokenizer
  * lives in `PatternTokenizer.scala`):
  *
  *  - PatternReplaceFilter (per-token regex replace, first or all
  *    occurrences; offsets untouched):
  *    lucene/analysis/common/src/java/org/apache/lucene/analysis/pattern/PatternReplaceFilter.java:40-80
  *  - PatternReplaceCharFilter (whole-text regex replace BEFORE
  *    tokenization, with BaseCharFilter offset correction so token offsets
  *    map back to the original text; corrected offsets are clamped >= 0):
  *    pattern/PatternReplaceCharFilter.java:50-140,
  *    charfilter/BaseCharFilter.java:43-70 (binary-search correct)
  *  - PatternCaptureGroupTokenFilter (one token per capture group per
  *    match, over one or more patterns; groups are consumed in group-index
  *    order per match, interleaved across patterns by match-group start
  *    offset; empty groups and — when preserveOriginal — whole-token
  *    groups are skipped; extra tokens stack at the original's position):
  *    pattern/PatternCaptureGroupTokenFilter.java:94-190
  */
object PatternFilters {

  /** PatternReplaceFilter: replace first (all=false) or all occurrences of
    * `pattern` in each token's term. May produce empty-string terms, same
    * as the reference (the caller decides whether to drop them). */
  def replace(toks: IndexedSeq[Token], pattern: String, replacement: String,
              all: Boolean = true): Vector[Token] = {
    val p = Pattern.compile(pattern)
    toks.iterator.map { t =>
      val m = p.matcher(t.term)
      if (m.find()) {
        val transformed = if (all) m.replaceAll(replacement) else m.replaceFirst(replacement)
        t.copy(term = transformed)
      } else t
    }.toVector
  }

  /** PatternReplaceCharFilter over a fully-buffered text block (the
    * reference buffers all input on first read too —
    * PatternReplaceCharFilter.java:66-80). Returns the transformed text
    * plus the offset-correction function mapping output offsets back to
    * input offsets (clamped at 0, PatternReplaceCharFilter.java:92). */
  def replaceCharFilter(text: String, pattern: String,
                        replacement: String): (String, Int => Int) = {
    val m = Pattern.compile(pattern).matcher(text)
    val out = new StringBuffer()
    val offs = Vector.newBuilder[Int]
    val diffs = Vector.newBuilder[Int]
    var size = 0
    var lastOff = -1
    // BaseCharFilter.addOffCorrectMap: successive offsets non-decreasing;
    // same offset overwrites the previous diff.
    var offArr = new scala.collection.mutable.ArrayBuffer[Int]()
    var diffArr = new scala.collection.mutable.ArrayBuffer[Int]()
    def addOffCorrect(off: Int, cum: Int): Unit = {
      if (offArr.nonEmpty && offArr.last == off) diffArr(diffArr.length - 1) = cum
      else { offArr += off; diffArr += cum }
    }
    var cumulative = 0
    var lastMatchEnd = 0
    while (m.find()) {
      val groupSize = m.end - m.start
      val skipped = m.start - lastMatchEnd
      lastMatchEnd = m.end
      val lengthBefore = out.length + skipped
      m.appendReplacement(out, replacement)
      val replacementSize = out.length - lengthBefore
      if (groupSize != replacementSize) {
        if (replacementSize < groupSize) {
          cumulative += groupSize - replacementSize
          addOffCorrect(lengthBefore + replacementSize, cumulative)
        } else {
          var i = groupSize
          while (i < replacementSize) {
            cumulative -= 1
            addOffCorrect(lengthBefore + i, cumulative)
            i += 1
          }
        }
      }
    }
    m.appendTail(out)
    val offsets = offArr.toArray
    val ds = diffArr.toArray
    val correct: Int => Int = { currentOff =>
      val base =
        if (offsets.isEmpty || currentOff < offsets(0)) currentOff
        else if (currentOff >= offsets(offsets.length - 1)) currentOff + ds(ds.length - 1)
        else {
          var lo = 0; var hi = offsets.length - 1; var mid = -1
          var res = Integer.MIN_VALUE
          while (hi >= lo && res == Integer.MIN_VALUE) {
            mid = (lo + hi) >>> 1
            if (currentOff < offsets(mid)) hi = mid - 1
            else if (currentOff > offsets(mid)) lo = mid + 1
            else res = currentOff + ds(mid)
          }
          if (res != Integer.MIN_VALUE) res
          else if (currentOff < offsets(mid)) { if (mid == 0) currentOff else currentOff + ds(mid - 1) }
          else currentOff + ds(mid)
        }
      math.max(0, base)
    }
    (out.toString, correct)
  }

  /** PatternCaptureGroupTokenFilter. For each input token, emits capture-
    * group tokens per the reference's nextCapture walk; all emitted tokens
    * share the original token's offsets, the first keeps its posInc and
    * the rest stack at posInc=0. */
  def captureGroups(toks: IndexedSeq[Token], preserveOriginal: Boolean,
                    patterns: String*): Vector[Token] = {
    val ps = patterns.map(Pattern.compile).toArray
    val out = Vector.newBuilder[Token]
    toks.foreach { t =>
      val term = t.term
      val matchers: Array[Matcher] = ps.map(_.matcher(term))
      val groupCounts = matchers.map(_.groupCount())
      val currentGroup = Array.fill(ps.length)(-1)
      var currentMatcher = 0 // sentinel "pending" like the reference after a fresh token

      // reference nextCapture(): pick the matcher whose current group
      // starts earliest; advance exhausted matchers to their next find().
      def nextCapture(): Boolean = {
        var minOffset = Integer.MAX_VALUE
        currentMatcher = -1
        var i = 0
        while (i < matchers.length) {
          val matcher = matchers(i)
          if (currentGroup(i) == -1)
            currentGroup(i) = if (matcher.find()) 1 else 0
          if (currentGroup(i) != 0) {
            var continueOuter = false
            var break = false
            while (!break && currentGroup(i) < groupCounts(i) + 1) {
              val start = matcher.start(currentGroup(i))
              val end = matcher.end(currentGroup(i))
              if (start == end || (preserveOriginal && start == 0 && term.length == end)) {
                currentGroup(i) += 1
              } else {
                if (start < minOffset) { minOffset = start; currentMatcher = i }
                break = true
              }
            }
            if (currentGroup(i) == groupCounts(i) + 1) {
              currentGroup(i) = -1
              continueOuter = true // retry same matcher with its next find()
            }
            if (!continueOuter) i += 1
          } else i += 1
        }
        currentMatcher != -1
      }

      if (preserveOriginal) {
        out += t
        while (nextCapture()) {
          val g = currentGroup(currentMatcher)
          val s = matchers(currentMatcher).start(g)
          val e = matchers(currentMatcher).end(g)
          out += t.copy(term = term.substring(s, e), posInc = 0)
          currentGroup(currentMatcher) += 1
        }
      } else {
        if (nextCapture()) {
          val g0 = currentGroup(currentMatcher)
          out += t.copy(term = term.substring(
            matchers(currentMatcher).start(g0), matchers(currentMatcher).end(g0)))
          currentGroup(currentMatcher) += 1
          while (nextCapture()) {
            val g = currentGroup(currentMatcher)
            out += t.copy(term = term.substring(
              matchers(currentMatcher).start(g), matchers(currentMatcher).end(g)), posInc = 0)
            currentGroup(currentMatcher) += 1
          }
        } else out += t
      }
    }
    out.result()
  }
}
