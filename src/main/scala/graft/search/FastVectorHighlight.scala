package graft.search

import scala.collection.mutable

/** FastVectorHighlighter — the reference's term-vector-driven, phrase-aware
  * highlighter (highlighter/src/java/.../vectorhighlight/
  * FastVectorHighlighter.java:33, FieldQuery.java:47, FieldTermStack.java:75,
  * FieldPhraseList.java:65, BaseFragListBuilder.java:49,
  * BaseFragmentsBuilder.java:171, SimpleBoundaryScanner.java:59,
  * ScoreOrderFragmentsBuilder.java:59).
  *
  * Unlike the re-analysis Highlighter or the passage-model
  * PostingsHighlighter, FVH matches PHRASES exactly: the query is compiled
  * into a term trie (QueryPhraseMap), the document's query-relevant tokens
  * form a position-sorted stack (the reference reads them from term vectors;
  * this engine re-derives them with the same analyzer that built the index —
  * identical inputs, different storage), and the longest-prefix walk over
  * the stack emits WeightedPhraseInfo matches. Fragments of `fragCharSize`
  * chars are then centered on the matches (margin 6, boundary-snapped) and
  * ordered by score.
  *
  * Spark shape: highlighting is per-hit — the distributed work is the top-k
  * search producing the docs to highlight; this formatter then runs over the
  * bounded k rows (inside `flatMap`/`map` on the hit frame, never a corpus
  * scan). At 100 TB the cost is k fragments, not the corpus.
  */
object FastVectorHighlight {

  /** A flattened query clause (FieldQuery.flatten output): a term or a
    * multi-term phrase. Single-term phrases are normalized to terms. */
  sealed trait Flat { def boost: Float }
  final case class FlatTerm(term: String, boost: Float = 1f) extends Flat
  final case class FlatPhrase(terms: Vector[String], slop: Int = 0,
                              boost: Float = 1f) extends Flat

  /** One analyzed token of the document being highlighted. */
  final case class Token(term: String, pos: Int, start: Int, end: Int)

  /** FieldTermStack.TermInfo: term occurrence + classic-idf weight, with
    * the same-position circular ring (posInc=0 tokens, e.g. synonyms). */
  final class TermInfo(val text: String, val start: Int, val end: Int,
                       val pos: Int, val weight: Float) {
    var next: TermInfo = this
  }

  /** QueryPhraseMap: trie node over query terms; terminal nodes carry the
    * phrase's slop/boost and its registration number (tag cycling). */
  final class PhraseMap {
    val subMap = mutable.HashMap.empty[String, PhraseMap]
    var terminal = false
    var slop = 0
    var boost = 1f
    var seqnum = 0
  }

  /** FieldQuery (fieldMatch=false): expand overlapping phrases, collect the
    * term set, build the QueryPhraseMap trie. With phraseHighlight=false a
    * phrase additionally registers each of its terms (FieldQuery.java:74-80)
    * so individual occurrences highlight too. */
  final class FieldQuery(flat: Seq[Flat], phraseHighlight: Boolean = true) {
    private var seqCounter = 0
    val root = new PhraseMap

    private val flatQ: Vector[Flat] = flat.toVector.map {
      case FlatPhrase(ts, _, b) if ts.size == 1 => FlatTerm(ts.head, b)
      case q => q
    }.distinct

    val termSet: Set[String] = flatQ.flatMap {
      case FlatTerm(t, _)       => Vector(t)
      case FlatPhrase(ts, _, _) => ts
    }.toSet

    /** expand (FieldQuery.java:171-241): flatQueries + phrases merged from
      * every overlapping same-slop phrase pair, both directions. */
    private def expand(qs: Vector[Flat]): Vector[Flat] = {
      val out = mutable.LinkedHashSet.empty[Flat]
      for (i <- qs.indices) {
        out += qs(i)
        qs(i) match {
          case a: FlatPhrase =>
            for (j <- i + 1 until qs.length) qs(j) match {
              case b: FlatPhrase if a.slop == b.slop =>
                overlapMerge(out, a.terms, b.terms, a.slop, a.boost)
                overlapMerge(out, b.terms, a.terms, b.slop, b.boost)
              case _ =>
            }
          case _ =>
        }
      }
      out.toVector
    }

    private def overlapMerge(out: mutable.LinkedHashSet[Flat],
                             src: Vector[String], dest: Vector[String],
                             slop: Int, boost: Float): Unit = {
      var i = 1
      while (i < src.length) {
        var overlap = true
        var j = i
        while (j < src.length && overlap) {
          if (j - i < dest.length && src(j) != dest(j - i)) overlap = false
          j += 1
        }
        if (overlap && src.length - i < dest.length)
          out += FlatPhrase(src ++ dest.drop(src.length - i), slop, boost)
        i += 1
      }
    }

    expand(flatQ).foreach {
      case FlatTerm(t, b) => addTerm(t, b)
      case FlatPhrase(ts, slop, b) =>
        var m = root
        ts.foreach(t => m = m.subMap.getOrElseUpdate(t, new PhraseMap))
        m.terminal = true; m.slop = slop; m.boost = b
        m.seqnum = seqCounter; seqCounter += 1
        if (!phraseHighlight) ts.foreach(t => addTerm(t, b))
    }

    private def addTerm(t: String, b: Float): Unit = {
      val m = root.subMap.getOrElseUpdate(t, new PhraseMap)
      m.terminal = true; m.slop = 0; m.boost = b
      m.seqnum = seqCounter; seqCounter += 1
    }

    /** isValidTermOrPhrase: terminal, and every adjacent position gap
      * within the terminal's slop (FieldQuery.java:446-462). */
    def isValid(m: PhraseMap, cand: collection.Seq[TermInfo]): Boolean = {
      if (!m.terminal) return false
      if (cand.size == 1) return true
      var pos = cand.head.pos
      var i = 1
      while (i < cand.size) {
        val nextPos = cand(i).pos
        if (math.abs(nextPos - pos - 1) > m.slop) return false
        pos = nextPos
        i += 1
      }
      true
    }

    /** searchPhrase: re-walk the trie over a shortened candidate. */
    def searchPhrase(cand: collection.Seq[TermInfo]): PhraseMap = {
      var m = root
      cand.foreach { ti =>
        m.subMap.get(ti.text) match {
          case Some(n) => m = n
          case None    => return null
        }
      }
      if (isValid(m, cand)) m else null
    }
  }

  /** FieldTermStack: the document's query-relevant tokens, position-sorted,
    * same-position runs ring-linked with only the first on the stack.
    * Weight is the classic idf `log(numDocs/(df+1)) + 1`
    * (FieldTermStack.java:111). */
  def termStack(tokens: Seq[Token], fq: FieldQuery, numDocs: Long,
                dfOf: String => Long): mutable.ArrayDeque[TermInfo] = {
    // term-sorted vector iteration then a stable position sort = order by
    // (pos, term), like the reference
    val infos = tokens.iterator.filter(t => fq.termSet(t.term)).toArray
      .sortBy(t => (t.pos, t.term))
      .map(t => new TermInfo(t.term, t.start, t.end, t.pos,
        (math.log(numDocs / (dfOf(t.term) + 1).toDouble) + 1.0).toFloat))
    val stack = mutable.ArrayDeque.empty[TermInfo]
    var i = 0
    while (i < infos.length) {
      var j = i
      while (j + 1 < infos.length && infos(j + 1).pos == infos(i).pos) j += 1
      var k = i
      while (k <= j) { infos(k).next = infos(if (k == j) i else k + 1); k += 1 }
      stack += infos(i)
      i = j + 1
    }
    stack
  }

  /** A term-offset range inside a match; consecutive-position terms fuse
    * into one range (WeightedPhraseInfo constructor, :249-259). */
  final case class Toffs(start: Int, var end: Int)

  /** FieldPhraseList.WeightedPhraseInfo. `termsInfos` grows when an
    * overlapping later match is folded in (addIfNoOverlap, :175-185). */
  final class WeightedPhraseInfo(terms: collection.Seq[TermInfo],
                                 val boost: Float, val seqnum: Int) {
    val termsInfos: mutable.ArrayBuffer[TermInfo] =
      mutable.ArrayBuffer.from(terms)
    val termsOffsets: Vector[Toffs] = {
      val b = Vector.newBuilder[Toffs]
      var cur = Toffs(terms.head.start, terms.head.end)
      var pos = terms.head.pos
      terms.drop(1).foreach { ti =>
        if (ti.pos - pos == 1) cur.end = ti.end
        else { b += cur; cur = Toffs(ti.start, ti.end) }
        pos = ti.pos
      }
      b += cur
      b.result()
    }
    def text: String = termsInfos.map(_.text).mkString
    def startOffset: Int = termsOffsets.head.start
    def endOffset: Int = termsOffsets.last.end
    def overlaps(o: WeightedPhraseInfo): Boolean = {
      val so = startOffset; val eo = endOffset
      val oso = o.startOffset; val oeo = o.endOffset
      (so <= oso && oso < eo) || (so < oeo && oeo <= eo) ||
        (oso <= so && so < oeo) || (oso < eo && eo <= oeo)
    }
  }

  /** FieldPhraseList: longest-prefix phrase walk over the term stack with
    * the reference's push-back retry and same-position ring probing
    * (FieldPhraseList.java:65-124). */
  def phraseList(stack: mutable.ArrayDeque[TermInfo], fq: FieldQuery,
                 phraseLimit: Int = Int.MaxValue)
      : mutable.ArrayBuffer[WeightedPhraseInfo] = {
    val out = mutable.ArrayBuffer.empty[WeightedPhraseInfo]
    def pop(): TermInfo = if (stack.isEmpty) null else stack.removeHead()

    def addIfNoOverlap(wpi: WeightedPhraseInfo): Unit = {
      out.find(_.overlaps(wpi)) match {
        case Some(exist) => exist.termsInfos ++= wpi.termsInfos
        case None        => out += wpi
      }
    }

    val cand = mutable.ArrayBuffer.empty[TermInfo]
    while (stack.nonEmpty && out.length < phraseLimit) {
      cand.clear()
      var first = pop()
      var ti = first
      var currMap = fq.root.subMap.getOrElse(ti.text, null)
      while (currMap == null && (ti.next ne first)) {
        ti = ti.next
        currMap = fq.root.subMap.getOrElse(ti.text, null)
      }
      if (currMap != null) {
        cand += ti
        var done = false
        while (!done) {
          first = pop(); ti = first
          var nextMap: PhraseMap = null
          if (ti != null) {
            nextMap = currMap.subMap.getOrElse(ti.text, null)
            while (nextMap == null && (ti.next ne first)) {
              ti = ti.next
              nextMap = currMap.subMap.getOrElse(ti.text, null)
            }
          }
          if (ti == null || nextMap == null) {
            if (ti != null) stack.prepend(ti)
            if (fq.isValid(currMap, cand))
              addIfNoOverlap(
                new WeightedPhraseInfo(cand, currMap.boost, currMap.seqnum))
            else {
              var broke = false
              while (cand.length > 1 && !broke) {
                stack.prepend(cand.remove(cand.length - 1))
                val m = fq.searchPhrase(cand)
                if (m != null) {
                  addIfNoOverlap(new WeightedPhraseInfo(cand, m.boost, m.seqnum))
                  broke = true
                }
              }
            }
            done = true
          } else { cand += ti; currMap = nextMap }
        }
      }
    }
    out
  }

  /** One highlight-able fragment: char span + the matches inside it. */
  final case class SubInfo(text: String, termsOffsets: Vector[Toffs],
                           seqnum: Int, boost: Float)
  final case class FragInfo(start: Int, end: Int, subInfos: Vector[SubInfo],
                            totalBoost: Float)

  /** BaseFragListBuilder.createFieldFragList (:49-99): greedy left-to-right
    * fragment assembly, match-centering re-margin, acceptPhrase gate.
    * `weighted` picks WeightedFieldFragList scoring (distinct-term
    * idf*boost, sqrt-length norm — WeightedFieldFragList.java:46-78) over
    * SimpleFieldFragList's plain boost sum. */
  def fragList(phrases: collection.Seq[WeightedPhraseInfo], fragCharSize: Int,
               margin: Int = 6, weighted: Boolean = true): Vector[FragInfo] = {
    val minFragCharSize = math.max(1, margin * 3)
    require(fragCharSize >= minFragCharSize,
      s"fragCharSize($fragCharSize) is too small. It must be $minFragCharSize or higher.")
    val out = Vector.newBuilder[FragInfo]
    val it = phrases.iterator.buffered
    var startOffset = 0
    while (it.hasNext) {
      if (it.head.startOffset < startOffset) it.next() // violates prev border
      else {
        val wpil = mutable.ArrayBuffer.empty[WeightedPhraseInfo]
        val phraseStart = it.head.startOffset
        var phraseEnd = it.head.endOffset
        var spanStart = math.max(phraseStart - margin, startOffset)
        var spanEnd = math.max(phraseEnd, spanStart + fragCharSize)
        val head = it.next()
        if (acceptPhrase(head, phraseEnd - phraseStart, fragCharSize))
          wpil += head
        var break = false
        while (it.hasNext && !break) {
          if (it.head.endOffset <= spanEnd) {
            phraseEnd = it.head.endOffset
            val p = it.next()
            if (acceptPhrase(p, phraseEnd - phraseStart, fragCharSize))
              wpil += p
          } else break = true
        }
        if (wpil.nonEmpty) {
          val matchLen = phraseEnd - phraseStart
          val newMargin = math.max(0, (fragCharSize - matchLen) / 2)
          spanStart = phraseStart - newMargin
          if (spanStart < startOffset) spanStart = startOffset
          spanEnd = spanStart + math.max(matchLen, fragCharSize)
          startOffset = spanEnd
          out += makeFragInfo(spanStart, spanEnd, wpil, weighted)
        }
      }
    }
    out.result()
  }

  private def acceptPhrase(info: WeightedPhraseInfo, matchLength: Int,
                           fragCharSize: Int): Boolean =
    info.termsOffsets.size <= 1 || matchLength <= fragCharSize

  private def makeFragInfo(start: Int, end: Int,
                           wpil: collection.Seq[WeightedPhraseInfo],
                           weighted: Boolean): FragInfo =
    if (!weighted) {
      val subs = wpil.map(p =>
        SubInfo(p.text, p.termsOffsets, p.seqnum, p.boost)).toVector
      FragInfo(start, end, subs, subs.map(_.boost).sum)
    } else {
      val distinct = mutable.HashSet.empty[String]
      var length = 0
      val temp = wpil.map { p =>
        var phraseTotalBoost = 0f
        p.termsInfos.foreach { ti =>
          if (distinct.add(ti.text)) phraseTotalBoost += ti.weight * p.boost
          length += 1
        }
        SubInfo(p.text, p.termsOffsets, p.seqnum, phraseTotalBoost)
      }
      val norm = length * (1 / math.sqrt(length).toFloat)
      var total = 0f
      val subs = temp.map { s =>
        val b = s.boost * norm; total += b; s.copy(boost = b)
      }.toVector
      FragInfo(start, end, subs, total)
    }

  // SimpleBoundaryScanner (SimpleBoundaryScanner.java:59-91)
  private val BoundaryChars = Set('.', ',', '!', '?', ' ', '\t', '\n')

  private def findStartOffset(buffer: String, start: Int, maxScan: Int): Int = {
    if (start > buffer.length || start < 1) return start
    var offset = start
    var count = maxScan
    while (offset > 0 && count > 0) {
      if (BoundaryChars(buffer.charAt(offset - 1))) return offset
      offset -= 1; count -= 1
    }
    if (offset == 0) 0 else start
  }

  private def findEndOffset(buffer: String, start: Int, maxScan: Int): Int = {
    if (start > buffer.length || start < 0) return start
    var offset = start
    var count = maxScan
    while (offset < buffer.length && count > 0) {
      if (BoundaryChars(buffer.charAt(offset))) return offset
      offset += 1; count -= 1
    }
    start
  }

  /** BaseFragmentsBuilder.createFragments + makeFragment for a
    * single-valued stored field: boundary-snap the span, wrap every match
    * in pre/post tags. `scoreOrder` = ScoreOrderFragmentsBuilder (boost
    * desc, startOffset asc ties); false keeps document order. */
  def createFragments(content: String, frags: Vector[FragInfo],
                      maxNumFragments: Int, preTag: String = "<b>",
                      postTag: String = "</b>", scoreOrder: Boolean = true,
                      maxScan: Int = 20): Vector[String] = {
    require(maxNumFragments >= 0,
      s"maxNumFragments($maxNumFragments) must be positive number.")
    val ordered =
      if (scoreOrder) frags.sortBy(f => (-f.totalBoost, f.start)) else frags
    // the source assembly appends the multi-valued separator, then ignores
    // it for the tokenized length (getFragmentSourceMSO, :192-206)
    val buffer = content + " "
    val bufferLength = content.length
    ordered.take(maxNumFragments).map { f =>
      val eo =
        if (bufferLength < f.end) bufferLength
        else findEndOffset(buffer, f.end, maxScan)
      val mso = findStartOffset(buffer, f.start, maxScan)
      val src = buffer.substring(mso, eo)
      val sb = new java.lang.StringBuilder
      var srcIndex = 0
      f.subInfos.foreach { si =>
        si.termsOffsets.foreach { to =>
          sb.append(src, srcIndex, to.start - mso)
            .append(preTag)
            .append(src, to.start - mso, to.end - mso)
            .append(postTag)
          srcIndex = to.end - mso
        }
      }
      sb.append(src, srcIndex, src.length)
      sb.toString
    }
  }

  /** The FastVectorHighlighter.getBestFragments composition: stack ->
    * phrase list -> frag list -> formatted fragments. */
  def bestFragments(tokens: Seq[Token], content: String, flat: Seq[Flat],
                    fragCharSize: Int, maxNumFragments: Int,
                    numDocs: Long = 1L, dfOf: String => Long = _ => 0L,
                    phraseHighlight: Boolean = true,
                    weighted: Boolean = true, scoreOrder: Boolean = true,
                    preTag: String = "<b>", postTag: String = "</b>")
      : Vector[String] = {
    val fq = new FieldQuery(flat, phraseHighlight)
    val stack = termStack(tokens, fq, numDocs, dfOf)
    val fpl = phraseList(stack, fq)
    val ffl = fragList(fpl, fragCharSize, weighted = weighted)
    createFragments(content, ffl, maxNumFragments, preTag, postTag, scoreOrder)
  }
}
