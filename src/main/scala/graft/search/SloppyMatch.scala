package graft.search

/** Per-document sloppy-phrase matching — a faithful port of the reference's
  * pq-walk (search/SloppyPhraseScorer.java:96-255, search/PhraseQueue.java:28,
  * search/PhrasePositions.java:41): each phrase slot holds a cursor over its
  * term's sorted positions, adjusted by the slot's query offset; the walk
  * repeatedly advances the least cursor, and every time the minimum "crosses"
  * the next-least cursor it scores the minimized window `end - min` as a
  * match when <= slop, accumulating the reference's slop factor
  * 1/(1+matchLength) (BM25Similarity.java sloppyFreq) into the phrase freq.
  *
  * Repeated phrase terms ("my ho my"~2) use the reference's repeat-group
  * machinery (SloppyPhraseScorer.java:144-181 advanceRpts / :283-310
  * advanceRepeatGroups): slots of one term form a group sorted by query
  * offset; at init the j-th group member starts at the term's j-th
  * occurrence, and after every advance a position collision (two slots on
  * one doc occurrence) is resolved by advancing the lesser slot, re-heaping
  * any colliders that sat in the queue. Groups here are keyed on term
  * equality — the reference derives them from first-doc position collisions
  * (gatherRptGroups, :340-360), which is the same thing whenever distinct
  * terms don't share a doc position.
  *
  * The walk is intentionally the reference's approximation: not every valid
  * combination is counted (SloppyPhraseScorer.java:75-92's own caveat), so
  * matching THIS walk — quirks included — is what reference parity means.
  */
object SloppyMatch {

  private final class Pp(val ord: Int, val offset: Int,
                         val positions: Array[Int]) {
    var idx: Int = -1
    var position: Int = 0
    var rptGroup: Int = -1
    var rptInd: Int = 0
    def nextPosition(): Boolean = {
      idx += 1
      if (idx < positions.length) { position = positions(idx) - offset; true }
      else false
    }
  }

  /** PhraseQueue.lessThan: (position, offset, ord). */
  private def less(a: Pp, b: Pp): Boolean =
    if (a.position == b.position)
      if (a.offset == b.offset) a.ord < b.ord else a.offset < b.offset
    else a.position < b.position

  /** Phrase freq for one document: sum of 1/(1+matchLength) over the
    * matches the reference walk encounters; 0 when no window fits the
    * slop. `byTerm(i)` is slot i's sorted position list, `rel(i)` its
    * query offset, `rptSlots` the slot-index groups that share one term
    * (each length >= 2; empty for a repeat-free phrase). */
  def freq(byTerm: Array[Array[Int]], rel: Array[Int], slop: Int,
           rptSlots: Array[Array[Int]] = Array.empty): Float = {
    val n = byTerm.length
    val pps = Array.tabulate(n)(i => new Pp(i, rel(i), byTerm(i)))

    // repeat groups: slots sharing a term, sorted by query offset
    val groups: Array[Array[Pp]] =
      rptSlots.map(_.map(pps).sortBy(_.offset))
    var g = 0
    while (g < groups.length) {
      var j = 0
      while (j < groups(g).length) {
        groups(g)(j).rptGroup = g; groups(g)(j).rptInd = j; j += 1
      }
      g += 1
    }
    val hasRpts = groups.nonEmpty

    // ---- binary heap of slot cursors (PhraseQueue) ----
    val heap = new Array[Pp](n)
    var heapSize = 0
    def heapAdd(pp: Pp): Unit = {
      var i = heapSize; heap(i) = pp; heapSize += 1
      while (i > 0 && less(heap(i), heap((i - 1) / 2))) {
        val p = (i - 1) / 2
        val t = heap(i); heap(i) = heap(p); heap(p) = t; i = p
      }
    }
    def heapPop(): Pp = {
      val top = heap(0)
      heapSize -= 1
      heap(0) = heap(heapSize)
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < heapSize && less(heap(l), heap(m))) m = l
        if (r < heapSize && less(heap(r), heap(m))) m = r
        if (m == i) done = true
        else { val t = heap(i); heap(i) = heap(m); heap(m) = t; i = m }
      }
      top
    }

    var end = Int.MinValue
    def advancePP(pp: Pp): Boolean = {
      if (!pp.nextPosition()) return false
      if (pp.position > end) end = pp.position
      true
    }
    def tpPos(pp: Pp): Int = pp.position + pp.offset
    def collide(pp: Pp): Int = {
      val rg = groups(pp.rptGroup)
      val t = tpPos(pp)
      var i = 0
      while (i < rg.length) {
        if ((rg(i) ne pp) && tpPos(rg(i)) == t) return rg(i).rptInd
        i += 1
      }
      -1
    }

    // ---- init (initComplex path; fresh per doc, so no first-doc cache) ----
    var i = 0
    while (i < n) { if (!pps(i).nextPosition()) return 0f; i += 1 }
    if (hasRpts) {
      // advanceRepeatGroups, single-term case: j-th member advances j times
      g = 0
      while (g < groups.length) {
        var j = 1
        while (j < groups(g).length) {
          var k = 0
          while (k < j) {
            if (!groups(g)(j).nextPosition()) return 0f
            k += 1
          }
          j += 1
        }
        g += 1
      }
    }
    i = 0
    while (i < n) {
      if (pps(i).position > end) end = pps(i).position
      heapAdd(pps(i)); i += 1
    }

    // advanceRpts (SloppyPhraseScorer.java:144-181), incl. the re-queue
    // dance that restores heap order for colliders already in the queue
    def advanceRpts(pp0: Pp): Boolean = {
      var pp = pp0
      if (pp.rptGroup < 0) return true
      val rg = groups(pp.rptGroup)
      val marked = new java.util.BitSet(rg.length)
      val k0 = pp.rptInd
      var k = collide(pp)
      while (k >= 0) {
        pp = if (less(pp, rg(k))) pp else rg(k) // lesser() ignores ord; ties keep rg(k)
        if (!advancePP(pp)) return false
        if (k != k0) marked.set(k)
        k = collide(pp)
      }
      val stack = new Array[Pp](n)
      var nStk = 0
      while (marked.cardinality() > 0) {
        val pp2 = heapPop()
        stack(nStk) = pp2; nStk += 1
        if (pp2.rptGroup >= 0 && marked.get(pp2.rptInd)) marked.clear(pp2.rptInd)
      }
      var s = nStk - 1
      while (s >= 0) { heapAdd(stack(s)); s -= 1 }
      true
    }

    // ---- the walk (phraseFreq, SloppyPhraseScorer.java:96-135) ----
    var freq = 0f
    var pp = heapPop()
    var matchLength = end - pp.position
    var next = heap(0).position
    var exhausted = false
    while (!exhausted && advancePP(pp)) {
      if (hasRpts && !advanceRpts(pp)) exhausted = true
      else if (pp.position > next) { // done minimizing current match length
        if (matchLength <= slop) freq += 1f / (matchLength + 1)
        heapAdd(pp)
        pp = heapPop()
        next = heap(0).position
        matchLength = end - pp.position
      } else {
        val ml2 = end - pp.position
        if (ml2 < matchLength) matchLength = ml2
      }
    }
    if (matchLength <= slop) freq += 1f / (matchLength + 1)
    freq
  }
}
