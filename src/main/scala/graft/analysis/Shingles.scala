package graft.analysis

/** ShingleFilter: token n-grams ("word shingles") overlaid on the stream.
  *
  * Reference semantics (pinned by the reference's own vector suite,
  * mirrored in ShingleSpec):
  * lucene/analysis/common/src/java/org/apache/lucene/analysis/shingle/ShingleFilter.java:45-120
  *
  * Model: tokens occupy positions; a hole of posInc=k inserts
  * min(k-1, maxShingleSize-1) filler slots ("_") whose offsets collapse
  * to the NEXT real token's startOffset. Then at each slot position p,
  * in order:
  *   - the unigram, if the slot is real and outputUnigrams (type kept);
  *   - shingles of size minShingleSize..maxShingleSize over slots
  *     p..p+s-1 (must fit entirely; all-filler shingles are skipped),
  *     joined by `separator`, type "shingle", offsets spanning first
  *     slot start to last slot end.
  * The first token emitted at position p advances the position; the rest
  * emit posInc=0. If outputUnigrams=false and no shingle was produced
  * for the whole stream, outputUnigramsIfNoShingles replays the unigrams.
  */
object Shingles {

  final val FillerToken = "_"
  final val ShingleType = "shingle"

  def filter(toks: IndexedSeq[Token],
             minShingleSize: Int = 2,
             maxShingleSize: Int = 2,
             outputUnigrams: Boolean = true,
             outputUnigramsIfNoShingles: Boolean = false,
             separator: String = " "): Vector[Token] = {
    require(minShingleSize >= 2, "Min shingle size must be >= 2")
    require(maxShingleSize >= minShingleSize,
      "Max shingle size must be >= min shingle size")

    // ---- build the slot array (real tokens + capped fillers) ----
    final case class Slot(term: String, start: Int, end: Int, real: Boolean,
                          tokenType: String)
    val slots = Vector.newBuilder[Slot]
    for (t <- toks) {
      val fillers = math.min(t.posInc - 1, maxShingleSize - 1)
      var f = 0
      while (f < fillers) {
        slots += Slot(FillerToken, t.startOffset, t.startOffset,
          real = false, "filler")
        f += 1
      }
      slots += Slot(t.term, t.startOffset, t.endOffset, real = true, t.tokenType)
    }
    val s = slots.result()
    val n = s.length

    val out = Vector.newBuilder[Token]
    var producedShingle = false
    var lastPos = -1 // position of the previously emitted token
    var p = 0
    while (p < n) {
      var emittedAtP = false
      def inc(): Int =
        if (emittedAtP) 0
        else { val d = p - lastPos; lastPos = p; emittedAtP = true; d }
      if (s(p).real && outputUnigrams) {
        out += Token(s(p).term, s(p).start, s(p).end, inc(), s(p).tokenType)
      }
      var size = minShingleSize
      while (size <= maxShingleSize && p + size <= n) {
        val window = s.slice(p, p + size)
        if (window.exists(_.real)) {
          out += Token(window.iterator.map(_.term).mkString(separator),
            window.head.start, window.last.end, inc(), ShingleType)
          producedShingle = true
        }
        size += 1
      }
      // if nothing was emitted at p (filler slot with no fitting shingle)
      // the position still advances: the next emission's delta spans it
      p += 1
    }
    if (!outputUnigrams && !producedShingle && outputUnigramsIfNoShingles)
      toks.toVector
    else out.result()
  }
}
