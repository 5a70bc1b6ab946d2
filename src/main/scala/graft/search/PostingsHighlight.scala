package graft.search

import java.text.BreakIterator
import java.util.Locale

/** Passage-model highlighting (reference postingshighlight/
  * PostingsHighlighter.java:97 + PassageScorer.java + Passage.java +
  * DefaultPassageFormatter.java): sentences are miniature documents —
  * each sentence containing a hit scores
  * `norm(start) * sum_term weight(term) * tf(freqInPassage, passageLen)`
  * with the reference's BM25-flavored formulas (k1=1.2, b=0.75,
  * pivot=87), the top N passages are kept (ties prefer the later
  * passage, matching the reference's priority-queue eviction) and
  * returned in document order.
  *
  * Offsets arrive as an argument: the reference reads them from
  * offsets-enabled postings; this engine's postings store positions, so
  * callers supply per-term offset lists computed by the same analyzer
  * that built the index (one pass over the stored text — identical
  * inputs, different storage).
  */
object PostingsHighlight {

  final case class Passage(start: Int, end: Int, score: Float,
                           matches: Vector[(Int, Int)])

  final class Scorer(k1: Float = 1.2f, b: Float = 0.75f,
                     pivot: Float = 87f) {
    def weight(contentLength: Int, totalTermFreq: Int): Float = {
      val numDocs = 1 + contentLength / pivot
      ((k1 + 1) * math.log(1 + (numDocs + 0.5d) / (totalTermFreq + 0.5d))).toFloat
    }
    def tf(freq: Int, passageLen: Int): Float = {
      val norm = k1 * ((1 - b) + b * (passageLen / pivot))
      freq / (freq + norm)
    }
    def norm(passageStart: Int): Float =
      1 + 1 / math.log(pivot + passageStart).toFloat
  }

  /** Top-`maxPassages` passages for `content`, given each query term's
    * in-document offsets (sorted by start). */
  def highlight(content: String,
                termOffsets: Map[String, Array[(Int, Int)]],
                maxPassages: Int,
                scorer: Scorer = new Scorer()): Vector[Passage] = {
    val contentLength = content.length
    val weights: Map[String, Float] = termOffsets.collect {
      case (t, offs) if offs.nonEmpty =>
        t -> scorer.weight(contentLength, offs.length)
    }
    val occs = termOffsets.toSeq
      .flatMap { case (t, offs) => offs.map { case (s, e) => (s, e, t) } }
      .sortBy(_._1)
    if (occs.isEmpty) return Vector.empty

    val bi = BreakIterator.getSentenceInstance(Locale.ROOT)
    bi.setText(content)

    // group occurrences into sentence passages
    val passages = Vector.newBuilder[Passage]
    var i = 0
    var pStart = -1
    var pEnd = -1
    var pMatches = Vector.empty[(Int, Int)]
    var pTerms = Map.empty[String, Int]
    def finish(): Unit = if (pStart >= 0) {
      val len = pEnd - pStart
      val sum = pTerms.iterator
        .map { case (t, f) => weights(t) * scorer.tf(f, len) }.sum
      passages += Passage(pStart, pEnd,
        (sum * scorer.norm(pStart)).toFloat, pMatches)
    }
    while (i < occs.length) {
      val (s, e, t) = occs(i)
      if (s >= pEnd) {
        finish()
        pStart = math.max(bi.preceding(s + 1), 0)
        pEnd = math.min({ val n = bi.next(); if (n < 0) contentLength else n },
          contentLength)
        pMatches = Vector.empty
        pTerms = Map.empty
      }
      pMatches :+= (s -> math.min(e, pEnd))
      pTerms = pTerms.updated(t, pTerms.getOrElse(t, 0) + 1)
      i += 1
    }
    finish()

    // keep the N best (ties keep the LATER passage, like the reference's
    // eviction order), then restore document order
    passages.result()
      .sortBy(p => (-p.score, -p.start))
      .take(maxPassages)
      .sortBy(_.start)
  }

  /** DefaultPassageFormatter.format: passage text with matches wrapped in
    * &lt;b&gt;&lt;/b&gt;, overlapping matches merged. */
  def format(content: String, p: Passage,
             pre: String = "<b>", post: String = "</b>"): String = {
    val sb = new java.lang.StringBuilder
    var pos = p.start
    p.matches.foreach { case (s, e) =>
      if (e > pos) {
        val ms = math.max(s, pos)
        sb.append(content, pos, ms).append(pre)
          .append(content, ms, e).append(post)
        pos = e
      }
    }
    sb.append(content, pos, p.end)
    sb.toString
  }
}
