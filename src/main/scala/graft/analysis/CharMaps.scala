package graft.analysis

import scala.collection.mutable

/** MappingCharFilter + NormalizeCharMap (reference
  * lucene/analysis/common/src/java/org/apache/lucene/analysis/charfilter/
  * MappingCharFilter.java:80-176, NormalizeCharMap.java:84-110): greedy
  * longest-pattern-wins replacement over the raw character stream BEFORE
  * tokenization, replacements never rescanned, with BaseCharFilter offset
  * corrections so token offsets map back to the original text
  * (BaseCharFilter.java:43-110).
  *
  * The reference compiles the map to an FST over UTF-16 code units
  * (NormalizeCharMap.Builder, FST.INPUT_TYPE.BYTE2 + Util.toUTF16); a plain
  * char trie walked with the same greedy "remember last final state, keep
  * extending" loop (MappingCharFilter.java:100-140) is match-identical.
  */
object CharMaps {

  /** Compiled normalize-char map: a char trie over UTF-16 code units. */
  final class NormMap private[CharMaps] (
      private[CharMaps] val root: NormMap.Node) extends Serializable

  object NormMap {
    private[CharMaps] final class Node extends Serializable {
      val children = new mutable.HashMap[Char, Node]()
      /** Replacement when a pattern ends here; null = not final. */
      var out: String = null
    }

    /** NormalizeCharMap.Builder.add semantics: empty match and duplicate
      * match both rejected (NormalizeCharMap.java:97-104). */
    def apply(pairs: (String, String)*): NormMap = {
      val root = new Node
      val seen = new mutable.HashSet[String]()
      pairs.foreach { case (m, rep) =>
        require(m.nonEmpty, "cannot match the empty string")
        require(seen.add(m), s"""match "$m" was already added""")
        var n = root
        var i = 0
        while (i < m.length) {
          n = n.children.getOrElseUpdate(m.charAt(i), new Node)
          i += 1
        }
        n.out = rep
      }
      new NormMap(root)
    }
  }

  /** Apply the map to a fully-buffered text block. Returns the transformed
    * text plus the offset-correction function mapping output offsets back
    * to input offsets (BaseCharFilter.correct, no clamping). */
  def mappingCharFilter(text: String, map: NormMap): (String, Int => Int) = {
    val out = new java.lang.StringBuilder(text.length)
    val offArr = new mutable.ArrayBuffer[Int]()
    val diffArr = new mutable.ArrayBuffer[Int]()
    // BaseCharFilter.addOffCorrectMap: non-decreasing offsets; a repeated
    // offset overwrites the previous diff (BaseCharFilter.java:100-108).
    def addOffCorrect(off: Int, cum: Int): Unit =
      if (offArr.nonEmpty && offArr.last == off) diffArr(diffArr.length - 1) = cum
      else { offArr += off; diffArr += cum }

    var inputOff = 0
    while (inputOff < text.length) {
      // Greedy longest match starting at inputOff (MappingCharFilter.java:
      // 100-140: keep extending past final states, remember the last one).
      var lastMatchLen = -1
      var lastMatch: String = null
      var node = map.root.children.getOrElse(text.charAt(inputOff), null)
      var lookahead = 0
      while (node != null) {
        lookahead += 1
        if (node.out != null) { lastMatchLen = lookahead; lastMatch = node.out }
        node =
          if (inputOff + lookahead >= text.length) null
          else node.children.getOrElse(text.charAt(inputOff + lookahead), null)
      }
      if (lastMatch != null) {
        // Offset bookkeeping exactly as MappingCharFilter.java:146-166,
        // rewritten in output coordinates (out.length == the reference's
        // inputOff - prevCumulativeDiff at match start).
        val diff = lastMatchLen - lastMatch.length
        if (diff != 0) {
          val prevCum = if (diffArr.isEmpty) 0 else diffArr.last
          if (diff > 0) {
            // Replacement shorter: one correction just past the replacement.
            addOffCorrect(out.length + lastMatch.length, prevCum + diff)
          } else {
            // Replacement longer: remap each extra output char back to the
            // match's input end.
            var e = 0
            while (e < -diff) {
              addOffCorrect(out.length + lastMatchLen + e, prevCum - e - 1)
              e += 1
            }
          }
        }
        out.append(lastMatch)
        inputOff += lastMatchLen
      } else {
        out.append(text.charAt(inputOff))
        inputOff += 1
      }
    }

    val offsets = offArr.toArray
    val ds = diffArr.toArray
    val correct: Int => Int = { currentOff =>
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
        else if (currentOff < offsets(mid)) {
          if (mid == 0) currentOff else currentOff + ds(mid - 1)
        } else currentOff + ds(mid)
      }
    }
    (out.toString, correct)
  }

  /** Convenience: build + apply in one call. */
  def mappingCharFilter(text: String, pairs: (String, String)*): (String, Int => Int) =
    mappingCharFilter(text, NormMap(pairs: _*))
}
