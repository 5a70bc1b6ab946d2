package graft.analysis

/** Dictionary-driven compound-word decomposition (reference:
  * lucene/analysis/common/src/java/org/apache/lucene/analysis/compound/
  * DictionaryCompoundWordTokenFilter.java:1 +
  * CompoundWordTokenFilterBase.java). For each token at least
  * `minWordSize` long, every dictionary word found as a substring (with
  * `minSubwordSize <= len <= maxSubwordSize`) is emitted as an extra
  * token at the SAME position (posInc=0), keeping the original. The
  * subword text is the matching SUBSTRING OF THE TOKEN (case preserved),
  * not the dictionary entry; the dictionary lookup itself is
  * case-insensitive (CharArraySet ignoreCase). With `onlyLongestMatch`,
  * only the longest dictionary hit per start offset survives.
  *
  * Matters for German/Dutch/Scandinavian corpora: "Vindrutetorkare" also
  * indexes "Vind"/"rute"/"torkare", so single-constituent queries recall
  * compounds — the reference's TestCompoundWordTokenFilter.java:134
  * vectors pin these semantics. */
object CompoundWords {

  final val DefaultMinWordSize = 5
  final val DefaultMinSubwordSize = 2
  final val DefaultMaxSubwordSize = 15

  /** Lower-cased dictionary for O(1) case-insensitive contains. */
  def compileDict(words: Seq[String]): Set[String] =
    words.iterator.map(_.toLowerCase(java.util.Locale.ROOT)).toSet

  /** Subwords of one token, in the reference's emission order (ascending
    * start offset, then ascending length). Does NOT include the original
    * token — callers emit it first. */
  def decompose(token: String, dict: Set[String],
                minWordSize: Int = DefaultMinWordSize,
                minSubwordSize: Int = DefaultMinSubwordSize,
                maxSubwordSize: Int = DefaultMaxSubwordSize,
                onlyLongestMatch: Boolean = false): Seq[String] = {
    val len = token.length
    if (len < minWordSize) return Nil
    val lower = token.toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i <= len - minSubwordSize) {
      var longestLen = -1
      var j = minSubwordSize
      while (j <= maxSubwordSize && i + j <= len) {
        if (dict.contains(lower.substring(i, i + j))) {
          if (onlyLongestMatch) { if (j > longestLen) longestLen = j }
          else out += token.substring(i, i + j)
        }
        j += 1
      }
      if (onlyLongestMatch && longestLen > 0)
        out += token.substring(i, i + longestLen)
      i += 1
    }
    out.toSeq
  }

  /** (terms, positions, distinct-position count) after injecting subword
    * tokens at their compound's position — the same overlap contract
    * index-time synonyms use, so doc length (the BM25 norm) counts source
    * positions, not emitted tokens. */
  def applyFlat(terms: Array[String], positions: Array[Int],
                dict: Set[String],
                minWordSize: Int = DefaultMinWordSize,
                minSubwordSize: Int = DefaultMinSubwordSize,
                maxSubwordSize: Int = DefaultMaxSubwordSize,
                onlyLongestMatch: Boolean = false)
      : (Array[String], Array[Int], Int) = {
    val outT = scala.collection.mutable.ArrayBuffer.empty[String]
    val outP = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < terms.length) {
      outT += terms(i); outP += positions(i)
      val subs = decompose(terms(i), dict, minWordSize, minSubwordSize,
        maxSubwordSize, onlyLongestMatch)
      var s = 0
      while (s < subs.length) {
        outT += subs(s); outP += positions(i); s += 1
      }
      i += 1
    }
    (outT.toArray, outP.toArray, terms.length)
  }
}
