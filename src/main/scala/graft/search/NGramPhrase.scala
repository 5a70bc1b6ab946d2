package graft.search

/** NGramPhraseQuery rewrite (reference core search/NGramPhraseQuery
  * .java:37-60): a 0-slop phrase over an n-gram field keeps only the
  * grams at positions congruent 0 (mod n) PLUS the last gram, positions
  * preserved — ~1/n of the postings are read and the match set is
  * identical, because adjacent grams overlap: the sparse chain still
  * pins every character of the sought string. Bails to the original
  * phrase when slop != 0, n < 2, fewer than 3 terms, or the positions
  * are not consecutive — the reference's exact applicability gates.
  */
object NGramPhrase {

  /** Returns (terms, positions) of the optimized phrase — or the input
    * unchanged when the optimization doesn't apply. */
  def rewrite(terms: Seq[String], positions: Seq[Int], n: Int,
              slop: Int = 0): (Seq[String], Seq[Int]) = {
    if (slop != 0 || n < 2 || terms.length < 3 ||
        positions.zip(positions.tail).exists { case (a, b) => a + 1 != b })
      return (terms, positions)
    val last = terms.length - 1
    val kept = terms.indices.filter(i => i % n == 0 || i >= last)
    (kept.map(terms), kept.map(positions))
  }

  /** Sparse positional containment: does the gram stream of `word`
    * (2-grams at consecutive positions, an NGramTokenizer stream) match
    * the optimized (term, position) pattern at any start offset? This is
    * the phrase scorer's position-delta walk on one token stream. */
  def matchesWord(word: String, terms: Seq[String], positions: Seq[Int],
                  n: Int): Boolean = {
    if (word.length < n) return false
    val maxStart = word.length - n
    (0 to maxStart).exists { p =>
      terms.indices.forall { i =>
        val at = p + positions(i)
        at <= maxStart && word.regionMatches(at, terms(i), 0, n)
      }
    }
  }
}
