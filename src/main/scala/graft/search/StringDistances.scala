package graft.search

/** The spell package's StringDistance implementations (reference
  * lucene/suggest/src/java/org/apache/lucene/search/spell/):
  *
  *  - LevensteinDistance.java: 1 - editDistance/maxLen
  *  - LuceneLevenshteinDistance.java:49-106: codepoint-level edit distance
  *    WITH the transposition row, normalized 1 - d/MIN(m,n) (mimics the
  *    internal DirectSpellChecker distance; used for distributed
  *    spellcheck merging)
  *  - JaroWinklerDistance.java:37-105: Jaro similarity + Winkler prefix
  *    bonus with the reference's quirks kept — the common prefix is NOT
  *    capped at 4, and the scaling factor is min(0.1, 1/maxLen); float
  *    arithmetic end-to-end like the reference
  *  - NGramDistance.java:54-142: n-gram-cost edit distance over a
  *    null-prefixed source, prefix matches discounted, 1 - d/maxLen
  */
object StringDistances {

  /** LevensteinDistance (plain): 1 - lev/max(len). */
  def levenshtein(s: String, t: String): Float = {
    val (n, m) = (s.length, t.length)
    if (n == 0 || m == 0) return if (n == m) 1f else 0f
    var prev = Array.tabulate(n + 1)(identity)
    var cur = new Array[Int](n + 1)
    var j = 1
    while (j <= m) {
      cur(0) = j
      val tj = t.charAt(j - 1)
      var i = 1
      while (i <= n) {
        val cost = if (s.charAt(i - 1) == tj) 0 else 1
        cur(i) = math.min(math.min(cur(i - 1) + 1, prev(i) + 1), prev(i - 1) + cost)
        i += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    1.0f - prev(n).toFloat / math.max(n, m)
  }

  /** LuceneLevenshteinDistance: transposition-aware, 1 - d/MIN(m,n),
    * codepoints. */
  def luceneLevenshtein(target: String, other: String): Float = {
    val n = target.codePointCount(0, target.length)
    val m = other.codePointCount(0, other.length)
    if (n == 0 || m == 0) return if (n == m) 1f else 0f
    1.0f - luceneLevenshteinEdits(target, other).toFloat / math.min(m, n)
  }

  /** Raw transposition-aware (OSA) codepoint edit distance — the edit
    * count behind luceneLevenshtein, exposed for DirectSpellChecker's
    * candidate banding (suggest/spell/DirectSpellChecker.java draws
    * candidates by Damerau-Levenshtein automata; this is the same metric
    * its INTERNAL_LEVENSHTEIN scoring reuses). */
  def luceneLevenshteinEdits(target: String, other: String): Int = {
    val tp = target.codePoints.toArray
    val op = other.codePoints.toArray
    val n = tp.length
    val m = op.length
    if (n == 0 || m == 0) return math.max(n, m)
    val d = Array.ofDim[Int](n + 1, m + 1)
    for (i <- 0 to n) d(i)(0) = i
    for (j <- 0 to m) d(0)(j) = j
    var j = 1
    while (j <= m) {
      val tj = op(j - 1)
      var i = 1
      while (i <= n) {
        val cost = if (tp(i - 1) == tj) 0 else 1
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + cost)
        if (i > 1 && j > 1 && tp(i - 1) == op(j - 2) && tp(i - 2) == op(j - 1))
          d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + cost)
        i += 1
      }
      j += 1
    }
    d(n)(m)
  }

  /** JaroWinklerDistance with the reference's exact float arithmetic. */
  def jaroWinkler(s1: String, s2: String, threshold: Float = 0.7f): Float = {
    val (max, min) = if (s1.length > s2.length) (s1, s2) else (s2, s1)
    val range = math.max(max.length / 2 - 1, 0)
    val matchIndexes = Array.fill(min.length)(-1)
    val matchFlags = new Array[Boolean](max.length)
    var matches = 0
    for (mi <- 0 until min.length) {
      val c1 = min.charAt(mi)
      var xi = math.max(mi - range, 0)
      val xn = math.min(mi + range + 1, max.length)
      var found = false
      while (!found && xi < xn) {
        if (!matchFlags(xi) && c1 == max.charAt(xi)) {
          matchIndexes(mi) = xi
          matchFlags(xi) = true
          matches += 1
          found = true
        }
        xi += 1
      }
    }
    if (matches == 0) return 0f
    val ms1 = new Array[Char](matches)
    val ms2 = new Array[Char](matches)
    var si = 0
    for (i <- 0 until min.length) if (matchIndexes(i) != -1) {
      ms1(si) = min.charAt(i); si += 1
    }
    si = 0
    for (i <- 0 until max.length) if (matchFlags(i)) {
      ms2(si) = max.charAt(i); si += 1
    }
    var transpositions = 0
    for (mi <- ms1.indices) if (ms1(mi) != ms2(mi)) transpositions += 1
    var prefix = 0
    var stop = false
    for (mi <- 0 until min.length if !stop) {
      if (s1.charAt(mi) == s2.charAt(mi)) prefix += 1 else stop = true
    }
    val m = matches.toFloat
    val t = transpositions / 2
    val j = ((m / s1.length + m / s2.length + (m - t) / m)) / 3
    if (j < threshold) j
    else j + math.min(0.1f, 1f / max.length) * prefix * (1 - j)
  }

  /** NGramDistance (default n=2). */
  def ngram(source: String, target: String, n: Int = 2): Float = {
    val sl = source.length
    val tl = target.length
    if (sl == 0 || tl == 0) return if (sl == tl) 1f else 0f
    if (sl < n || tl < n) {
      var cost = 0
      for (i <- 0 until math.min(sl, tl))
        if (source.charAt(i) == target.charAt(i)) cost += 1
      return cost.toFloat / math.max(sl, tl)
    }
    val sa = new Array[Char](sl + n - 1)
    for (i <- sa.indices)
      sa(i) = if (i < n - 1) 0 else source.charAt(i - n + 1)
    var p = Array.tabulate(sl + 1)(_.toFloat)
    var d = new Array[Float](sl + 1)
    var tj = new Array[Char](n)
    var j = 1
    while (j <= tl) {
      if (j < n) {
        tj = new Array[Char](n)
        for (ti <- 0 until n - j) tj(ti) = 0
        for (ti <- n - j until n) tj(ti) = target.charAt(ti - (n - j))
      } else tj = target.substring(j - n, j).toCharArray
      d(0) = j
      var i = 1
      while (i <= sl) {
        var cost = 0
        var tn = n
        for (ni <- 0 until n) {
          if (sa(i - 1 + ni) != tj(ni)) cost += 1
          else if (sa(i - 1 + ni) == 0) tn -= 1 // discount prefix matches
        }
        val ec = cost.toFloat / tn
        d(i) = math.min(math.min(d(i - 1) + 1, p(i) + 1), p(i - 1) + ec)
        i += 1
      }
      val tmp = p; p = d; d = tmp
      j += 1
    }
    1.0f - (p(sl) / math.max(tl, sl))
  }
}
