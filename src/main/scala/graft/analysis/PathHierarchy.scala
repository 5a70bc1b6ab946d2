package graft.analysis

/** PathHierarchyTokenizer: emits each cumulative path prefix as a token
  * at the same position ("/a/b/c" -> "/a", "/a/b", "/a/b/c" with posInc
  * 1, 0, 0), with optional delimiter replacement and leading-component
  * skip.
  *
  * Reference semantics (ported state machine, verified against the
  * reference vectors in PathHierarchySpec):
  * lucene/analysis/common/src/java/org/apache/lucene/analysis/path/PathHierarchyTokenizer.java:38-199,
  * vectors: .../src/test/org/apache/lucene/analysis/path/TestPathHierarchyTokenizer.java:28-225
  */
object PathHierarchy {

  final val DefaultDelimiter = '/'

  def tokenize(path: String, delimiter: Char = DefaultDelimiter,
               replacement: Char = DefaultDelimiter,
               skip: Int = 0): Vector[Token] = {
    require(skip >= 0, "skip cannot be negative")
    val out = Vector.newBuilder[Token]
    val result = new StringBuilder // cumulative prefix carried across tokens
    var startPosition = 0
    var skipped = 0
    var endDelimiter = false
    var i = 0
    var done = false
    while (!done) {
      val term = new StringBuilder(result.toString)
      val posInc = if (result.isEmpty) 1 else 0
      var length = 0
      var added = false
      if (endDelimiter) {
        term.append(replacement); length += 1
        endDelimiter = false
        added = true
      }
      var rounds = true
      while (rounds) {
        if (i >= path.length) { // EOF: emit only if this round consumed input
          if (skipped > skip && added)
            out += Token(term.toString, startPosition,
              startPosition + term.length, posInc, "word")
          rounds = false; done = true
        } else {
          val c = path(i); i += 1
          if (!added) {
            added = true
            skipped += 1
            if (skipped > skip) { term.append(if (c == delimiter) replacement else c); length += 1 }
            else startPosition += 1
          } else if (c == delimiter) {
            if (skipped > skip) {
              endDelimiter = true
              out += Token(term.toString, startPosition,
                startPosition + term.length, posInc, "word")
              result.setLength(0); result.append(term)
              rounds = false
            } else {
              skipped += 1
              if (skipped > skip) { term.append(replacement); length += 1 }
              else startPosition += 1
            }
          } else {
            if (skipped > skip) { term.append(c); length += 1 }
            else startPosition += 1
          }
        }
      }
    }
    out.result()
  }

  /** ReversePathHierarchyTokenizer: emits each path SUFFIX as a token —
    * "/a/b/c" -> "/a/b/c", "a/b/c", "b/c", "c", all at one position, all
    * ending at the same offset; `skip` drops that many trailing
    * components first.
    *
    * Reference (exact algorithm: delimiter-boundary table, one shared
    * endPosition = the boundary `skip` segments from the end):
    * lucene/analysis/common/src/java/org/apache/lucene/analysis/path/ReversePathHierarchyTokenizer.java:126-180,
    * vectors: TestReversePathHierarchyTokenizer.java:28-157
    */
  def tokenizeReverse(path: String, delimiter: Char = DefaultDelimiter,
                      replacement: Char = DefaultDelimiter,
                      skip: Int = 0): Vector[Token] = {
    require(skip >= 0, "skip cannot be negative")
    // boundary table: 0, the position after each delimiter, and the total
    // length when the path doesn't end on a delimiter
    val boundaries = scala.collection.mutable.ArrayBuffer(0)
    val buf = new StringBuilder(path.length)
    var i = 0
    while (i < path.length) {
      val c = path(i); i += 1
      if (c == delimiter) { boundaries += i; buf.append(replacement) }
      else buf.append(c)
    }
    if (boundaries.last < path.length) boundaries += path.length
    val n = boundaries.length
    val idx = n - 1 - skip
    val out = Vector.newBuilder[Token]
    if (idx >= 0) {
      val endPosition = boundaries(idx)
      var k = 0
      while (k < n - skip - 1) {
        val start = boundaries(k)
        out += Token(buf.substring(start, endPosition), start, endPosition,
          if (k == 0) 1 else 0, "word")
        k += 1
      }
    }
    out.result()
  }
}
