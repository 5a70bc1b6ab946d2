package graft.analysis

/** PatternTokenizer: regex-driven tokenization — group = -1 gives
  * String.split() behavior (tokens are the non-empty runs between
  * matches), group >= 0 emits that capture group of every match
  * (zero-length captures skipped).
  *
  * Reference semantics:
  * lucene/analysis/common/src/java/org/apache/lucene/analysis/pattern/PatternTokenizer.java:48-119
  */
object PatternTokenizer {

  def tokenize(text: String, pattern: String, group: Int = -1): Vector[Token] = {
    val p = java.util.regex.Pattern.compile(pattern)
    require(group < 0 || group <= p.matcher("").groupCount(),
      s"invalid group specified: pattern only has ${p.matcher("").groupCount()} capturing groups")
    val m = p.matcher(text)
    val out = Vector.newBuilder[Token]
    if (group >= 0) {
      while (m.find()) {
        val s = m.start(group); val e = m.end(group)
        if (s != e) out += Token(text.substring(s, e), s, e, 1, "word")
      }
    } else {
      var index = 0
      while (m.find()) {
        if (m.start() - index > 0)
          out += Token(text.substring(index, m.start()), index, m.start(), 1, "word")
        index = m.end()
      }
      if (text.length - index > 0)
        out += Token(text.substring(index), index, text.length, 1, "word")
    }
    out.result()
  }
}
