package graft.analysis

/** Tee/sink token routing (reference analysis/common sinks package):
  * TeeSinkTokenFilter (sinks/TeeSinkTokenFilter.java:46) analyzes ONCE and
  * feeds every sink's accept() as the stream passes through — here a single
  * pass over an analyzed token vector that yields the unchanged passthrough
  * plus each sink's accepted tokens. At corpus scale the same shape is one
  * mapPartitions emitting (sinkId, token) rows — the tee's whole point (no
  * re-analysis per consumer) survives distribution.
  *
  * Sink filters:
  *  - [[dateRecognizer]] = DateRecognizerSinkFilter.java:33-62 (term parses
  *    under a DateFormat -> accepted);
  *  - [[tokenRange]] = TokenRangeSinkFilter.java:33-55 (0-based stream
  *    index in [lower, upper), lower >= 1);
  *  - [[tokenType]] = TokenTypeSinkFilter.java:35-42 (type equality).
  */
object Sinks {

  /** A sink filter is stateful per pass (the range filter counts), so a
    * sink is a factory producing a fresh per-pass predicate. */
  type SinkFilter = () => Token => Boolean

  /** One analysis pass, N sinks: (passthrough, accepted tokens per sink). */
  def tee(toks: IndexedSeq[Token],
          sinks: Seq[SinkFilter]): (IndexedSeq[Token], Vector[Vector[Token]]) = {
    val preds = sinks.map(_.apply())
    val out = Vector.fill(sinks.length)(Vector.newBuilder[Token])
    for (t <- toks; i <- preds.indices)
      if (preds(i)(t)) out(i) += t
    (toks, out.map(_.result()))
  }

  /** DateRecognizerSinkFilter with an explicit pattern (the reference test
    * passes SimpleDateFormat("MM/dd/yyyy"); the no-arg constructor's
    * DateFormat.getDateInstance(DEFAULT, ROOT) is pattern-driven too).
    * DateFormat is not thread-safe -> fresh instance per pass. */
  def dateRecognizer(pattern: String = "MM/dd/yyyy"): SinkFilter = () => {
    val fmt = new java.text.SimpleDateFormat(pattern, java.util.Locale.ROOT)
    t =>
      try fmt.parse(t.term) != null
      catch { case _: java.text.ParseException => false }
  }

  /** TokenRangeSinkFilter: accepts stream positions [lower, upper). */
  def tokenRange(lower: Int, upper: Int): SinkFilter = {
    require(lower >= 1, "lower must be greater than zero")
    require(lower <= upper, "lower must not be greater than upper")
    () => {
      var count = -1
      _ => { count += 1; count >= lower && count < upper }
    }
  }

  /** TokenTypeSinkFilter: accepts tokens of exactly `typeToMatch`. */
  def tokenType(typeToMatch: String): SinkFilter =
    () => t => t.tokenType == typeToMatch
}
