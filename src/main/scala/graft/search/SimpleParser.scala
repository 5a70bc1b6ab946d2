package graft.search

import graft.analysis.Analyzer

/** SimpleQueryParser (reference queryparser/.../simple/SimpleQueryParser
  * .java:99-560): the never-throws end-user syntax — `+` AND, `|` OR, `-`
  * NOT, `"..."`(~N) phrase/near, trailing `*` prefix, `~N` fuzzy, `( )`
  * precedence, `\` escape, whitespace as implicit operator. Any syntax
  * error is silently decoded into the closest sensible query. Feature
  * bits mirror the reference's flags so individual operators can be
  * turned off. Output is this engine's [[Query]] AST; the parse tree
  * nests BoolQ exactly like the reference's BooleanQuery tree (right-to-
  * left association via the operation-change wrap in buildQueryTree,
  * SimpleQueryParser.java:419-462), which [[JoinScorer.scores]] evaluates
  * recursively.
  */
object SimpleParser {

  val AND_OPERATOR = 1 << 0
  val NOT_OPERATOR = 1 << 1
  val OR_OPERATOR = 1 << 2
  val PREFIX_OPERATOR = 1 << 3
  val PHRASE_OPERATOR = 1 << 4
  val PRECEDENCE_OPERATORS = 1 << 5
  val ESCAPE_OPERATOR = 1 << 6
  val WHITESPACE_OPERATOR = 1 << 7
  val FUZZY_OPERATOR = 1 << 8
  val NEAR_OPERATOR = 1 << 9
  val ALL_OPERATORS: Int = -1

  /** MatchNoDocs: the empty boolean (scores() yields no rows). */
  val MatchNone: BoolQ = BoolQ(Seq.empty)

  private final class State(val data: Array[Char], var index: Int, val length: Int) {
    var top: Query = null
    var currentOperation: Option[Occur] = None
    var previousOperation: Option[Occur] = None
    var not: Int = 0
  }

  /** Whitespace + lowercase token chain (the reference tests' MockAnalyzer
    * shape); [[parse]] defaults to the engine's standard chain instead. */
  def whitespaceLower(text: String): Seq[graft.analysis.TermPos] =
    text.split("\\s+").iterator.filter(_.nonEmpty).zipWithIndex
      .map { case (t, i) => graft.analysis.TermPos(Analyzer.lowerCase(t), i) }
      .toSeq

  def parse(text: String, flags: Int = ALL_OPERATORS,
            defaultOperator: Occur = Occur.Should,
            stop: Set[String] = Set.empty,
            analyze: (String, Set[String]) => Seq[graft.analysis.TermPos] =
              Analyzer.analyze(_, _)): Query = {
    val state = new State(text.toCharArray, 0, text.length)
    parseSubQuery(state, flags, defaultOperator, stop, analyze)
    if (state.top == null) MatchNone else state.top
  }

  private def has(flags: Int, f: Int): Boolean = (flags & f) != 0

  private def parseSubQuery(state: State, flags: Int, defOp: Occur,
                            stop: Set[String], analyze: (String, Set[String]) => Seq[graft.analysis.TermPos]): Unit = {
    while (state.index < state.length) {
      val c = state.data(state.index)
      var keepNot = false
      if (c == '(' && has(flags, PRECEDENCE_OPERATORS)) {
        consumeSubQuery(state, flags, defOp, stop, analyze)
      } else if (c == ')' && has(flags, PRECEDENCE_OPERATORS)) {
        state.index += 1 // extraneous, ignored
      } else if (c == '"' && has(flags, PHRASE_OPERATOR)) {
        consumePhrase(state, flags, defOp, stop, analyze)
      } else if (c == '+' && has(flags, AND_OPERATOR)) {
        // ignored when an operation is already set or nothing precedes it
        if (state.currentOperation.isEmpty && state.top != null)
          state.currentOperation = Some(Occur.Must)
        state.index += 1
      } else if (c == '|' && has(flags, OR_OPERATOR)) {
        if (state.currentOperation.isEmpty && state.top != null)
          state.currentOperation = Some(Occur.Should)
        state.index += 1
      } else if (c == '-' && has(flags, NOT_OPERATOR)) {
        // two '-' in a row negate each other
        state.not += 1
        state.index += 1
        keepNot = true
      } else if ((c == ' ' || c == '\t' || c == '\n' || c == '\r') &&
          has(flags, WHITESPACE_OPERATOR)) {
        state.index += 1
      } else {
        consumeToken(state, flags, defOp, stop, analyze)
      }
      if (!keepNot) state.not = 0
    }
  }

  private def consumeSubQuery(state: State, flags: Int, defOp: Occur,
                              stop: Set[String], analyze: (String, Set[String]) => Seq[graft.analysis.TermPos]): Unit = {
    val start = { state.index += 1; state.index }
    var precedence = 1
    var escaped = false
    var done = false
    while (!done && state.index < state.length) {
      var advanced = false
      if (!escaped) {
        val c = state.data(state.index)
        if (c == '\\' && has(flags, ESCAPE_OPERATOR)) {
          escaped = true; state.index += 1; advanced = true
        } else if (c == '(') precedence += 1
        else if (c == ')') {
          precedence -= 1
          if (precedence == 0) done = true
        }
      } else escaped = false
      if (!advanced && !done) { escaped = false; state.index += 1 }
    }
    if (state.index == state.length) {
      // no closing parenthesis: the opening one is extraneous
      state.index = start
    } else if (state.index == start) {
      // "()": reset the pending operation, as it targeted this subquery
      state.currentOperation = None
      state.index += 1
    } else {
      val sub = new State(state.data, start, state.index)
      parseSubQuery(sub, flags, defOp, stop, analyze)
      buildQueryTree(state, sub.top, defOp)
      state.index += 1
    }
  }

  private def consumePhrase(state: State, flags: Int, defOp: Occur,
                            stop: Set[String], analyze: (String, Set[String]) => Seq[graft.analysis.TermPos]): Unit = {
    val start = { state.index += 1; state.index }
    val buf = new StringBuilder
    var escaped = false
    var hasSlop = false
    var done = false
    while (!done && state.index < state.length) {
      val c = state.data(state.index)
      if (!escaped && c == '\\' && has(flags, ESCAPE_OPERATOR)) {
        escaped = true; state.index += 1
      } else if (!escaped && c == '"') {
        if (state.length > state.index + 1 && state.data(state.index + 1) == '~' &&
            has(flags, NEAR_OPERATOR)) {
          state.index += 1
          if (state.length > state.index + 1) hasSlop = true
        }
        done = true
      } else {
        escaped = false
        buf += c
        state.index += 1
      }
    }
    if (state.index >= state.length && !done) {
      state.index = start // unterminated quote: opening quote extraneous
    } else if (state.index == start) {
      state.currentOperation = None
      state.index += 1
    } else {
      val slop = if (hasSlop) parseFuzziness(state, flags) else 0
      buildQueryTree(state, newPhraseQuery(buf.toString, slop, stop, analyze), defOp)
      state.index += 1
    }
  }

  private def consumeToken(state: State, flags: Int, defOp: Occur,
                           stop: Set[String], analyze: (String, Set[String]) => Seq[graft.analysis.TermPos]): Unit = {
    val buf = new StringBuilder
    var escaped = false
    var prefix = false
    var fuzzy = false
    var done = false
    while (!done && state.index < state.length) {
      val c = state.data(state.index)
      if (!escaped && c == '\\' && has(flags, ESCAPE_OPERATOR)) {
        escaped = true; prefix = false; state.index += 1
      } else if (!escaped && tokenFinished(state, flags)) {
        done = true
      } else if (!escaped && buf.nonEmpty && c == '~' && has(flags, FUZZY_OPERATOR)) {
        fuzzy = true; done = true
      } else {
        if (!escaped)
          prefix = buf.nonEmpty && c == '*' && has(flags, PREFIX_OPERATOR)
        escaped = false
        buf += c
        state.index += 1
      }
    }
    if (buf.nonEmpty) {
      val branch: Query =
        if (fuzzy) {
          val token = buf.toString
          // maximum supported edit distance is 2 (LevenshteinAutomata)
          val f = math.min(parseFuzziness(state, flags), 2)
          if (f == 0) newDefaultQuery(token, defOp, stop, analyze)
          else FuzzyQ(Analyzer.lowerCase(token), f)
        } else if (prefix) {
          PrefixQ(Analyzer.lowerCase(buf.substring(0, buf.length - 1)))
        } else {
          newDefaultQuery(buf.toString, defOp, stop, analyze)
        }
      buildQueryTree(state, branch, defOp)
    }
  }

  /** buildQueryTree (SimpleQueryParser.java:419-462): negation wraps the
    * branch in (MUST_NOT branch, SHOULD MatchAll); an operation CHANGE
    * pushes the current top down one level, preserving precedence. */
  private def buildQueryTree(state: State, branch0: Query, defOp: Occur): Unit = {
    var branch = branch0
    if (branch != null) {
      if (state.not % 2 == 1)
        branch = BoolQ(Seq((Occur.MustNot, branch), (Occur.Should, MatchAllQ)))
      if (state.top == null) state.top = branch
      else {
        if (state.currentOperation.isEmpty) state.currentOperation = Some(defOp)
        val cur = state.currentOperation.get
        if (!state.previousOperation.contains(cur))
          state.top = BoolQ(Seq((cur, state.top)))
        state.top = BoolQ(state.top.asInstanceOf[BoolQ].clauses :+ ((cur, branch)))
        state.previousOperation = Some(cur)
      }
      state.currentOperation = None
    }
  }

  private def parseFuzziness(state: State, flags: Int): Int = {
    if (state.index >= state.length || state.data(state.index) != '~') return 0
    val sb = new StringBuilder
    var done = false
    while (!done && state.index < state.length) {
      state.index += 1
      if (state.index < state.length) {
        if (tokenFinished(state, flags)) done = true
        else sb += state.data(state.index)
      }
    }
    val f = sb.toString.toIntOption.getOrElse(0)
    math.max(f, 0)
  }

  private def tokenFinished(state: State, flags: Int): Boolean = {
    val c = state.data(state.index)
    (c == '"' && has(flags, PHRASE_OPERATOR)) ||
      (c == '|' && has(flags, OR_OPERATOR)) ||
      (c == '+' && has(flags, AND_OPERATOR)) ||
      (c == '(' && has(flags, PRECEDENCE_OPERATORS)) ||
      (c == ')' && has(flags, PRECEDENCE_OPERATORS)) ||
      ((c == ' ' || c == '\t' || c == '\n' || c == '\r') &&
        has(flags, WHITESPACE_OPERATOR))
  }

  /** createBooleanQuery analog: analyze the token text; one term -> a
    * TermQ, several -> a BoolQ of terms under the default operator. */
  private def newDefaultQuery(text: String, defOp: Occur,
                              stop: Set[String], analyze: (String, Set[String]) => Seq[graft.analysis.TermPos]): Query = {
    val terms = analyze(text, stop).map(_.term)
    terms.length match {
      case 0 => null
      case 1 => TermQ(terms.head)
      case _ => BoolQ(terms.map(t => (defOp, TermQ(t): Query)))
    }
  }

  /** createPhraseQuery analog with slop (near -> the n-term sloppy walk). */
  private def newPhraseQuery(text: String, slop: Int,
                             stop: Set[String], analyze: (String, Set[String]) => Seq[graft.analysis.TermPos]): Query = {
    val toks = analyze(text, stop)
    if (toks.isEmpty) return null
    val base = toks.head.position
    val (ts, rel) = (toks.map(_.term), toks.map(_.position - base))
    if (ts.length == 1) TermQ(ts.head)
    else if (slop > 0) SloppyPhraseQ(ts, rel, slop)
    else PhraseQ(ts, rel)
  }
}
