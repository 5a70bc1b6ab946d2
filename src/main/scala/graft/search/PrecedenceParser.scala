package graft.search

/** PrecedenceQueryParser (reference lucene/queryparser/.../flexible/
  * precedence/PrecedenceQueryParser.java:43 — the flexible-framework
  * parser wired with BooleanModifiersQueryNodeProcessor instead of the
  * classic GroupQueryNodeProcessor): boolean operators get real
  * PRECEDENCE — AND binds tighter than OR, so
  *
  *     a AND b OR c   ==   (+a +b) OR (c)
  *
  * whereas the classic parser resolves the same string FLAT, leaving b
  * required and c optional (+a +b c) — a different match set. Supported
  * subset: terms, AND/&&, OR/||, NOT/!, parentheses; default operator OR
  * (the reference default). NOT binds tightest and turns its operand
  * into a MUST_NOT clause of the enclosing group.
  */
object PrecedenceParser {

  /** Parse node: a query, possibly carrying a negation that the enclosing
    * boolean group resolves to MUST_NOT. */
  private final case class Node(q: Query, negated: Boolean)

  def parse(input: String): BoolQ = {
    val toks = tokenize(input)
    val p = new P(toks)
    val n = p.orExpr()
    p.expectEnd()
    n match {
      case Node(b: BoolQ, false) => b
      case Node(q, false) => BoolQ(Seq((Occur.Should, q)))
      case Node(q, true) => BoolQ(Seq((Occur.MustNot, q)))
    }
  }

  private def tokenize(s: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(' || c == ')') { out += c.toString; i += 1 }
      else if (c == '!') { out += "NOT"; i += 1 }
      else if (c == '&' && i + 1 < s.length && s.charAt(i + 1) == '&') {
        out += "AND"; i += 2
      } else if (c == '|' && i + 1 < s.length && s.charAt(i + 1) == '|') {
        out += "OR"; i += 2
      } else {
        val j0 = i
        while (i < s.length && !s.charAt(i).isWhitespace &&
          "()!&|".indexOf(s.charAt(i)) < 0) i += 1
        out += s.substring(j0, i)
      }
    }
    out.result()
  }

  private final class P(var toks: List[String]) {
    def peek: Option[String] = toks.headOption
    def next(): String = { val h = toks.head; toks = toks.tail; h }
    def expectEnd(): Unit =
      require(toks.isEmpty, s"trailing input: ${toks.mkString(" ")}")

    /** orExpr := andExpr (OR andExpr)* — SHOULD clauses, NOT -> MUST_NOT. */
    def orExpr(): Node = {
      var parts = List(andExpr())
      while (peek.contains("OR")) { next(); parts ::= andExpr() }
      if (parts.length == 1) parts.head
      else Node(BoolQ(parts.reverse.map {
        case Node(q, true) => (Occur.MustNot: Occur, q)
        case Node(q, false) => (Occur.Should: Occur, q)
      }), negated = false)
    }

    /** andExpr := notExpr (AND notExpr)* — MUST clauses, NOT -> MUST_NOT. */
    def andExpr(): Node = {
      var parts = List(notExpr())
      while (peek.contains("AND")) { next(); parts ::= notExpr() }
      if (parts.length == 1) parts.head
      else Node(BoolQ(parts.reverse.map {
        case Node(q, true) => (Occur.MustNot: Occur, q)
        case Node(q, false) => (Occur.Must: Occur, q)
      }), negated = false)
    }

    /** notExpr := NOT notExpr | primary (double negation cancels). */
    def notExpr(): Node = {
      if (peek.contains("NOT")) {
        next()
        val n = notExpr()
        n.copy(negated = !n.negated)
      } else primary()
    }

    def primary(): Node = peek match {
      case Some("(") =>
        next()
        val n = orExpr()
        require(peek.contains(")"), "missing )")
        next()
        n
      case Some(w) if w != ")" && w != "AND" && w != "OR" =>
        next(); Node(TermQ(w.toLowerCase), negated = false)
      case other =>
        throw new IllegalArgumentException(s"unexpected token $other")
    }
  }
}
