package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search._

/** Classic-parser regressions from the round-2 advice: explicit
  * `content:` prefixes must analyze exactly like unfielded terms
  * (synonyms + ASCII folding forwarded through the recursion), and a
  * >2-term quoted sloppy phrase must degrade to unordered span-near
  * instead of surfacing SloppyPhraseQ's constructor require as an
  * unhandled exception on a user query string. */
class QueryParserSpec extends AnyFunSuite {

  test("content: prefix forwards foldAscii (café == content:café)") {
    val plain = QueryParser.parse("café", foldAscii = true)
    val fielded = QueryParser.parse("content:café", foldAscii = true)
    assert(plain.clauses == fielded.clauses)
    assert(plain.clauses == Seq((Occur.Should, TermQ("cafe"))))
  }

  test("content: prefix forwards synonym expansion") {
    val syn = Map("fast" -> Seq("quick", "rapid"))
    val plain = QueryParser.parse("fast", synonyms = syn)
    val fielded = QueryParser.parse("content:fast", synonyms = syn)
    assert(plain.clauses == fielded.clauses)
    assert(plain.clauses ==
      Seq((Occur.Should, SpanOrQ(Seq("fast", "quick", "rapid")))))
  }

  test("content: prefix keeps boost AND folding together") {
    val q = QueryParser.parse("content:café^2", foldAscii = true)
    assert(q.clauses == Seq((Occur.Should, BoostQ(TermQ("cafe"), 2f))))
  }

  test(">2-term sloppy phrase parses to unordered span-near, not a throw") {
    val q = QueryParser.parse("\"alpha beta gamma\"~2")
    assert(q.clauses == Seq((Occur.Should,
      SpanNearQ(Seq("alpha", "beta", "gamma"), 2, inOrder = false))))
    // 2-term sloppy phrases keep the exact movement-cost scorer
    val q2 = QueryParser.parse("\"alpha beta\"~2")
    assert(q2.clauses == Seq((Occur.Should,
      SloppyPhraseQ(Seq("alpha", "beta"), Seq(0, 1), 2))))
  }
}
