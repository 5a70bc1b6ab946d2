package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search._

/** Classic-parser regressions from the round-2 advice: explicit
  * `content:` prefixes must analyze exactly like unfielded terms
  * (synonyms + ASCII folding forwarded through the recursion), and a
  * quoted sloppy phrase of ANY length parses to SloppyPhraseQ with its
  * rel offsets preserved (the n-term SloppyPhraseScorer walk). */
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

  test(">2-term sloppy phrase parses to SloppyPhraseQ with rel preserved") {
    val q = QueryParser.parse("\"alpha beta gamma\"~2")
    assert(q.clauses == Seq((Occur.Should,
      SloppyPhraseQ(Seq("alpha", "beta", "gamma"), Seq(0, 1, 2), 2))))
    val q2 = QueryParser.parse("\"alpha beta\"~2")
    assert(q2.clauses == Seq((Occur.Should,
      SloppyPhraseQ(Seq("alpha", "beta"), Seq(0, 1), 2))))
  }

  test("multi-term text analyzes through folding (AnalyzingQueryParser)") {
    // reference queryparser/analyzing/AnalyzingQueryParser.java:63:
    // wildcard/prefix/fuzzy parts pass through the chain too
    assert(QueryParser.parse("café*", foldAscii = true).clauses ==
      Seq((Occur.Should, PrefixQ("cafe"))))
    assert(QueryParser.parse("ca?é", foldAscii = true).clauses ==
      Seq((Occur.Should, WildcardQ("ca?e"))))
    assert(QueryParser.parse("café~1", foldAscii = true).clauses ==
      Seq((Occur.Should, FuzzyQ("cafe", 1))))
  }

  test("sloppy phrase rel offsets keep stopword gaps") {
    // "the" is a stopword: analyzed positions are 0 and 2, and the parser
    // must NOT collapse the gap (reference position-increment semantics)
    val q = QueryParser.parse("\"alpha the beta\"~1", lang = "en")
    assert(q.clauses == Seq((Occur.Should,
      SloppyPhraseQ(Seq("alpha", "beta"), Seq(0, 2), 1))))
  }
}
