package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search._
import graft.search.SimpleParser.{parse, MatchNone}

/** SimpleQueryParser vs the reference's test suite
  * (queryparser/.../simple/TestSimpleQueryParser.java) — the tests use
  * default operator MUST, whitespace+lowercase analysis, all flags on. */
class SimpleParserSpec extends AnyFunSuite {

  // the reference tests parse with a whitespace+lowercase MockAnalyzer
  private val wsLower: (String, Set[String]) => Seq[graft.analysis.TermPos] =
    (t, _) => SimpleParser.whitespaceLower(t)

  private def p(text: String): Query =
    parse(text, defaultOperator = Occur.Must, analyze = wsLower)

  private def term(t: String): Query = TermQ(t)
  private def must(qs: Query*): Query = BoolQ(qs.map((Occur.Must, _)))
  private def should(qs: Query*): Query = BoolQ(qs.map((Occur.Should, _)))
  private def not(q: Query): Query =
    BoolQ(Seq((Occur.MustNot, q), (Occur.Should, MatchAllQ)))

  test("testTerm") { assert(p("foobar") === term("foobar")) }

  test("testFuzzy") {
    assert(p("foobar~2") === FuzzyQ("foobar", 2))
    assert(p("foobar~") === term("foobar"))
    assert(p("foobar~a") === term("foobar"))
    assert(p("foobar~1a") === term("foobar"))
    // fuzziness above the supported maximum clamps to 2
    assert(p("foo~3 bar") === must(FuzzyQ("foo", 2), term("bar")))
  }

  test("testPhrase + slop") {
    assert(p("\"foo bar\"") === PhraseQ(Seq("foo", "bar"), Seq(0, 1)))
    assert(p("\"foo bar\"~2") === SloppyPhraseQ(Seq("foo", "bar"), Seq(0, 1), 2))
    assert(p("\"foo bar\"~10") === SloppyPhraseQ(Seq("foo", "bar"), Seq(0, 1), 10))
    assert(p("\"foo bar\"~") === PhraseQ(Seq("foo", "bar"), Seq(0, 1)))
    assert(p("\"foo bar\"~a") === PhraseQ(Seq("foo", "bar"), Seq(0, 1)))
  }

  test("testPrefix") { assert(p("foobar*") === PrefixQ("foobar")) }

  test("testAND / testANDImplicit / testANDPhrase") {
    assert(p("foo+bar") === must(term("foo"), term("bar")))
    assert(p("foo bar") === must(term("foo"), term("bar")))
    assert(p("\"foo bar\"+\"star wars\"") ===
      must(PhraseQ(Seq("foo", "bar"), Seq(0, 1)),
        PhraseQ(Seq("star", "wars"), Seq(0, 1))))
  }

  test("testOR / testORImplicit / testORPhrase") {
    assert(p("foo|bar") === should(term("foo"), term("bar")))
    assert(p("foo||bar") === should(term("foo"), term("bar")))
    assert(parse("foo bar") === should(term("foo"), term("bar"))) // default SHOULD
    assert(p("\"foo bar\"|\"star wars\"") ===
      should(PhraseQ(Seq("foo", "bar"), Seq(0, 1)),
        PhraseQ(Seq("star", "wars"), Seq(0, 1))))
  }

  test("testNOT") {
    assert(p("-foo") === not(term("foo")))
    assert(p("-(foo)") === not(term("foo")))
    assert(p("---foo") === not(term("foo")))
  }

  test("testCrazyPrefixes") {
    assert(p("st*ar*") === PrefixQ("st*ar"))
    assert(p("st*ar\\\\**") === PrefixQ("st*ar\\*"))
    assert(p("sT*Ar\\\\\\*") === term("st*ar\\*"))
  }

  test("testGarbageTerm") {
    val star = term("star")
    for (s <- Seq("star", "star\n", "star\r", "star\t", "star(", "star)",
        "star\"", "\t \r\n\nstar   \n \r \t ", "- + \"\" - star \\"))
      assert(p(s) === star, s"input: ${s.replace("\n", "\\n")}")
  }

  test("testGarbageEmpty") {
    for (s <- Seq("", "  ", "\\ ", "\\ \\ ", "\"\"", "\" \"", "\" \"|\" \"",
        "(\" \"|\" \")", "\" \" \" \"", "(\" \" \" \")"))
      assert(p(s) === MatchNone, s"input: <$s>")
  }

  test("testGarbageAND / OR / NOT / Phrase / Subquery") {
    val and = must(term("star"), term("wars"))
    for (s <- Seq("star wars", "star+wars", "     star     wars   ",
        "     star +    wars   ", "  |     star + + |   wars   ",
        "  |     star + + |   wars   \\"))
      assert(p(s) === and, s"input: <$s>")
    val or = should(term("star"), term("wars"))
    for (s <- Seq("star|wars", "     star |    wars   ",
        "  |     star | + |   wars   ", "  +     star | + +   wars   \\"))
      assert(p(s) === or, s"input: <$s>")
    for (s <- Seq("-star", "---star", "- -star -"))
      assert(p(s) === not(term("star")), s"input: <$s>")
    val phrase = PhraseQ(Seq("star", "wars"), Seq(0, 1))
    for (s <- Seq("\"star wars\"", "\"star wars\\ \"",
        "\"\" | \"star wars\"", "          \"star wars\"        \"\"\\"))
      assert(p(s) === phrase, s"input: <$s>")
    for (s <- Seq("(star)", "(star))", "((star)",
        "     -()(star)        \n\n\r     ",
        "| + - ( + - |      star    \n      ) \n"))
      assert(p(s) === term("star"), s"input: <$s>")
  }

  test("testCompoundAnd / testCompoundOr") {
    val and3 = must(term("star"), term("wars"), term("empire"))
    for (s <- Seq("star wars empire", "star+wars + empire",
        " | --star wars empire \n\\"))
      assert(p(s) === and3, s"input: <$s>")
    val or3 = should(term("star"), term("wars"), term("empire"))
    for (s <- Seq("star|wars|empire", "star|wars | empire",
        " | --star|wars|empire \n\\"))
      assert(p(s) === or3, s"input: <$s>")
  }

  test("testComplex00-03: operation changes nest the tree") {
    // star|wars empire -> MUST( SHOULD(star, wars), empire )
    val c00 = must(should(term("star"), term("wars")), term("empire"))
    for (s <- Seq("star|wars empire", "star|wars + empire",
        "star| + wars + ----empire |"))
      assert(p(s) === c00, s"input: <$s>")
    // star wars | empire -> SHOULD( MUST(star, wars), empire )
    val c01 = should(must(term("star"), term("wars")), term("empire"))
    for (s <- Seq("star wars | empire", "star + wars|empire",
        "star + | wars | ----empire +"))
      assert(p(s) === c01, s"input: <$s>")
    val c02 = should(must(term("star"), term("wars")), term("empire"),
      term("strikes"))
    for (s <- Seq("star wars | empire | strikes",
        "star + wars|empire | strikes",
        "star + | wars | ----empire | + --strikes \\"))
      assert(p(s) === c02, s"input: <$s>")
    val c03 = must(
      should(must(term("star"), term("wars")), term("empire"), term("strikes")),
      term("back"))
    for (s <- Seq("star wars | empire | strikes back",
        "star + wars|empire | strikes + back",
        "star + | wars | ----empire | + --strikes + | --back \\"))
      assert(p(s) === c03, s"input: <$s>")
  }

  test("testComplex04-05: parenthesized groups") {
    val c04 = should(must(term("star"), term("wars")), term("empire"),
      must(term("strikes"), term("back")))
    for (s <- Seq("(star wars) | empire | (strikes back)",
        "(star + wars) |empire | (strikes + back)",
        "(star + | wars |) | ----empire | + --(strikes + | --back) \\"))
      assert(p(s) === c04, s"input: <$s>")
    val c05 = should(
      must(term("star"), term("wars")),
      should(term("empire"),
        must(term("strikes"), term("back"), not(term("jarjar")))))
    for (s <- Seq("(star wars) | (empire | (strikes back -jarjar))",
        "(star + wars) |(empire | (strikes + back -jarjar) () )",
        "(star + | wars |) | --(--empire | + --(strikes + | --back + -jarjar) \"\" ) \""))
      assert(p(s) === c05, s"input: <$s>")
  }

  test("never throws on random garbage (testRandomQueries/testRandomQueries2)") {
    val rng = new scala.util.Random(20260819L)
    val opChars = "+-|\"()\\*~ \t\n".toCharArray
    for (i <- 1 to 2000) {
      val len = rng.nextInt(24)
      val sb = new StringBuilder
      for (_ <- 0 until len)
        sb += (if (rng.nextBoolean()) opChars(rng.nextInt(opChars.length))
               else (33 + rng.nextInt(94)).toChar)
      val s = sb.toString
      val q = parse(s, analyze = wsLower)                       // must not throw
      parse(s, flags = rng.nextInt(), analyze = wsLower)        // any flag set
      assert(q != null)
    }
  }

  test("flags disable operators") {
    // with NOT disabled, '-' is part of the term
    assert(parse("-star", flags = SimpleParser.ALL_OPERATORS & ~SimpleParser.NOT_OPERATOR,
      defaultOperator = Occur.Must, analyze = wsLower) === term("-star"))
    // with PREFIX disabled, trailing '*' stays in the term
    assert(parse("star*", flags = SimpleParser.ALL_OPERATORS & ~SimpleParser.PREFIX_OPERATOR,
      defaultOperator = Occur.Must, analyze = wsLower) === term("star*"))
  }
}
