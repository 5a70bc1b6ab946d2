package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{PatternFilters, Token}

/** Golden vectors from the reference tests:
  *  - pattern/TestPatternReplaceFilter.java:32-80
  *  - pattern/TestPatternReplaceCharFilter.java:40-300 (checkOutput index
  *    mapping + whitespace-tokenized offset-correction cases)
  *  - pattern/TestPatternCaptureGroupTokenFilter.java:30-594
  */
class PatternFiltersSpec extends AnyFunSuite {

  private def ws(text: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    while (i < text.length) {
      while (i < text.length && Character.isWhitespace(text(i))) i += 1
      if (i < text.length) {
        val start = i
        while (i < text.length && !Character.isWhitespace(text(i))) i += 1
        out += Token(text.substring(start, i), start, i, 1, "word")
      }
    }
    out.result()
  }

  private def terms(ts: Seq[Token]) = ts.map(_.term).toList

  // --- PatternReplaceFilter ---

  private val prInput = "aabfooaabfooabfoob ab caaaaaaaaab"

  test("replace all (TestPatternReplaceFilter.testReplaceAll)") {
    assert(terms(PatternFilters.replace(ws(prInput), "a*b", "-", all = true)) ===
      List("-foo-foo-foo-", "-", "c-"))
  }

  test("replace first") {
    assert(terms(PatternFilters.replace(ws(prInput), "a*b", "-", all = false)) ===
      List("-fooaabfooabfoob", "-", "c-"))
  }

  test("strip first / strip all (null replacement == empty)") {
    assert(terms(PatternFilters.replace(ws(prInput), "a*b", "", all = false)) ===
      List("fooaabfooabfoob", "", "c"))
    assert(terms(PatternFilters.replace(ws(prInput), "a*b", "", all = true)) ===
      List("foofoofoo", "", "c"))
  }

  test("replace all with backref $1 and escaped $") {
    assert(terms(PatternFilters.replace(ws(prInput), "(a*)b", "$1\\$", all = true)) ===
      List("aa$fooaa$fooa$foo$", "a$", "caaaaaaaa" + "a$"))
  }

  // --- PatternReplaceCharFilter: checkOutput (output + index-matched) ---

  private def checkOutput(input: String, pattern: String, replacement: String,
                          expectedOutput: String, expectedIndexMatched: String): Unit = {
    val (out, correct) = PatternFilters.replaceCharFilter(input, pattern, replacement)
    assert(out === expectedOutput, s"output for /$pattern/ -> '$replacement'")
    val indexMatched = (0 until out.length).map { i =>
      val c = correct(i)
      if (c < 0) '-' else input.charAt(c)
    }.mkString
    assert(indexMatched === expectedIndexMatched, s"index map for /$pattern/")
  }

  test("charfilter failing dot") {
    checkOutput("A. .B.", "\\.[\\s]*", ".", "A..B.", "A..B.")
  }

  test("charfilter longer replacement") {
    checkOutput("XXabcZZabcYY", "abc", "abcde", "XXabcdeZZabcdeYY", "XXabcccZZabcccYY")
    checkOutput("XXabcabcYY", "abc", "abcde", "XXabcdeabcdeYY", "XXabcccabcccYY")
    checkOutput("abcabcYY", "abc", "abcde", "abcdeabcdeYY", "abcccabcccYY")
    checkOutput("YY", "^", "abcde", "abcdeYY", "YYYYYYY")
    checkOutput("YY", "$", "abcde", "YYabcde", "YYYYYYY")
    checkOutput("XYZ", ".", "abc", "abcabcabc", "XXXYYYZZZ")
    checkOutput("XYZ", ".", "$0abc", "XabcYabcZabc", "XXXXYYYYZZZZ")
  }

  test("charfilter shorter replacement") {
    checkOutput("XXabcZZabcYY", "abc", "xy", "XXxyZZxyYY", "XXabZZabYY")
    checkOutput("XXabcabcYY", "abc", "xy", "XXxyxyYY", "XXababYY")
    checkOutput("abcabcYY", "abc", "xy", "xyxyYY", "ababYY")
    checkOutput("abcabcYY", "abc", "", "YY", "YY")
    checkOutput("YYabcabc", "abc", "", "YY", "YY")
  }

  // --- PatternReplaceCharFilter: tokenized offset correction ---

  private def correctedWs(block: String, pattern: String, replacement: String) = {
    val (out, correct) = PatternFilters.replaceCharFilter(block, pattern, replacement)
    ws(out).map(t => t.copy(startOffset = correct(t.startOffset),
      endOffset = correct(t.endOffset)))
  }

  test("charfilter 1 block 1 match same length") {
    val ts = correctedWs("aa bb cc", "(aa)\\s+(bb)\\s+(cc)", "$1#$2#$3")
    assert(terms(ts) === List("aa#bb#cc"))
    assert(ts.map(t => (t.startOffset, t.endOffset)) === Vector((0, 8)))
  }

  test("charfilter 1 block 1 match longer") {
    val ts = correctedWs("aa bb cc dd", "(aa)\\s+(bb)\\s+(cc)", "$1##$2###$3")
    assert(terms(ts) === List("aa##bb###cc", "dd"))
    assert(ts.map(t => (t.startOffset, t.endOffset)) === Vector((0, 8), (9, 11)))
  }

  test("charfilter 1 block 2 matches longer") {
    val ts = correctedWs(" a  a", "a", "aa")
    assert(terms(ts) === List("aa", "aa"))
    assert(ts.map(t => (t.startOffset, t.endOffset)) === Vector((1, 2), (4, 5)))
  }

  test("charfilter 1 block 1 match shorter") {
    val ts = correctedWs("aa  bb   cc dd", "(aa)\\s+(bb)\\s+(cc)", "$1#$2")
    assert(terms(ts) === List("aa#bb", "dd"))
    assert(ts.map(t => (t.startOffset, t.endOffset)) === Vector((0, 11), (12, 14)))
  }

  test("charfilter 1 block multi matches") {
    val ts = correctedWs("  aa bb cc --- aa bb aa   bb   cc",
      "(aa)\\s+(bb)\\s+(cc)", "$1  $2  $3")
    assert(terms(ts) === List("aa", "bb", "cc", "---", "aa", "bb", "aa", "bb", "cc"))
    assert(ts.map(_.startOffset) === Vector(2, 6, 9, 11, 15, 18, 21, 25, 29))
    assert(ts.map(_.endOffset) === Vector(4, 8, 10, 14, 17, 20, 23, 27, 33))
  }

  test("charfilter 2 blocks multi matches") {
    val ts = correctedWs("  aa bb cc --- aa bb aa. bb aa   bb cc",
      "(aa)\\s+(bb)", "$1##$2")
    assert(terms(ts) === List("aa##bb", "cc", "---", "aa##bb", "aa.", "bb", "aa##bb", "cc"))
    assert(ts.map(_.startOffset) === Vector(2, 8, 11, 15, 21, 25, 28, 36))
    assert(ts.map(_.endOffset) === Vector(7, 10, 14, 20, 24, 27, 35, 38))
  }

  test("charfilter chain (three stacked filters compose corrections)") {
    val block = " a bb - ccc . --- bb a . ccc ccc bb"
    val (o1, c1) = PatternFilters.replaceCharFilter(block, "a", "aa")
    val (o2, c2) = PatternFilters.replaceCharFilter(o1, "bb", "b")
    val (o3, c3) = PatternFilters.replaceCharFilter(o2, "ccc", "c")
    val ts = ws(o3).map(t => t.copy(
      startOffset = c1(c2(c3(t.startOffset))),
      endOffset = c1(c2(c3(t.endOffset)))))
    assert(terms(ts) === List("aa", "b", "-", "c", ".", "---", "b", "aa", ".", "c", "c", "b"))
    assert(ts.map(_.startOffset) === Vector(1, 3, 6, 8, 12, 14, 18, 21, 23, 25, 29, 33))
    assert(ts.map(_.endOffset) === Vector(2, 5, 7, 11, 13, 17, 20, 22, 24, 28, 32, 35))
  }

  // --- PatternCaptureGroupTokenFilter ---

  private def checkCapture(input: String, regexes: Seq[String], tokens: Seq[String],
                           starts: Seq[Int], ends: Seq[Int], positions: Seq[Int],
                           preserveOriginal: Boolean): Unit = {
    val ts = PatternFilters.captureGroups(ws(input), preserveOriginal, regexes: _*)
    assert(terms(ts) === tokens.toList, s"terms for $regexes preserve=$preserveOriginal")
    assert(ts.map(_.startOffset) === starts.toVector)
    assert(ts.map(_.endOffset) === ends.toVector)
    assert(ts.map(_.posInc) === positions.toVector)
  }

  test("capture: no pattern / no match / no capture group keeps original") {
    for (p <- Seq(false, true)) {
      checkCapture("foobarbaz", Nil, Seq("foobarbaz"), Seq(0), Seq(9), Seq(1), p)
      checkCapture("foo bar baz", Nil, Seq("foo", "bar", "baz"),
        Seq(0, 4, 8), Seq(3, 7, 11), Seq(1, 1, 1), p)
      checkCapture("foobarbaz", Seq("xx"), Seq("foobarbaz"), Seq(0), Seq(9), Seq(1), p)
      checkCapture("foobarbaz", Seq(".."), Seq("foobarbaz"), Seq(0), Seq(9), Seq(1), p)
    }
  }

  test("capture all (whole-token group suppressed when preserving)") {
    checkCapture("foobarbaz", Seq("(.+)"), Seq("foobarbaz"), Seq(0), Seq(9), Seq(1), false)
    checkCapture("foobarbaz", Seq("(.+)"), Seq("foobarbaz"), Seq(0), Seq(9), Seq(1), true)
  }

  test("capture start") {
    checkCapture("foobarbaz", Seq("^(.)"), Seq("f"), Seq(0), Seq(9), Seq(1), false)
    checkCapture("foobarbaz", Seq("^(.)"), Seq("foobarbaz", "f"),
      Seq(0, 0), Seq(9, 9), Seq(1, 0), true)
    checkCapture("foo bar baz", Seq("^(.)"), Seq("f", "b", "b"),
      Seq(0, 4, 8), Seq(3, 7, 11), Seq(1, 1, 1), false)
    checkCapture("foo bar baz", Seq("^(.)"), Seq("foo", "f", "bar", "b", "baz", "b"),
      Seq(0, 0, 4, 4, 8, 8), Seq(3, 3, 7, 7, 11, 11), Seq(1, 0, 1, 0, 1, 0), true)
  }

  test("capture middle / end") {
    checkCapture("foobarbaz", Seq("^.(.)."), Seq("o"), Seq(0), Seq(9), Seq(1), false)
    checkCapture("foobarbaz", Seq("(.)$"), Seq("z"), Seq(0), Seq(9), Seq(1), false)
    checkCapture("foo bar baz", Seq("(.)$"), Seq("foo", "o", "bar", "r", "baz", "z"),
      Seq(0, 0, 4, 4, 8, 8), Seq(3, 3, 7, 7, 11, 11), Seq(1, 0, 1, 0, 1, 0), true)
  }

  test("capture start+middle (two groups per match)") {
    checkCapture("foobarbaz", Seq("^(.)(.)"), Seq("f", "o"),
      Seq(0, 0), Seq(9, 9), Seq(1, 0), false)
    checkCapture("foo bar baz", Seq("^(.)(.)"),
      Seq("foo", "f", "o", "bar", "b", "a", "baz", "b", "a"),
      Seq(0, 0, 0, 4, 4, 4, 8, 8, 8), Seq(3, 3, 3, 7, 7, 7, 11, 11, 11),
      Seq(1, 0, 0, 1, 0, 0, 1, 0, 0), true)
  }

  test("capture start+end") {
    checkCapture("foobarbaz", Seq("^(.).+(.)$"), Seq("f", "z"),
      Seq(0, 0), Seq(9, 9), Seq(1, 0), false)
    checkCapture("foobarbaz", Seq("^(.).+(.)$"), Seq("foobarbaz", "f", "z"),
      Seq(0, 0, 0), Seq(9, 9, 9), Seq(1, 0, 0), true)
  }

  test("camelCase multi-pattern (TestPatternCaptureGroupTokenFilter.testCamelCase)") {
    val regexes = Seq(
      "([A-Z]{2,})",
      "(?<![A-Z])([A-Z][a-z]+)",
      "(?:^|\\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)",
      "([0-9]+)")
    checkCapture("letsPartyLIKEits1999_dude", regexes,
      Seq("lets", "Party", "LIKE", "its", "1999", "dude"),
      Seq.fill(6)(0), Seq.fill(6)(25), Seq(1, 0, 0, 0, 0, 0), false)
    checkCapture("letsPartyLIKEits1999_dude", regexes,
      Seq("letsPartyLIKEits1999_dude", "lets", "Party", "LIKE", "its", "1999", "dude"),
      Seq.fill(7)(0), Seq.fill(7)(25), Seq(1, 0, 0, 0, 0, 0, 0), true)
  }
}
