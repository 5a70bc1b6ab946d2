package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Analyzer, StandardTokenizer, StopSets}

/** Golden vectors ported from the reference's
  * lucene/analysis/common/src/test/org/apache/lucene/analysis/standard/TestStandardAnalyzer.java
  * (assertAnalyzesTo style, BaseTokenStreamTestCase). */
class AnalysisSpec extends AnyFunSuite {

  private def terms(text: String): Seq[String] =
    StandardTokenizer.tokenize(text).map(_.term)

  test("alphanumeric (TestStandardAnalyzer.java:224-228)") {
    assert(terms("B2B") == Seq("B2B"))
    assert(terms("2B") == Seq("2B"))
  }

  test("delimiters (TestStandardAnalyzer.java:230-235)") {
    assert(terms("some-dashed-phrase") == Seq("some", "dashed", "phrase"))
    assert(terms("dogs,chase,cats") == Seq("dogs", "chase", "cats"))
    assert(terms("ac/dc") == Seq("ac", "dc"))
  }

  test("apostrophes (TestStandardAnalyzer.java:237-243)") {
    assert(terms("O'Reilly") == Seq("O'Reilly"))
    assert(terms("you're") == Seq("you're"))
    assert(terms("she's") == Seq("she's"))
    assert(terms("Jim's") == Seq("Jim's"))
    assert(terms("don't") == Seq("don't"))
  }

  test("numeric (TestStandardAnalyzer.java:247-253)") {
    assert(terms("21.35") == Seq("21.35"))
    assert(terms("R2D2 C3PO") == Seq("R2D2", "C3PO"))
    assert(terms("216.239.63.104") == Seq("216.239.63.104"))
  }

  test("text with numbers / various (TestStandardAnalyzer.java:255-266)") {
    assert(terms("David has 5000 bones") == Seq("David", "has", "5000", "bones"))
    assert(terms("C embedded developers wanted") ==
      Seq("C", "embedded", "developers", "wanted"))
    assert(terms("foo bar FOO BAR") == Seq("foo", "bar", "FOO", "BAR"))
    assert(terms("foo      bar .  FOO <> BAR") == Seq("foo", "bar", "FOO", "BAR"))
    assert(terms("\"QUOTED\" word") == Seq("QUOTED", "word"))
  }

  test("offsets and types (TestStandardAnalyzer.java:273-284)") {
    val ts = StandardTokenizer.tokenize("David has 5000 bones")
    assert(ts.map(_.term) == Seq("David", "has", "5000", "bones"))
    assert(ts.map(_.startOffset) == Seq(0, 6, 10, 15))
    assert(ts.map(_.endOffset) == Seq(5, 9, 14, 20))
    assert(ts.map(_.tokenType) ==
      Seq("<ALPHANUM>", "<ALPHANUM>", "<NUM>", "<ALPHANUM>"))
  }

  test("mid-token punctuation rules (TestStandardAnalyzer.java:333-374)") {
    assert(terms("A:B") == Seq("A:B"))
    assert(terms("A::B") == Seq("A", "B"))
    assert(terms("1.2") == Seq("1.2"))
    assert(terms("A.B") == Seq("A.B"))
    assert(terms("1..2") == Seq("1", "2"))
    assert(terms("A..B") == Seq("A", "B"))
    assert(terms("1,2") == Seq("1,2"))
    assert(terms("1,,2") == Seq("1", "2"))
    assert(terms("A.:B") == Seq("A", "B"))
    assert(terms("A:.B") == Seq("A", "B"))
    assert(terms("1,.2") == Seq("1", "2"))
    assert(terms("1.,2") == Seq("1", "2"))
    assert(terms("A:B_A:B") == Seq("A:B_A:B"))
    assert(terms("A:B_A::B") == Seq("A:B_A", "B"))
    assert(terms("1.2_1.2") == Seq("1.2_1.2"))
    assert(terms("A.B_A.B") == Seq("A.B_A.B"))
    assert(terms("1.2_1..2") == Seq("1.2_1", "2"))
    assert(terms("A.B_A..B") == Seq("A.B_A", "B"))
    assert(terms("1,2_1,2") == Seq("1,2_1,2"))
    assert(terms("1,2_1,,2") == Seq("1,2_1", "2"))
    assert(terms("C_A.:B") == Seq("C_A", "B"))
    assert(terms("C_A:.B") == Seq("C_A", "B"))
    assert(terms("3_1,.2") == Seq("3_1", "2"))
    assert(terms("3_1.,2") == Seq("3_1", "2"))
  }

  test("CJK / Korean (TestStandardAnalyzer.java:268-271,304-314)") {
    val cjk = StandardTokenizer.tokenize("𩬅艱鍟䇹愯瀛")
    assert(cjk.map(_.term) == Seq("𩬅", "艱", "鍟", "䇹", "愯", "瀛"))
    assert(cjk.forall(_.tokenType == "<IDEOGRAPHIC>"))
    val ko = StandardTokenizer.tokenize("안녕하세요 한글입니다")
    assert(ko.map(_.term) == Seq("안녕하세요", "한글입니다"))
    assert(ko.forall(_.tokenType == "<HANGUL>"))
  }

  test("huge doc (TestStandardAnalyzer.java:110-121)") {
    val input = (" " * 4094) + "testing 1234"
    assert(terms(input) == Seq("testing", "1234"))
  }

  test("max token length: skip but count position (StandardTokenizer.java:156-166)") {
    val toks = StandardTokenizer.tokenize("aaa " + ("b" * 300) + " ccc")
    assert(toks.map(_.term) == Seq("aaa", "ccc"))
    assert(toks.map(_.posInc) == Seq(1, 2)) // skipped token leaves a gap
  }

  test("stopword position gaps (FilteringTokenFilter.java:49-63)") {
    val out = Analyzer.analyze("the quick fox", StopSets.english)
    assert(out.map(_.term) == Seq("quick", "fox"))
    assert(out.map(_.position) == Seq(1, 2)) // 'the' held position 0
    val out2 = Analyzer.analyze("this is a and the fox", StopSets.english)
    assert(out2.map(_.term) == Seq("fox"))
    assert(out2.map(_.position) == Seq(5))
  }

  test("codepoint lowercase incl. non-ASCII (LowerCaseFilter.java:43-49)") {
    assert(Analyzer.lowerCase("FOO Bar") == "foo bar")
    // U+0130 LATIN CAPITAL LETTER I WITH DOT ABOVE -> 'i' (codepoint map)
    assert(Analyzer.lowerCase("İstanbul") == "istanbul")
    assert(Analyzer.lowerCase("ΣΣ") == "σσ") // ΣΣ -> σσ
  }

  test("dotted identifiers stay single tokens (UAX#29 WB6/WB7)") {
    // MidNumLet '.' between letters does NOT split — matches the
    // reference ("A.B" -> "A.B"); code identifiers keep their dots
    assert(terms("import org.apache.spark.sql.Dataset") ==
      Seq("import", "org.apache.spark.sql.Dataset"))
  }

  test("default English stop set is the reference's 33 words (StopAnalyzer.java:42-48)") {
    assert(StopSets.english.size == 33)
    assert(StopSets.english.contains("their") && StopSets.english.contains("a"))
    assert(!StopSets.english.contains("i"))
  }

  test("analyzeFlat == analyze on mixed input (shared-chain contract)") {
    for (text <- Seq("The quick brown fox", "import org.apache.spark x " +
        ("y" * 300) + " Z1 the 21.35 O'Reilly", "", "the a an")) {
      val v = Analyzer.analyze(text, StopSets.english)
      val (ts, ps) = Analyzer.analyzeFlat(text, StopSets.english)
      assert(ts.toSeq == v.map(_.term))
      assert(ps.toSeq == v.map(_.position))
    }
  }

  test("analyze emits (term, position) with stop gaps end-to-end") {
    val out = Analyzer.analyze("The quick brown fox jumps over the lazy dog",
      StopSets.english)
    assert(out.map(_.term) ==
      Seq("quick", "brown", "fox", "jumps", "over", "lazy", "dog"))
    assert(out.map(_.position) == Seq(1, 2, 3, 4, 5, 7, 8))
  }
}
