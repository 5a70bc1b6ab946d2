package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Classic

/** ClassicAnalyzer golden vectors from the reference's
  * TestClassicAnalyzer.java:40-210 (stop set = EnglishAnalyzer defaults
  * where the vector depends on it). */
class ClassicSpec extends AnyFunSuite {

  private val stop = graft.analysis.StopSets.forLang("en")

  private def analyzed(text: String): Seq[String] =
    Classic.analyze(text, stop).map(_.term)

  private def typed(text: String): Seq[(String, String)] =
    Classic.tokenize(text).map(t => (t.term, t.tokenType))

  test("alphanumeric / underscores / delimiters") {
    assert(analyzed("B2B") == Seq("b2b"))
    assert(analyzed("2B") == Seq("2b"))
    assert(analyzed("word_having_underscore") ==
      Seq("word", "having", "underscore"))
    assert(analyzed("some-dashed-phrase") == Seq("some", "dashed", "phrase"))
    assert(analyzed("dogs,chase,cats") == Seq("dogs", "chase", "cats"))
    assert(analyzed("ac/dc") == Seq("ac", "dc"))
  }

  test("apostrophes + possessive strip (ClassicFilter)") {
    assert(analyzed("O'Reilly") == Seq("o'reilly"))
    assert(analyzed("you're") == Seq("you're"))
    assert(analyzed("she's") == Seq("she"))
    assert(analyzed("Jim's") == Seq("jim"))
    assert(analyzed("don't") == Seq("don't"))
    assert(analyzed("O'Reilly's") == Seq("o'reilly"))
    assert(analyzed("s-class") == Seq("s", "class"))
    assert(analyzed("t-com") == Seq("t", "com"))
    assert(analyzed("a-class") == Seq("class")) // 'a' is a stopword
  }

  test("company names, acronyms, emails, hosts") {
    assert(analyzed("AT&T") == Seq("at&t"))
    assert(analyzed("Excite@Home") == Seq("excite@home"))
    assert(typed("U.S.A.") == Seq(("U.S.A.", "<ACRONYM>")))
    assert(analyzed("U.S.A.") == Seq("usa")) // ClassicFilter removes dots
    assert(analyzed("test@example.com") == Seq("test@example.com"))
    assert(analyzed("first.lastname@example.com") ==
      Seq("first.lastname@example.com"))
    assert(analyzed("first_lastname@example.com") ==
      Seq("first_lastname@example.com"))
    assert(analyzed("www.nutch.org") == Seq("www.nutch.org"))
    // LUCENE-1068: trailing dot -> ACRONYM_DEP reported as HOST sans dot
    assert(typed("www.nutch.org.") == Seq(("www.nutch.org", "<HOST>")))
  }

  test("numerics: every other segment must have a digit") {
    assert(analyzed("21.35") == Seq("21.35"))
    assert(analyzed("R2D2 C3PO") == Seq("r2d2", "c3po"))
    assert(analyzed("216.239.63.104") == Seq("216.239.63.104"))
    assert(analyzed("1-2-3") == Seq("1-2-3"))
    assert(analyzed("a1-b2-c3") == Seq("a1-b2-c3"))
    assert(analyzed("a1-b-c3") == Seq("a1-b-c3"))
    assert(analyzed("David has 5000 bones") ==
      Seq("david", "has", "5000", "bones"))
  }

  test("various text + max token length skip-but-count") {
    assert(analyzed("C embedded developers wanted") ==
      Seq("c", "embedded", "developers", "wanted"))
    assert(analyzed("foo bar FOO BAR") == Seq("foo", "bar", "foo", "bar"))
    assert(analyzed("foo      bar .  FOO <> BAR") ==
      Seq("foo", "bar", "foo", "bar"))
    assert(analyzed("\"QUOTED\" word") == Seq("quoted", "word"))
    val r = Classic.analyze("ab cd toolong xy z", Set.empty, maxTokenLength = 5)
    assert(r.map(_.term) == Seq("ab", "cd", "xy", "z"))
    assert(r.map(_.position) == Seq(0, 1, 3, 4)) // gap where toolong was
  }
}
