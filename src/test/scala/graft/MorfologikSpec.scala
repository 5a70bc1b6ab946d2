package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Morfologik, StandardTokenizer}
import graft.analysis.Morfologik.{Lemma, MorfToken}

/** MorfologikFilter lemmatization vs the reference's TestMorfologikAnalyzer
  * vectors (morfologik/TestMorfologikAnalyzer.java:42-199). The production
  * Polish FSA dictionary is an external artifact (environmental); the
  * fixture dictionary holds exactly the entries those vectors exercise. */
class MorfologikSpec extends AnyFunSuite {

  private val D = Morfologik.testDict

  private def analyze(text: String, keywords: Set[String] = Set.empty): Vector[MorfToken] =
    Morfologik.lemmatize(StandardTokenizer.tokenize(text), D, keywords)

  private def terms(text: String): Seq[String] = analyze(text).map(_.term)

  test("testSingleTokens") {
    assert(terms("a") == Seq("a"))
    assert(terms("liście") == Seq("liście", "liść", "list", "lista"))
    assert(terms("danych") == Seq("dany", "dana", "dane", "dać"))
    assert(terms("ęóąśłżźćń") == Seq("ęóąśłżźćń")) // out-of-dict passthrough
  }

  test("testMultipleTokens: terms, offsets, posIncs") {
    val out = analyze("liście danych")
    assert(out.map(_.term) ==
      Vector("liście", "liść", "list", "lista", "dany", "dana", "dane", "dać"))
    assert(out.map(_.startOffset) == Vector(0, 0, 0, 0, 7, 7, 7, 7))
    assert(out.map(_.endOffset) == Vector(6, 6, 6, 6, 13, 13, 13, 13))
    assert(out.map(_.posInc) == Vector(1, 0, 0, 0, 1, 0, 0, 0))
  }

  test("testMultipleTokens: T. Glücksberg (lowercase fallback + passthrough)") {
    val out = analyze("T. Glücksberg")
    assert(out.map(_.term) == Vector("tom", "tona", "Glücksberg"))
    assert(out.map(_.startOffset) == Vector(0, 0, 3))
    assert(out.map(_.endOffset) == Vector(1, 1, 13))
    assert(out.map(_.posInc) == Vector(1, 0, 1))
  }

  test("testCase: case-sensitive lookup with lowercased fallback") {
    assert(terms("AGD") == Seq("AGD", "artykuły gospodarstwa domowego"))
    assert(terms("agd") == Seq("artykuły gospodarstwa domowego"))
    assert(terms("Poznania") == Seq("Poznań"))
    assert(terms("poznania") == Seq("poznanie", "poznać"))
    assert(terms("Aarona") == Seq("Aaron"))
    assert(terms("aarona") == Seq("aarona"))
    // uppercase surface misses, lowercase hits: full lemma fan-out
    assert(terms("Liście") == Seq("liście", "liść", "list", "lista"))
  }

  test("testPOSAttribute: concatenated tags split on + and |") {
    val out = analyze("liście")
    assert(out(0).term == "liście" && out(0).tags.toSet ==
      Set("subst:sg:acc:n2", "subst:sg:nom:n2", "subst:sg:voc:n2"))
    assert(out(1).term == "liść" && out(1).tags.toSet ==
      Set("subst:pl:acc:m3", "subst:pl:nom:m3", "subst:pl:voc:m3"))
    assert(out(2).term == "list" && out(2).tags.toSet ==
      Set("subst:sg:loc:m3", "subst:sg:voc:m3"))
    assert(out(3).term == "lista" && out(3).tags.toSet ==
      Set("subst:sg:dat:f", "subst:sg:loc:f"))
  }

  test("testKeywordAttrTokens: keyword-marked surfaces pass untouched") {
    val out = analyze("liście danych", keywords = Set("liście"))
    assert(out.map(_.term) == Vector("liście", "dany", "dana", "dane", "dać"))
    assert(out.map(_.startOffset) == Vector(0, 7, 7, 7, 7))
    assert(out.map(_.endOffset) == Vector(6, 13, 13, 13, 13))
    assert(out.map(_.posInc) == Vector(1, 1, 0, 0, 0))
    assert(out(0).tags.isEmpty) // tagsAtt.clear() on the keyword path
  }

  test("analyzeFlat positions stack lemmas at the token position") {
    val (ts, ps) = Morfologik.analyzeFlat("liście danych spark", D)
    assert(ts.toSeq == Seq("liście", "liść", "list", "lista",
      "dany", "dana", "dane", "dać", "spark"))
    assert(ps.toSeq == Seq(0, 0, 0, 0, 1, 1, 1, 1, 2))
  }

  test("parseDict: interchange format, file order kept, comments skipped") {
    val d = Morfologik.parseDict(Iterator(
      "# comment", "", "danych\tdany\tadj", "danych\tdać\tverb",
      "bad-line-no-tab", "solo\tsolo"))
    assert(d("danych") == Vector(Lemma("dany", "adj"), Lemma("dać", "verb")))
    assert(d("solo") == Vector(Lemma("solo", "")))
    assert(!d.contains("bad-line-no-tab"))
  }
}
