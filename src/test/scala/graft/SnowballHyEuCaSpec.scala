package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.SnowballStemmers2
import graft.index.IndexBuilder

/** Armenian / Basque / Catalan Snowball stemmers and analyzer chains —
  * the reference vectors from TestArmenianAnalyzer / TestBasqueAnalyzer /
  * TestCatalanAnalyzer (no golden vocabulary ships for these three in
  * TestSnowballVocabData.zip, so the analyzer tests are the reference
  * truth), plus chain-level stop/elision behavior. */
class SnowballHyEuCaSpec extends AnyFunSuite {

  private def chain(analyzer: String, text: String): Seq[String] =
    IndexBuilder.chainFlat(analyzer, "xx", text, 255)._1.toSeq

  test("Armenian: TestArmenianAnalyzer vectors") {
    assert(SnowballStemmers2.armenian("արծիվ") == "արծ")
    assert(SnowballStemmers2.armenian("արծիվներ") == "արծ")
    // uppercase folds first (the chain's LowerCaseFilter position)
    assert(SnowballStemmers2.armenian("ԱՐԾԻՎՆԵՐ") == "արծ")
  }

  test("Armenian: no vowel leaves the word unchanged (tomark pV fails)") {
    assert(SnowballStemmers2.armenian("կրկ") == "կրկ")
    // Latin text has no Armenian vowels: identity
    assert(SnowballStemmers2.armenian("running") == "running")
  }

  test("Armenian chain: stopword է dropped") {
    assert(chain("armenian", "է արծիվներ") == Seq("արծ"))
  }

  test("Basque: TestBasqueAnalyzer vectors") {
    assert(SnowballStemmers2.basque("zaldi") == "zaldi")
    assert(SnowballStemmers2.basque("zaldiak") == "zaldi")
    assert(SnowballStemmers2.basque("mendiari") == "mendi")
  }

  test("Basque: repeat strips suffix layers; RV gate blocks short stems") {
    // aditzak deletes -ari (RV ok), izenak then blocks 'mendi' (start 0 < pV)
    assert(SnowballStemmers2.basque("mendiari") == "mendi")
    // longest-match-then-gate: 'aldi' matches but starts left of pV -> no
    // shorter-suffix retry, word unchanged
    assert(SnowballStemmers2.basque("zaldi") == "zaldi")
  }

  test("Basque chain: stopword izan dropped") {
    assert(chain("basque", "izan zaldiak") == Seq("zaldi"))
  }

  test("Catalan: TestCatalanAnalyzer vectors") {
    assert(SnowballStemmers2.catalan("llengües") == "llengu")
    assert(SnowballStemmers2.catalan("llengua") == "llengu")
    assert(SnowballStemmers2.catalan("diccionari") == "diccion")
    assert(SnowballStemmers2.catalan("institut") == "inst")
    assert(SnowballStemmers2.catalan("estudis") == "estud")
    assert(SnowballStemmers2.catalan("catalans") == "catalan")
  }

  test("Catalan: cleaning folds accents and interpunct") {
    assert(SnowballStemmers2.catalan("paral·lel") == "paral.lel")
  }

  test("Catalan chain: TestCatalanAnalyzer testContractions (elision + " +
       "stop + stem)") {
    assert(chain("catalan", "Diccionari de l'Institut d'Estudis Catalans")
      == Seq("diccion", "inst", "estud", "catalan"))
  }
}
