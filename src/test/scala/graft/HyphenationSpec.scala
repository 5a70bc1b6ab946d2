package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Hyphenation

/** Hyphenation-grammar compound decomposition vs the reference's
  * TestCompoundWordTokenFilter hyphenation cases (da_UTF8.xml grammar). */
class HyphenationSpec extends AnyFunSuite {

  private val tree = Hyphenation.danish

  test("dictionary-checked decomposition (testHyphenationCompoundWordsDA)") {
    val dict = Set("læse", "hest")
    assert(Hyphenation.decompose(tree, "læsehest", dict) ==
      Vector("læse", "hest"))
    // short / non-compound tokens produce nothing
    Seq("min", "som", "er", "lidt", "af", "en").foreach { w =>
      assert(Hyphenation.decompose(tree, w, dict).isEmpty)
    }
    assert(Hyphenation.decompose(tree, "veninde", dict).isEmpty)
  }

  test("longest match (testHyphenationCompoundWordsDELongestMatch)") {
    val dict = Set("basketball", "basket", "ball", "kurv")
    assert(Hyphenation.decompose(tree, "basketballkurv", dict,
      maxSubword = 40, onlyLongestMatch = true) ==
      Vector("basketball", "ball", "kurv"))
  }

  test("hyphenation-only, min=2 max=4 (testHyphenationOnly)") {
    assert(Hyphenation.decompose(tree, "basketballkurv", null,
      minSubword = 2, maxSubword = 4) ==
      Vector("ba", "sket", "bal", "ball", "kurv"))
  }

  test("hyphenation-only, min=4 max=6") {
    assert(Hyphenation.decompose(tree, "basketballkurv", null,
      minSubword = 4, maxSubword = 6) ==
      Vector("basket", "sket", "ball", "lkurv", "kurv"))
  }

  test("hyphenation-only, min=4 max=10") {
    assert(Hyphenation.decompose(tree, "basketballkurv", null,
      minSubword = 4, maxSubword = 10) ==
      Vector("basket", "basketbal", "basketball", "sket", "sketbal",
        "sketball", "ball", "ballkurv", "lkurv", "kurv"))
  }
}
