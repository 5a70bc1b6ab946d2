package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Hunspell

/** Hunspell stemming vs the reference's own .aff/.dic fixtures and the
  * expectations of TestStemmer / TestCondition / TestTwoSuffixes /
  * TestHomonyms / TestEscaped / TestZeroAffix / TestFlagLong /
  * TestFlagNum / TestOptionalCondition / TestCondition2. */
class HunspellSpec extends AnyFunSuite {

  private def res(name: String): String = {
    val in = getClass.getResourceAsStream(s"/hunspell/$name")
    require(in != null, s"missing $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def dict(aff: String, dic: String): Hunspell.Dict =
    Hunspell.load(res(aff), res(dic))

  /** assertStemsTo contract: multiset equality, order-insensitive. */
  private def stemsTo(d: Hunspell.Dict, word: String, want: String*): Unit =
    assert(d.stem(word).sorted == want.sorted.toList,
      s"stem($word)")

  test("simple.aff: TestStemmer vectors") {
    val d = Hunspell.simple
    stemsTo(d, "lucene", "lucene", "lucen")
    stemsTo(d, "mahoute", "mahout")
    stemsTo(d, "solr", "olr")
    // no recursion when the inner suffix has no continuation classes
    stemsTo(d, "abcd")
    stemsTo(d, "ab", "ab")
    stemsTo(d, "abc", "ab")
    stemsTo(d, "apach", "apach")
    stemsTo(d, "apache", "apach")
    stemsTo(d, "foo", "foo", "foo")
    stemsTo(d, "food", "foo")
    stemsTo(d, "foos", "foo")
    stemsTo(d, "lucen", "lucen")
    stemsTo(d, "mahout", "mahout")
    stemsTo(d, "moo", "moo")
    stemsTo(d, "mood", "moo")
    stemsTo(d, "olr", "olr")
    // bogus forms must not stem
    Seq("abs", "abe", "sab", "sapach", "sapache", "apachee", "sfoo",
      "sfoos", "fooss", "lucenee", "solre").foreach(w => stemsTo(d, w))
  }

  test("condition.aff: conditions with strip (TestCondition)") {
    val d = dict("condition.aff", "condition.dic")
    stemsTo(d, "hello", "hello")
    stemsTo(d, "try", "try")
    stemsTo(d, "tried", "try")
    stemsTo(d, "work", "work")
    stemsTo(d, "worked", "work")
    stemsTo(d, "rework", "work")
    stemsTo(d, "reworked", "work")
    Seq("retried", "workied", "tryed", "tryied", "helloed")
      .foreach(w => stemsTo(d, w))
  }

  test("optional-condition.aff: rules with no condition column") {
    val d = dict("optional-condition.aff", "optional-condition.dic")
    stemsTo(d, "tried", "try")
    stemsTo(d, "reworked", "work")
    stemsTo(d, "retried")
  }

  test("condition2.aff: char-class condition (TestCondition2)") {
    val d = dict("condition2.aff", "condition2.dic")
    stemsTo(d, "monopolies", "monopoly")
  }

  test("twosuffixes.aff: same flag in two blocks (TestTwoSuffixes)") {
    val d = dict("twosuffixes.aff", "twosuffixes.dic")
    stemsTo(d, "drink", "drink")
    stemsTo(d, "drinkable", "drink")
    stemsTo(d, "drinks", "drink")
    stemsTo(d, "drinkableable")
    stemsTo(d, "drinkss")
  }

  test("homonyms.aff: two dictionary entries (TestHomonyms)") {
    val d = dict("homonyms.aff", "homonyms.dic")
    stemsTo(d, "works", "work", "work")
  }

  test("escaped.aff: escaped slashes in entries (TestEscaped)") {
    val d = dict("escaped.aff", "escaped.dic")
    stemsTo(d, "works", "work")
    stemsTo(d, "work", "work")
    stemsTo(d, "R2/D2", "R2/D2")
    stemsTo(d, "R2/D2s", "R2/D2")
    stemsTo(d, "N/A", "N/A")
    stemsTo(d, "N/As")
  }

  test("zeroaffix.aff: empty append with long strip (TestZeroAffix)") {
    val d = dict("zeroaffix.aff", "zeroaffix.dic")
    stemsTo(d, "drink", "drinksierranevada")
  }

  test("flaglong.aff: FLAG long (TestFlagLong)") {
    val d = dict("flaglong.aff", "flaglong.dic")
    stemsTo(d, "foo", "foo")
    stemsTo(d, "foos", "foo")
    stemsTo(d, "fooss")
    stemsTo(d, "foobogus")
  }

  test("flagnum.aff: FLAG num (TestFlagNum)") {
    val d = dict("flagnum.aff", "flagnum.dic")
    stemsTo(d, "foo", "foo")
    stemsTo(d, "foos", "foo")
    stemsTo(d, "fooss")
  }

  test("filter contract: unique stems, pass-through when none") {
    assert(Hunspell.filterToken(Hunspell.simple, "lucene") ==
      List("lucene", "lucen"))
    assert(Hunspell.filterToken(Hunspell.simple, "foo") == List("foo"))
    assert(Hunspell.filterToken(Hunspell.simple, "bogus") == List("bogus"))
  }
}
