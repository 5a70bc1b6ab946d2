package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Token
import graft.operators.Suggest

/** Golden vectors from the reference suggest tests:
  *  - fst/WFSTCompletionTest.java:31-127 (basic / exactFirst / nonExactFirst)
  *  - analyzing/AnalyzingSuggesterTest.java:64-258 (keyword dedup-to-max,
  *    payloads ride the max-weight entry, stopword-dropping analyzed keys)
  *  - analyzing/BlendedInfixSuggesterTest.java:39-170 (linear/reciprocal
  *    coefficients, candidate numFactor, startsWith short-circuit)
  *  - analyzing/SuggestStopFilter semantics (trailing stopword kept)
  */
class SuggestSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def S = Suggest.Sep

  // --- WFSTCompletionLookup ---

  private def wfstDict = Seq(
    ("foo", 50L), ("bar", 10L), ("barbar", 12L), ("barbara", 6L)
  ).toDF("surface", "weight")

  test("wfst basic (WFSTCompletionTest.testBasic)") {
    def look(p: String, n: Int) =
      Suggest.wfst(wfstDict, p, n).as[(String, Long)].collect().toList
    assert(look("f", 2) === List(("foo", 50L)))
    assert(look("foo", 2) === List(("foo", 50L))) // no dup exact suggestion
    assert(look("bar", 1) === List(("bar", 10L))) // exact first beats barbar
    assert(look("b", 2) === List(("barbar", 12L), ("bar", 10L)))
    assert(look("ba", 3) === List(("barbar", 12L), ("bar", 10L), ("barbara", 6L)))
  }

  test("wfst exactFirst vs nonExactFirst") {
    val dict = Seq(("x y", 20L), ("x", 2L)).toDF("surface", "weight")
    for (n <- 1 to 3) {
      val ef = Suggest.wfst(dict, "x", n).as[(String, Long)].collect().toList
      assert(ef.head === (("x", 2L)))
      if (n > 1) assert(ef(1) === (("x y", 20L)))
      val nef = Suggest.wfst(dict, "x", n, exactFirst = false)
        .as[(String, Long)].collect().toList
      assert(nef.head === (("x y", 20L)))
      if (n > 1) assert(nef(1) === (("x", 2L)))
    }
  }

  // --- AnalyzingSuggester ---

  test("analyzing keyword dedups surfaces to max weight (testKeyword)") {
    val dict = Seq(
      ("foo", 50L), ("bar", 10L), ("barbar", 10L), ("barbar", 12L),
      ("barbara", 6L), ("bar", 5L), ("barbara", 1L)
    ).map { case (s, w) => (s, s, w) }.toDF("surface", "akey", "weight")
    def look(q: String, n: Int) =
      Suggest.analyzing(dict, q, n).as[(String, Long)].collect().toList
    assert(look("f", 2) === List(("foo", 50L)))
    assert(look("bar", 1) === List(("bar", 10L)))
    assert(look("b", 2) === List(("barbar", 12L), ("bar", 10L)))
    assert(look("ba", 3) === List(("barbar", 12L), ("bar", 10L), ("barbara", 6L)))
  }

  test("analyzing payloads ride the max-weight entry (testKeywordWithPayloads)") {
    val dict = Seq(
      ("foo", 50L, "hello"), ("bar", 10L, "goodbye"),
      ("barbar", 12L, "thank you"), ("bar", 9L, "should be deduplicated"),
      ("bar", 8L, "should also be deduplicated"), ("barbara", 6L, "for all the fish")
    ).map { case (s, w, p) => (s, s, w, p) }.toDF("surface", "akey", "weight", "payload")
    def look(q: String, n: Int) =
      Suggest.analyzing(dict, q, n).as[(String, Long, String)].collect().toList
    assert(look("f", 2) === List(("foo", 50L, "hello")))
    assert(look("bar", 1) === List(("bar", 10L, "goodbye")))
    assert(look("b", 2) === List(("barbar", 12L, "thank you"), ("bar", 10L, "goodbye")))
    assert(look("ba", 3).map(_._3) === List("thank you", "goodbye", "for all the fish"))
  }

  test("analyzing matches on the stop-dropped analyzed key (testStandard)") {
    val stop = Set("the", "of")
    def akey(text: String) = Suggest.analyzedKey(
      text.toLowerCase.split(' ').filterNot(stop).toSeq)
    val dict = Seq(("the ghost of christmas past", 50L))
      .map { case (s, w) => (s, akey(s), w) }.toDF("surface", "akey", "weight")
    for (q <- Seq("the ghost of chris", "ghost of chris", "ghost chris")) {
      val got = Suggest.analyzing(dict, akey(q), 1).as[(String, Long)].collect().toList
      assert(got === List(("the ghost of christmas past", 50L)), s"query '$q'")
    }
    assert(akey("the ghost of chris") === s"ghost${S}chris")
  }

  // --- BlendedInfixSuggester ---

  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  test("blended coefficients (BlendedInfixSuggesterTest.testBlendingType)") {
    val dict = Seq(("top of the lake", 20L))
      .map { case (s, w) => (s, toks(s), w) }.toDF("surface", "toks", "weight")
    def look(q: String, b: Suggest.Blender) =
      Suggest.blendedInfix(dict, q, toks(q), 1, b).as[(String, Long)].collect().head._2
    assert(look("top", Suggest.PositionLinear) === 20L)
    assert(look("the", Suggest.PositionLinear) === 16L)  // 20*(1-0.10*2)
    assert(look("lake", Suggest.PositionLinear) === 14L) // 20*(1-0.10*3)
    assert(look("the", Suggest.PositionReciprocal) === 6L)  // 20/3
    assert(look("lake", Suggest.PositionReciprocal) === 5L) // 20/4
  }

  test("blended sort (testBlendedSort): weight shrinks with match position") {
    val dict = Seq(("star wars: episode v - the empire strikes back", 8L))
      .map { case (s, w) => (s, toks(s), w) }.toDF("surface", "toks", "weight")
    def look(q: String) = Suggest.blendedInfix(dict, q, toks(q), 1)
      .as[(String, Long)].collect().headOption.map(_._2)
    val w0 = look("star ").get   // startsWith -> coefficient 1
    val w1 = look("war").get     // 'wars' @1
    val w2 = look("empire ba").get // 'empire' @5
    val w3 = look("back").get    // @7
    assert(w0 > w1 && w1 > w2 && w2 > w3)
    assert(look("bacc").isEmpty)
  }

  test("blended numFactor bounds the candidate pool (testRequiresMore)") {
    val dict = Seq(
      ("top of the lake", 18L),
      ("star wars: episode v - the empire strikes back", 12L),
      ("the returned", 10L)
    ).map { case (s, w) => (s, toks(s), w) }.toDF("surface", "toks", "weight")
    def look(n: Int, nf: Int) = Suggest.blendedInfix(
      dict, "the", toks("the"), n, Suggest.PositionReciprocal, nf)
      .as[(String, Long)].collect().toList
    val top2f1 = look(2, 1)
    assert(top2f1.size === 2 && !top2f1.exists(_._1 == "the returned"))
    val top3f1 = look(3, 1)
    assert(top3f1.exists(_._1 == "the returned"))
    val top2f2 = look(2, 2)
    assert(top2f2.exists(_._1 == "the returned")) // startsWith 'the' -> coef 1 -> 10
    assert(!top2f2.exists(_._1.startsWith("star")))
  }

  // --- SuggestStopFilter ---

  test("suggest stop filter keeps a trailing stopword still being typed") {
    val goTo = Vector(Token("go", 0, 2, 1, "word"), Token("to", 3, 5, 1, "word"))
    val kept = Suggest.suggestStop(goTo, Set("to"), inputLen = 5)
    assert(kept.map(t => (t.term, t.posInc, t.tokenType)) ===
      Vector(("go", 1, "word"), ("to", 1, "KEYWORD")))
    // trailing separator typed -> it's a real stopword now
    val committed = Suggest.suggestStop(goTo, Set("to"), inputLen = 6)
    assert(committed.map(_.term) === Vector("go"))
    // interior stopword always dropped, leaving a position gap
    val midway = Vector(Token("go", 0, 2, 1, "word"), Token("to", 3, 5, 1, "word"),
      Token("mall", 6, 10, 1, "word"))
    val out = Suggest.suggestStop(midway, Set("to"), inputLen = 10)
    assert(out.map(t => (t.term, t.posInc)) === Vector(("go", 1), ("mall", 2)))
  }
}
