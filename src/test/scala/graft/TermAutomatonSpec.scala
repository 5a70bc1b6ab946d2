package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search.{TermAutomatonDfa, TermAutomatonQ}

/** TermAutomatonQuery semantics against the reference's own test cases
  * (lucene/sandbox/src/test/org/apache/lucene/search/
  * TestTermAutomatonQuery.java:60-160,264-316,657-719): match sets for
  * basic/ANY/synonym/slop/cyclic automata, the freq==3 assertion of
  * testFreq, and the finish() lead/trail-ANY rejections. */
class TermAutomatonSpec extends AnyFunSuite {

  /** tokens = whitespace split, pos = index (the reference tests use a
    * non-stopping analyzer); pairs restricted to the DFA alphabet. */
  private def freqOf(dfa: TermAutomatonDfa.Dfa, text: String): Int = {
    val tid = dfa.terms.zipWithIndex.toMap
    val pairs = text.split(" ").zipWithIndex
      .flatMap { case (t, p) => tid.get(t).map(id => (p, id)) }
      .sortBy(x => (x._1, x._2)).toSeq
    TermAutomatonDfa.countMatches(dfa, pairs)
  }
  private def matches(dfa: TermAutomatonDfa.Dfa, text: String): Boolean =
    freqOf(dfa, text) > 0

  // "comes * sun" (testBasic1)
  private val comesAnySun = TermAutomatonDfa.compile(TermAutomatonQ(
    numStates = 4, accept = Set(3),
    transitions = Seq((0, 1, "comes"), (2, 3, "sun")),
    anyTransitions = Seq((1, 2))))

  test("testBasic1: comes * sun") {
    assert(matches(comesAnySun, "here comes the sun"))
    assert(!matches(comesAnySun, "here comes the other sun"))
  }

  test("testBasicSynonym: comes * (sun|moon)") {
    val dfa = TermAutomatonDfa.compile(TermAutomatonQ(4, Set(3),
      Seq((0, 1, "comes"), (2, 3, "sun"), (2, 3, "moon")), Seq((1, 2))))
    assert(matches(dfa, "here comes the sun"))
    assert(matches(dfa, "here comes the moon"))
  }

  test("testBasicSlop: comes sun | comes * sun") {
    val dfa = TermAutomatonDfa.compile(TermAutomatonQ(4, Set(3),
      Seq((0, 1, "comes"), (1, 3, "sun"), (2, 3, "sun")), Seq((1, 2))))
    assert(matches(dfa, "here comes the sun"))
    assert(matches(dfa, "here comes sun"))
    assert(!matches(dfa, "here comes the other sun"))
  }

  test("testFreq: freq counts every accepting entry") {
    assert(freqOf(comesAnySun,
      "here comes the sun foo bar here comes another sun here comes shiny sun") == 3)
    assert(freqOf(comesAnySun, "here comes the other sun") == 0)
  }

  test("testWithCycles1: accept at initial, (here comes)+") {
    val dfa = TermAutomatonDfa.compile(TermAutomatonQ(2, Set(0),
      Seq((0, 1, "here"), (1, 0, "comes"))))
    assert(matches(dfa, "here comes here comes"))
    assert(!matches(dfa, "comes here"))
  }

  test("testWithCycles2: self-loop sun+") {
    val dfa = TermAutomatonDfa.compile(TermAutomatonQ(5, Set(4),
      Seq((0, 1, "here"), (1, 2, "comes"), (2, 3, "sun"), (3, 3, "sun"),
        (3, 4, "kaoma"))))
    assert(!matches(dfa, "here comes kaoma"))
    assert(matches(dfa, "here comes sun sun sun sun kaoma"))
  }

  test("variable-length alternation (what MultiPhraseQ cannot express)") {
    val dfa = TermAutomatonDfa.compile(TermAutomatonQ(4, Set(3),
      Seq((0, 1, "stream"), (1, 2, "table"), (2, 3, "hash"),
        (1, 3, "hash"))))
    assert(matches(dfa, "a stream table hash b"))
    assert(matches(dfa, "a stream hash b"))
    assert(!matches(dfa, "a stream table b hash"))
    // one short-path and one long-path occurrence both count
    assert(freqOf(dfa, "stream hash stream table hash") == 2)
  }

  test("ANY advances through gaps of non-query tokens (chained)") {
    // comes * * sun: two chained ANY hops
    val dfa = TermAutomatonDfa.compile(TermAutomatonQ(5, Set(4),
      Seq((0, 1, "comes"), (3, 4, "sun")),
      anyTransitions = Seq((1, 2), (2, 3))))
    assert(matches(dfa, "comes x y sun"))
    assert(!matches(dfa, "comes x sun"))
    assert(!matches(dfa, "comes x y z sun"))
  }

  test("finish() rejections: leading/trailing ANY") {
    intercept[IllegalArgumentException] {
      TermAutomatonDfa.compile(TermAutomatonQ(3, Set(2),
        Seq((1, 2, "sun")), Seq((0, 1))))
    }
    intercept[IllegalArgumentException] {
      TermAutomatonDfa.compile(TermAutomatonQ(3, Set(2),
        Seq((0, 1, "comes")), Seq((1, 2))))
    }
  }
}
