package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Analyzer, WordnetSynonyms}

/** WordnetSynonymParser semantics vs the reference's
  * TestWordnetSynonymParser fixture (synsets by the 9-char id, ''
  * unescape, multi-word members, expand vs contract) and the
  * "Lost in the woods" expansion vector driven through the engine's own
  * synonym machinery. */
class WordnetSynonymsSpec extends AnyFunSuite {

  private val fixture = Seq(
    "s(100000001,1,'woods',n,1,0).",
    "s(100000001,2,'wood',n,1,0).",
    "s(100000001,3,'forest',n,1,0).",
    "s(100000002,1,'wolfish',n,1,0).",
    "s(100000002,2,'ravenous',n,1,0).",
    "s(100000003,1,'king',n,1,1).",
    "s(100000003,2,'baron',n,1,1).",
    "s(100000004,1,'king''s evil',n,1,1).",
    "s(100000004,2,'king''s meany',n,1,1).")

  test("expand mode: every member maps to every other; '' unescapes") {
    val m = WordnetSynonyms.parse(fixture).toMap
    assert(m("woods") == Seq("wood", "forest"))
    assert(m("wood") == Seq("woods", "forest"))
    assert(m("wolfish") == Seq("ravenous"))
    assert(m("king") == Seq("baron"))
    assert(m("king's evil") == Seq("king's meany"))
    assert(m("king's meany") == Seq("king's evil"))
  }

  test("contract mode: members map to the synset's FIRST entry") {
    val m = WordnetSynonyms.parse(fixture, expand = false).toMap
    assert(m("wood") == Seq("woods") && m("forest") == Seq("woods"))
    assert(!m.contains("woods"))
    assert(m("baron") == Seq("king"))
  }

  test("single-member synsets drop; malformed lines refuse") {
    assert(WordnetSynonyms.parse(Seq("s(100000009,1,'alone',n,1,0).")).isEmpty)
    intercept[IllegalArgumentException] {
      WordnetSynonyms.parse(Seq("x(bad)"))
    }
  }

  test("'Lost in the woods' expands through the engine synonym machinery " +
    "(TestWordnetSynonymParser vector)") {
    val rules = Analyzer.compileSynonyms(
      WordnetSynonyms.parse(fixture),
      t => Analyzer.analyzeFlat(t, Set.empty)._1)
    val (toks, poss) = Analyzer.analyzeFlat("Lost in the woods", Set.empty)
    val (terms, positions, _) =
      Analyzer.applySynonymsFlat(toks, poss, rules)
    // woods, wood and forest all at position 3 (posInc 0 overlaps)
    val at3 = terms.zip(positions).filter(_._2 == 3).map(_._1).toSet
    assert(at3 == Set("woods", "wood", "forest"))
    assert(terms.zip(positions).filter(_._2 < 3).map(_._1).toSeq ==
      Seq("lost", "in", "the"))
  }
}
