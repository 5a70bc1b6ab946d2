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

  private val wifiDocs = Seq(
    "speedy wifi network" -> true,
    "speedy wi fi network" -> true,
    "fast wifi network" -> true,
    "fast wi fi network" -> true,
    "slow wi fi network" -> false)

  test("testPosLengthAtQueryTimeMock: (fast|speedy) (wifi | wi fi) network") {
    val dfa = TermAutomatonDfa.compile(TermAutomatonQ(5, Set(4),
      Seq((0, 1, "fast"), (0, 1, "speedy"), (1, 2, "wi"), (1, 3, "wifi"),
        (2, 3, "fi"), (3, 4, "network"))))
    wifiDocs.foreach { case (text, exp) =>
      assert(matches(dfa, text) == exp, text)
    }
  }

  test("testPosLengthAtQueryTimeTrueish: token graph via fromTokens (posLength=2)") {
    val q = TermAutomatonDfa.fromTokens(Seq(
      ("fast", 1, 1), ("speedy", 0, 1), ("wi", 1, 1), ("wifi", 0, 2),
      ("fi", 1, 1), ("network", 1, 1)))
    val dfa = TermAutomatonDfa.compile(q)
    wifiDocs.foreach { case (text, exp) =>
      assert(matches(dfa, text) == exp, text)
    }
  }

  test("fromTokens: '*' term becomes an ANY arc; holes rejected") {
    val q = TermAutomatonDfa.fromTokens(Seq(
      ("comes", 1, 1), ("*", 1, 1), ("sun", 1, 1)))
    val dfa = TermAutomatonDfa.compile(q)
    assert(matches(dfa, "here comes the sun"))
    assert(!matches(dfa, "here comes the other sun"))
    intercept[IllegalArgumentException] {
      TermAutomatonDfa.fromTokens(Seq(("comes", 1, 1), ("sun", 2, 1)))
    }
  }

  test("randomized differential: DFA freq == brute-force substring acceptance (no ANY)") {
    // freq without ANY and without same-position tokens = number of
    // (start, end) windows whose token sequence the automaton accepts
    // (the DFA merges NFA paths over the same consumed sequence, so each
    // accepted window counts exactly once per accepting prefix)
    val rnd = new scala.util.Random(42)
    val vocab = Array("a", "b", "c", "d")
    def accepts(dfa: TermAutomatonDfa.Dfa, seq: Seq[String]): Int = {
      val tid = dfa.terms.zipWithIndex.toMap
      var s = 0
      var hits = 0
      var i = 0
      var dead = false
      while (i < seq.length && !dead) {
        val t = tid.getOrElse(seq(i), -1)
        val ns = if (t == -1) -1 else dfa.delta(s)(t)
        if (ns == -1) dead = true
        else { s = ns; if (dfa.accept(ns)) hits += 1 }
        i += 1
      }
      hits
    }
    for (trial <- 0 until 200) {
      val nStates = 2 + rnd.nextInt(4)
      // forward-only arcs => acyclic
      val trans = (0 until (2 + rnd.nextInt(6))).flatMap { _ =>
        val f = rnd.nextInt(nStates - 1)
        val t = f + 1 + rnd.nextInt(nStates - 1 - f)
        if (f == 0 || rnd.nextBoolean()) Some((f, t, vocab(rnd.nextInt(vocab.length))))
        else None
      }
      if (trans.nonEmpty && trans.exists(_._1 == 0)) {
        val accept = (1 until nStates).filter(_ => rnd.nextBoolean()).toSet
        if (accept.nonEmpty) {
          val dfa = TermAutomatonDfa.compile(
            TermAutomatonQ(nStates, accept, trans))
          val doc = Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
          val exp = doc.indices.map(s => accepts(dfa, doc.drop(s))).sum
          val got = freqOf(dfa, doc.mkString(" "))
          assert(got == exp,
            s"trial $trial: $trans accept=$accept doc=$doc got=$got exp=$exp")
        }
      }
    }
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
