package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search.SloppyMatch

/** Differential property test: the engine's heap-based SloppyPhraseScorer
  * walk ([[SloppyMatch]]) against the NaiveOracle's scan-min re-derivation
  * on thousands of random position configurations — exercises crossing
  * order, window minimization, repeat-group init and collision
  * resolution far beyond what corpus queries reach. */
class SloppyWalkPropertySpec extends AnyFunSuite {

  private def naive(terms: Seq[String], rel: Seq[Int],
                    pos: Map[String, Vector[Int]], slop: Int): Float =
    NaiveOracle.sloppyWalkFreq(terms, rel, pos, slop)

  private def engine(terms: Seq[String], rel: Seq[Int],
                     pos: Map[String, Vector[Int]], slop: Int): Float = {
    val byTerm = terms.map(t => pos(t).toArray).toArray
    val rptSlots = terms.zipWithIndex.groupBy(_._1).valuesIterator
      .filter(_.length > 1).map(_.map(_._2).toArray).toArray
    SloppyMatch.freq(byTerm, rel.toArray, slop, rptSlots)
  }

  test("randomized no-repeat phrases: engine freq == naive freq") {
    val rng = new scala.util.Random(20260819L)
    var checked = 0
    for (_ <- 1 to 3000) {
      val n = 2 + rng.nextInt(3)
      val terms = (0 until n).map(i => s"t$i")
      val rel = (0 until n).map(identity)
      val pos = terms.map { t =>
        val k = 1 + rng.nextInt(5)
        t -> Iterator.continually(rng.nextInt(30)).take(k)
          .toVector.distinct.sorted
      }.toMap
      val slop = rng.nextInt(6)
      val e = engine(terms, rel, pos, slop)
      val o = naive(terms, rel, pos, slop)
      assert(e === o, s"terms=$terms pos=$pos slop=$slop")
      checked += 1
    }
    assert(checked == 3000)
  }

  test("randomized phrases WITH repeated terms: engine == naive") {
    val rng = new scala.util.Random(42L)
    var nonZero = 0
    for (_ <- 1 to 3000) {
      val n = 2 + rng.nextInt(3)
      // force repeats: draw slots from a 2-term alphabet
      val terms = (0 until n).map(_ => s"t${rng.nextInt(2)}")
      val rel = (0 until n).map(identity)
      val pos = terms.distinct.map { t =>
        val k = n + rng.nextInt(5) // enough occurrences for group init
        t -> Iterator.continually(rng.nextInt(25)).take(k)
          .toVector.distinct.sorted
      }.toMap
      val slop = rng.nextInt(6)
      val e = engine(terms, rel, pos, slop)
      val o = naive(terms, rel, pos, slop)
      assert(e === o, s"terms=$terms pos=$pos slop=$slop")
      if (e > 0f) nonZero += 1
    }
    assert(nonZero > 100) // the sweep must actually hit matching configs
  }

  test("irregular rel offsets (stopword gaps) agree too") {
    val rng = new scala.util.Random(7L)
    for (_ <- 1 to 2000) {
      val n = 2 + rng.nextInt(2)
      val terms = (0 until n).map(i => s"t$i")
      // strictly increasing rel with gaps
      val rel = terms.indices.scanLeft(0)((a, _) => a + 1 + rng.nextInt(2)).take(n)
      val pos = terms.map { t =>
        t -> Iterator.continually(rng.nextInt(20)).take(1 + rng.nextInt(4))
          .toVector.distinct.sorted
      }.toMap
      val slop = rng.nextInt(5)
      assert(engine(terms, rel, pos, slop) === naive(terms, rel, pos, slop),
        s"terms=$terms rel=$rel pos=$pos slop=$slop")
    }
  }
}
