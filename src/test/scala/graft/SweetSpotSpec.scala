package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search.SweetSpot

/** SweetSpotSimilarity properties from the reference's
  * SweetSpotSimilarityTest.java:55-200. */
class SweetSpotSpec extends AnyFunSuite {

  test("lengthNorm: base case degrades to 1/sqrt(n) (testSweetSpotComputeNorm)") {
    for (n <- 1 until 1000)
      assert(SweetSpot.computeLengthNorm(n.toFloat, 1, 1, 0.5f) ==
        (1.0 / math.sqrt(n.toDouble)).toFloat, s"n=$n")
  }

  test("lengthNorm: plateau is exactly 1.0, symmetric decay outside") {
    for (n <- 3 to 10)
      assert(SweetSpot.computeLengthNorm(n.toFloat, 3, 10, 0.5f) == 1.0f)
    // same distance off either edge gives the same norm
    assert(SweetSpot.computeLengthNorm(2f, 3, 10, 0.5f) ==
      SweetSpot.computeLengthNorm(11f, 3, 10, 0.5f))
    // strictly decreasing with distance
    val outs = (11 to 30).map(n => SweetSpot.computeLengthNorm(n.toFloat, 3, 10, 0.5f))
    assert(outs == outs.sorted.reverse && outs.distinct.size == outs.size)
    assert(outs.head < 1.0f)
  }

  test("baselineTf (testSweetSpotTf)") {
    for (i <- 1 until 1000) { // base=0, min=0 degrades to sqrt
      assert(SweetSpot.baselineTf(i.toFloat) ==
        math.sqrt(i.toDouble).toFloat, s"i=$i")
      // base=1 is strictly higher than sqrt
      assert(math.sqrt(i.toDouble).toFloat <
        SweetSpot.baselineTf(i.toFloat, base = 1.0f))
    }
    // flat floor up to min, then continuous sqrt
    for (i <- 1 to 6)
      assert(SweetSpot.baselineTf(i.toFloat, base = 1.0f, min = 6.0f) == 1.0f)
    assert(SweetSpot.baselineTf(7f, 1.0f, 6.0f) ==
      math.sqrt(7 + 1.0 - 6).toFloat)
    assert(SweetSpot.baselineTf(0f, 1.0f, 6.0f) == 0.0f) // tf zero
  }

  test("hyperbolicTf bounded in (min, max), monotone, midpoint at xoffset") {
    val tf = (f: Float) => SweetSpot.hyperbolicTf(f, 3.3f, 7.7f, math.E, 5.0f)
    var prev = 0.0f
    for (i <- 1 to 1000) {
      val v = tf(i.toFloat)
      assert(v > 3.3f && v <= 7.7f, s"i=$i v=$v") // float tanh saturates to max
      assert(v >= prev, s"monotone at $i")
      prev = v
    }
    assert(math.abs(tf(5.0f) - (3.3f + 7.7f) / 2) < 1e-5f) // x = 0 midpoint
  }
}
