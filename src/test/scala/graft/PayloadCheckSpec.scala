package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search.JoinScorer

/** Payload-check span semantics (reference spans/SpanPayloadCheckQuery
  * .java acceptPosition — ordered list compare — and
  * SpanNearPayloadCheckQuery.java — match-any counting), plus the
  * orderedSpanMatches walk they are built on.
  */
class PayloadCheckSpec extends AnyFunSuite {

  private def freqVia(byTerm: Array[Array[Int]], n: Int, slop: Int): Int =
    JoinScorer.orderedSpanMatches(byTerm, n, slop).size

  test("orderedSpanMatches agrees with orderedSpanFreq on random inputs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(3)
      val byTerm = Array.fill(n)(
        Array.fill(1 + rnd.nextInt(6))(rnd.nextInt(30)).distinct.sorted)
      val slop = rnd.nextInt(4)
      assert(freqVia(byTerm, n, slop) ===
        JoinScorer.orderedSpanFreq(byTerm, n, slop))
    }
  }

  test("orderedSpanMatches yields the greedy chain positions") {
    // table at 0 and 10; scan at 3, 12 — greedy pairs (0,3) and (10,12)
    val byTerm = Array(Array(0, 10), Array(3, 12))
    val ms = JoinScorer.orderedSpanMatches(byTerm, 2, 10).toList
    assert(ms.map(_.toList) === List(List(0, 3), List(10, 12)))
    // slop 1: only (10,12) has width-2 <= 1
    val tight = JoinScorer.orderedSpanMatches(byTerm, 2, 1).toList
    assert(tight.map(_.toList) === List(List(10, 12)))
  }

  test("single-term check: every occurrence is its own span") {
    val byTerm = Array(Array(1, 5, 25))
    val ms = JoinScorer.orderedSpanMatches(byTerm, 1, 0).toList
    assert(ms.map(_.toList) === List(List(1), List(5), List(25)))
  }

  test("leadPayload channel boundary") {
    assert(JoinScorer.leadPayload(0) === 2f)
    assert(JoinScorer.leadPayload(19) === 2f)
    assert(JoinScorer.leadPayload(20) === 1f)
  }

  // the accept rules as implemented in spanPayloadCheckHits
  private def acceptOrdered(cand: Array[Float], exp: Array[Float]): Boolean =
    cand.length == exp.length && cand.indices.forall(i => cand(i) == exp(i))
  private def acceptNear(cand: Array[Float], exp: Array[Float]): Boolean =
    cand.length == exp.length &&
      cand.count(c => exp.contains(c)) == exp.length

  test("ordered compare (SpanPayloadCheckQuery): order matters") {
    assert(acceptOrdered(Array(2f, 1f), Array(2f, 1f)))
    assert(!acceptOrdered(Array(1f, 2f), Array(2f, 1f)))
    assert(!acceptOrdered(Array(2f), Array(2f, 1f)))
  }

  test("match-any counting (SpanNearPayloadCheckQuery): order-free") {
    assert(acceptNear(Array(1f, 2f), Array(2f, 1f)))
    assert(acceptNear(Array(2f, 2f), Array(2f, 2f)))
    // a candidate not matching ANY expected payload fails the count
    assert(!acceptNear(Array(2f, 1f), Array(2f, 2f)))
  }
}
