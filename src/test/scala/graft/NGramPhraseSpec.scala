package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search.NGramPhrase

/** NGramPhraseQuery rewrite — the reference TestNGramPhraseQuery
  * .testRewrite vectors, plus the sparse-match equivalence the
  * optimization rests on. */
class NGramPhraseSpec extends AnyFunSuite {

  test("2 terms: too short to optimize (unchanged)") {
    assert(NGramPhrase.rewrite(Seq("AB", "BC"), Seq(0, 1), 2) ===
      ((Seq("AB", "BC"), Seq(0, 1))))
  }

  test("n=2, AB BC CD -> AB@0 CD@2") {
    assert(NGramPhrase.rewrite(Seq("AB", "BC", "CD"), Seq(0, 1, 2), 2) ===
      ((Seq("AB", "CD"), Seq(0, 2))))
  }

  test("n=3, 6 trigrams -> ABC@0 DEF@3 FGH@5") {
    assert(NGramPhrase.rewrite(
      Seq("ABC", "BCD", "CDE", "DEF", "EFG", "FGH"),
      Seq(0, 1, 2, 3, 4, 5), 3) ===
      ((Seq("ABC", "DEF", "FGH"), Seq(0, 3, 5))))
  }

  test("bail conditions: slop, n<2, non-consecutive positions") {
    val t = Seq("AB", "BC", "CD")
    val p = Seq(0, 1, 2)
    assert(NGramPhrase.rewrite(t, p, 2, slop = 1) === ((t, p)))
    assert(NGramPhrase.rewrite(t, p, 1) === ((t, p)))
    assert(NGramPhrase.rewrite(t, Seq(0, 2, 3), 2) === ((t, Seq(0, 2, 3))))
  }

  test("sparse match == full substring containment on random words") {
    val rnd = new scala.util.Random(3)
    val word0 = "window"
    val grams = (0 to word0.length - 2).map(i => word0.substring(i, i + 2))
    val (optT, optP) = NGramPhrase.rewrite(grams, grams.indices, 2)
    for (_ <- 1 to 2000) {
      val w = (0 until 3 + rnd.nextInt(12))
        .map(_ => "windo"(rnd.nextInt(5))).mkString
      assert(NGramPhrase.matchesWord(w, optT, optP, 2) === w.contains(word0),
        s"word $w")
    }
    assert(NGramPhrase.matchesWord("window", optT, optP, 2))
    assert(NGramPhrase.matchesWord("xwindowsy", optT, optP, 2))
    assert(!NGramPhrase.matchesWord("windook", optT, optP, 2))
    assert(!NGramPhrase.matchesWord("win", optT, optP, 2))
  }
}
