package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search.{PhraseQ, Percolator, SloppyPhraseQ}

/** Multi-valued field positionIncrementGap semantics (reference
  * index/DefaultIndexingChain.java:577-583 + Solr's
  * positionIncrementGap="100" on text fields): phrase/proximity queries
  * must not match across value boundaries; trailing stopword increments
  * and empty instances still advance the position counter. */
class MultiValuedGapSpec extends AnyFunSuite {

  test("gap offsets between values") {
    val ix = Percolator.docIndexMulti(Seq("spark merge", "window sort"), "en")
    assert(ix("spark") === Vector(0))
    assert(ix("merge") === Vector(1))
    assert(ix("window") === Vector(102))
    assert(ix("sort") === Vector(103))
  }

  test("phrases cannot cross the value boundary") {
    val multi = Percolator.docIndexMulti(Seq("spark merge", "window sort"), "en")
    val single = Percolator.docIndex("spark merge window sort", "en")
    val cross = PhraseQ(Seq("merge", "window"), Seq(0, 1))
    val inner = PhraseQ(Seq("spark", "merge"), Seq(0, 1))
    assert(!Percolator.matches(multi, cross))
    assert(Percolator.matches(single, cross))
    assert(Percolator.matches(multi, inner))
    // even a generous slop (far below the 100 gap) cannot bridge it
    assert(!Percolator.matches(multi,
      SloppyPhraseQ(Seq("merge", "window"), Seq(0, 1), 50)))
    // ...but a slop >= the gap distance can, exactly like the reference
    assert(Percolator.matches(multi,
      SloppyPhraseQ(Seq("merge", "window"), Seq(0, 1), 100)))
  }

  test("trailing stopwords advance the counter (TokenStream.end posInc)") {
    val ix = Percolator.docIndexMulti(Seq("spark the", "window"), "en")
    assert(ix("spark") === Vector(0))
    assert(!ix.contains("the"))
    assert(ix("window") === Vector(102)) // raw length 2 + gap, not 1 + gap
  }

  test("empty middle instance still pays the gap; leading empties do not") {
    val ix = Percolator.docIndexMulti(Seq("spark", "", "sort"), "en")
    assert(ix("spark") === Vector(0))
    assert(ix("sort") === Vector(201)) // two gaps
    val lead = Percolator.docIndexMulti(Seq("", "spark"), "en")
    assert(lead("spark") === Vector(0)) // no tokens yet -> no gap
  }

  test("gap 0 concatenates positions (Lucene default analyzer gap)") {
    val ix = Percolator.docIndexMulti(Seq("spark merge", "window"), "en",
      positionIncrementGap = 0)
    assert(ix("window") === Vector(2))
  }
}
