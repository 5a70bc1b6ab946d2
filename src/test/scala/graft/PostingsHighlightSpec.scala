package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search.PostingsHighlight
import graft.search.PostingsHighlight.Scorer

/** Passage model vs the reference PostingsHighlighter semantics. */
class PostingsHighlightSpec extends AnyFunSuite {

  private def offsets(content: String, term: String): Array[(Int, Int)] = {
    val lower = content.toLowerCase(java.util.Locale.ROOT)
    Iterator.iterate(lower.indexOf(term))(i => lower.indexOf(term, i + 1))
      .takeWhile(_ >= 0).map(i => (i, i + term.length)).toArray
  }

  test("selects the best sentences and formats matches") {
    val content = "Alpha beta gamma. Vector beta vector here. Gamma delta now. Vector again today."
    val offs = Map("vector" -> offsets(content, "vector"))
    val ps = PostingsHighlight.highlight(content, offs, 2)
    assert(ps.length == 2)
    // double-hit sentence must outscore the single-hit one
    assert(ps(0).score > ps(1).score)
    assert(PostingsHighlight.format(content, ps(0)) ==
      "<b>Vector</b> beta <b>vector</b> here. ")
    assert(PostingsHighlight.format(content, ps(1)) ==
      "<b>Vector</b> again today.")
  }

  test("maxPassages bounds the result, document order preserved") {
    val content = "Vector one. Filler two. Vector three. Vector four."
    val offs = Map("vector" -> offsets(content, "vector"))
    val ps = PostingsHighlight.highlight(content, offs, 2)
    assert(ps.length == 2)
    assert(ps(0).start < ps(1).start)
    // the no-hit sentence is never a passage
    assert(ps.forall(p => p.matches.nonEmpty))
  }

  test("scorer formulas match the reference constants") {
    val s = new Scorer()
    // weight(content=87*1, ttf=1): (k1+1)*ln(1+(2.5)/(1.5))
    assert(math.abs(s.weight(87, 1) -
      (2.2 * math.log(1 + 2.5 / 1.5))) < 1e-6)
    // tf(1, 87): 1/(1+k1)
    assert(math.abs(s.tf(1, 87) - 1.0 / (1 + 1.2)) < 1e-6)
    assert(math.abs(s.norm(0) - (1 + 1 / math.log(87.0))) < 1e-6)
  }

  test("multi-term passage accumulates per-term weights") {
    val content = "Spark vector works. Nothing here."
    val offs = Map(
      "vector" -> offsets(content, "vector"),
      "spark" -> offsets(content, "spark"))
    val ps = PostingsHighlight.highlight(content, offs, 5)
    assert(ps.length == 1)
    assert(ps(0).matches.length == 2)
    assert(PostingsHighlight.format(content, ps(0)) ==
      "<b>Spark</b> <b>vector</b> works. ")
  }
}
