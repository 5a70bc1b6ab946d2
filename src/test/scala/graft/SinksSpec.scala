package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Sinks, Tokenizers}

/** Tee/sink routing against the reference sink tests
  * (sinks/{DateRecognizerSinkTokenizerTest,TokenRangeSinkTokenizerTest,
  * TokenTypeSinkTokenizerTest,TestTeeSinkTokenFilter}.java). */
class SinksSpec extends AnyFunSuite {

  test("date recognizer sink: 2 of 18 tokens parse as MM/dd/yyyy") {
    val text = "The quick red fox jumped over the lazy brown dogs on " +
      "7/11/2006  The dogs finally reacted on 7/12/2006"
    val toks = Tokenizers.whitespace(text)
    assert(toks.length === 18)
    val (pass, Vector(dates)) =
      Sinks.tee(toks, Seq(Sinks.dateRecognizer("MM/dd/yyyy")))
    assert(pass.length === 18)
    assert(dates.map(_.term) === Vector("7/11/2006", "7/12/2006"))
  }

  test("token range sink: [2, 4) keeps stream positions 2 and 3") {
    val toks = Tokenizers.whitespace(
      "The quick red fox jumped over the lazy brown dogs")
    val (_, Vector(ranged)) = Sinks.tee(toks, Seq(Sinks.tokenRange(2, 4)))
    assert(ranged.map(_.term) === Vector("red", "fox"))
    intercept[IllegalArgumentException] { Sinks.tokenRange(0, 4) }
    intercept[IllegalArgumentException] { Sinks.tokenRange(5, 4) }
  }

  test("token type sink routes by type; tee runs ONE pass for N sinks") {
    val toks = Tokenizers.whitespace("The quick red dogs The end")
      .map(t => if (t.term == "dogs") t.copy(tokenType = "D") else t)
    val theFilter: Sinks.SinkFilter =
      () => t => t.term.equalsIgnoreCase("The") // TestTeeSinkTokenFilter.theFilter
    val (pass, sunk) = Sinks.tee(toks,
      Seq(Sinks.tokenType("D"), theFilter, Sinks.tokenRange(1, 3)))
    assert(pass.map(_.term) === toks.map(_.term))
    assert(sunk(0).map(_.term) === Vector("dogs"))
    assert(sunk(1).map(_.term) === Vector("The", "The"))
    assert(sunk(2).map(_.term) === Vector("quick", "red"))
  }

  test("range sink state is fresh per pass") {
    val sink = Sinks.tokenRange(1, 2)
    val toks = Tokenizers.whitespace("a b c")
    val first = Sinks.tee(toks, Seq(sink))._2.head
    val second = Sinks.tee(toks, Seq(sink))._2.head
    assert(first.map(_.term) === Vector("b"))
    assert(second.map(_.term) === Vector("b"))
  }
}
