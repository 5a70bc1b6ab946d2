package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{StandardTokenizer, Token, Tokenizers}

/** Core tokenizer vectors from the reference's core/TestAnalyzers.java
  * and payloads/DelimitedPayloadTokenFilterTest.java. */
class TokenizersSpec extends AnyFunSuite {

  private def terms(ts: Seq[Token]) = ts.map(_.term)

  test("whitespace / letter / lowercase-letter / keyword tokenizers") {
    // TestAnalyzers.testSimple / testWhitespace vectors
    assert(terms(Tokenizers.lowerCaseLetter("foo bar FOO BAR")) ==
      Seq("foo", "bar", "foo", "bar"))
    assert(terms(Tokenizers.lowerCaseLetter("foo      bar .  FOO <> BAR")) ==
      Seq("foo", "bar", "foo", "bar"))
    assert(terms(Tokenizers.lowerCaseLetter("U.S.A.")) == Seq("u", "s", "a"))
    assert(terms(Tokenizers.lowerCaseLetter("C++")) == Seq("c"))
    assert(terms(Tokenizers.lowerCaseLetter("B2B")) == Seq("b", "b"))
    assert(terms(Tokenizers.whitespace("foo bar FOO BAR")) ==
      Seq("foo", "bar", "FOO", "BAR"))
    assert(terms(Tokenizers.whitespace("B2B")) == Seq("B2B"))
    assert(terms(Tokenizers.whitespace("2B")) == Seq("2B"))
    assert(terms(Tokenizers.letter("B2B")) == Seq("B", "B"))
    assert(terms(Tokenizers.keyword("ab cd")) == Seq("ab cd"))
    assert(Tokenizers.keyword("").isEmpty)
    // offsets
    val ws = Tokenizers.whitespace("ab  cd")
    assert(ws.map(t => (t.startOffset, t.endOffset)) == Seq((0, 2), (4, 6)))
  }

  test("TypeTokenFilter keeps/drops by type with position gaps") {
    val toks = StandardTokenizer.tokenize("one 2 three 44 five")
    assert(toks.map(_.tokenType) ==
      Seq("<ALPHANUM>", "<NUM>", "<ALPHANUM>", "<NUM>", "<ALPHANUM>"))
    val noNums = Tokenizers.typeFilter(toks, Set("<NUM>"))
    assert(terms(noNums) == Seq("one", "three", "five"))
    assert(noNums.map(_.posInc) == Seq(1, 2, 2))
    val onlyNums = Tokenizers.typeFilter(toks, Set("<NUM>"), useWhitelist = true)
    assert(terms(onlyNums) == Seq("2", "44"))
    assert(onlyNums.map(_.posInc) == Seq(2, 2))
  }

  test("DelimitedPayloadTokenFilter (reference test vector)") {
    val in = Tokenizers.whitespace(
      "The quick|2.0 red|7.0 fox|10 jumped|1.5 over the lazy|2 brown|99.1 dogs|83.7")
    val r = Tokenizers.delimitedPayload(in)
    assert(r.map(_._1.term) == Seq("The", "quick", "red", "fox", "jumped",
      "over", "the", "lazy", "brown", "dogs"))
    assert(r.map(_._2) == Seq(None, Some("2.0"), Some("7.0"), Some("10"),
      Some("1.5"), None, None, Some("2"), Some("99.1"), Some("83.7")))
    // first-delimiter split: "a|b|c" -> term a, payload "b|c"
    val multi = Tokenizers.delimitedPayload(Tokenizers.whitespace("a|b|c"))
    assert(multi == Vector((Token("a", 0, 5, 1, "word"), Some("b|c"))))
  }

  test("PayloadHelper big-endian encode/decode round-trips") {
    assert(Tokenizers.encodeFloat(3.0f).toSeq ==
      Seq(0x40.toByte, 0x40.toByte, 0, 0))
    for (v <- Seq(0, 1, -1, 42, Int.MaxValue, Int.MinValue))
      assert(Tokenizers.decodeInt(Tokenizers.encodeInt(v)) == v)
    for (v <- Seq(0f, 1.5f, -3.25f, Float.MaxValue))
      assert(Tokenizers.decodeFloat(Tokenizers.encodeFloat(v)) == v)
  }

  test("NumericPayloadTokenFilter: only matching type gets the payload") {
    // TestNumericPayloadTokenFilter shape: 'dogs' typed D carries 3.0f
    val toks = Tokenizers.whitespace("the quick red fox jumped over the lazy brown dogs")
      .map(t => if (t.term == "dogs") t.copy(tokenType = "D") else t)
    val out = Tokenizers.numericPayload(toks.map((_, None)), 3.0f, "D")
    out.foreach { case (t, p) =>
      if (t.term == "dogs") assert(p.exists(Tokenizers.decodeFloat(_) == 3.0f))
      else assert(p.isEmpty)
    }
  }

  test("TokenOffsetPayloadTokenFilter: payload = start ++ end") {
    val out = Tokenizers.tokenOffsetPayload(Tokenizers.whitespace("ab cdef"))
    assert(out.map { case (t, p) =>
      (t.term, Tokenizers.decodeInt(p, 0), Tokenizers.decodeInt(p, 4))
    } == Vector(("ab", 0, 2), ("cdef", 3, 7)))
  }

  test("TypeAsPayloadTokenFilter: payload = UTF-8 type bytes") {
    val toks = Tokenizers.whitespace("x y").map((_, None))
    val out = Tokenizers.typeAsPayload(toks)
    assert(out.forall(_._2.exists(b => new String(b, "UTF-8") == "word")))
    // empty type leaves the payload untouched
    val noType = Vector((Token("z", 0, 1, 1, ""), None))
    assert(Tokenizers.typeAsPayload(noType).head._2.isEmpty)
  }
}
