package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{NGrams, Shingles, Token}

/** Golden vectors from the reference tests:
  *  - ngram/NGramTokenFilterTest.java:68-141
  *  - ngram/EdgeNGramTokenFilterTest.java:80-163
  *  - ngram/NGramTokenizerTest.java:69-101, EdgeNGramTokenizerTest.java
  *  - shingle/ShingleFilterTest.java:40-780 (incl. holes, posIncr == N
  *    and > N, min/max size combos, separators, unigram suppression)
  */
class NGramShingleSpec extends AnyFunSuite {

  private def ws(text: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    while (i < text.length) {
      while (i < text.length && text(i) == ' ') i += 1
      if (i < text.length) {
        val start = i
        while (i < text.length && text(i) != ' ') i += 1
        out += Token(text.substring(start, i), start, i, 1, "word")
      }
    }
    out.result()
  }

  private def terms(ts: Seq[Token]) = ts.map(_.term)
  private def incs(ts: Seq[Token]) = ts.map(_.posInc)
  private def offs(ts: Seq[Token]) = ts.map(t => (t.startOffset, t.endOffset))

  // ---------------- NGramTokenFilter ----------------

  test("NGramTokenFilter vectors (testUnigrams/Bigrams/Ngrams)") {
    val in = ws("abcde")
    val u = NGrams.filter(in, 1, 1)
    assert(terms(u) == Seq("a", "b", "c", "d", "e"))
    assert(incs(u) == Seq(1, 0, 0, 0, 0))
    assert(offs(u).forall(_ == (0, 5))) // offsets NOT updated (4.4 semantics)

    val b = NGrams.filter(in, 2, 2)
    assert(terms(b) == Seq("ab", "bc", "cd", "de"))
    assert(incs(b) == Seq(1, 0, 0, 0))

    val n = NGrams.filter(in, 1, 3)
    assert(terms(n) == Seq("a", "ab", "abc", "b", "bc", "bcd", "c", "cd",
      "cde", "d", "de", "e"))
    assert(incs(n) == Seq(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))

    assert(NGrams.filter(in, 6, 7).isEmpty) // testOversizedNgrams
  }

  test("NGramTokenFilter: short tokens drop but keep the position gap") {
    // testSmallTokenInStream: "abc de fgh" min=max=3 -> abc(1), fgh(2)
    val r = NGrams.filter(ws("abc de fgh"), 3, 3)
    assert(terms(r) == Seq("abc", "fgh"))
    assert(incs(r) == Seq(1, 2))
    assert(offs(r) == Seq((0, 3), (7, 10)))
  }

  // ---------------- EdgeNGramTokenFilter ----------------

  test("EdgeNGramTokenFilter vectors") {
    val in = ws("abcde")
    assert(terms(NGrams.edgeFilter(in, 1, 1)) == Seq("a"))
    assert(NGrams.edgeFilter(in, 6, 6).isEmpty)
    val r = NGrams.edgeFilter(in, 1, 3)
    assert(terms(r) == Seq("a", "ab", "abc"))
    assert(offs(r).forall(_ == (0, 5)))

    // testFilterPositions
    val two = NGrams.edgeFilter(ws("abcde vwxyz"), 1, 3)
    assert(terms(two) == Seq("a", "ab", "abc", "v", "vw", "vwx"))
    assert(incs(two) == Seq(1, 0, 0, 1, 0, 0))
    assert(offs(two) == Seq((0, 5), (0, 5), (0, 5), (6, 11), (6, 11), (6, 11)))

    // testFirstTokenPositionIncrement: "a"(1) too short, "abc"(0) ->
    // accumulated increment 1 rides on the first gram
    val acc = NGrams.edgeFilter(Vector(
      Token("a", 0, 1, 1, "word"), Token("abc", 2, 5, 0, "word")), 2, 3)
    assert(terms(acc) == Seq("ab", "abc"))
    assert(incs(acc) == Seq(1, 0))

    // testSmallTokenInStream
    val sm = NGrams.edgeFilter(ws("abc de fgh"), 3, 3)
    assert(terms(sm) == Seq("abc", "fgh"))
    assert(incs(sm) == Seq(1, 2))
  }

  // ---------------- NGramTokenizer / EdgeNGramTokenizer ----------------

  test("NGramTokenizer vectors (real offsets, posInc always 1)") {
    val u = NGrams.tokenize("abcde", 1, 1)
    assert(terms(u) == Seq("a", "b", "c", "d", "e"))
    assert(offs(u) == Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 5)))
    assert(incs(u).forall(_ == 1))

    val b = NGrams.tokenize("abcde", 2, 2)
    assert(terms(b) == Seq("ab", "bc", "cd", "de"))
    assert(offs(b) == Seq((0, 2), (1, 3), (2, 4), (3, 5)))

    val n = NGrams.tokenize("abcde", 1, 3)
    assert(terms(n) == Seq("a", "ab", "abc", "b", "bc", "bcd", "c", "cd",
      "cde", "d", "de", "e"))
    assert(offs(n) == Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (1, 4),
      (2, 3), (2, 4), (2, 5), (3, 4), (3, 5), (4, 5)))

    assert(NGrams.tokenize("abcde", 6, 7).isEmpty)
  }

  test("NGramTokenizer: non-token chars split grams; edgesOnly") {
    // pre-tokenized grams never cross a space
    val letterOnly = (cp: Int) => cp != ' '.toInt
    val r = NGrams.tokenize("ab cd", 2, 2, isTokenChar = letterOnly)
    assert(terms(r) == Seq("ab", "cd"))
    // default: grams DO cross spaces
    assert(terms(NGrams.tokenize("ab cd", 2, 2)) == Seq("ab", "b ", " c", "cd"))
    // EdgeNGramTokenizer = edgesOnly: grams only at token-run starts
    val e = NGrams.tokenize("ab cd", 1, 2, edgesOnly = true,
      isTokenChar = letterOnly)
    assert(terms(e) == Seq("a", "ab", "c", "cd"))
    // default edge tokenizer (all chars are token chars): prefix of input
    assert(terms(NGrams.tokenize("abcde", 1, 3, edgesOnly = true)) ==
      Seq("a", "ab", "abc"))
  }

  // ---------------- ShingleFilter ----------------

  private val sentence = "please divide this sentence into shingles"
  private val testToks = Vector(
    Token("please", 0, 6, 1, "word"), Token("divide", 7, 13, 1, "word"),
    Token("this", 14, 18, 1, "word"), Token("sentence", 19, 27, 1, "word"),
    Token("into", 28, 32, 1, "word"), Token("shingles", 33, 39, 1, "word"))
  private val toksWithHoles = Vector(
    Token("please", 0, 6, 1, "word"), Token("divide", 7, 13, 1, "word"),
    Token("sentence", 19, 27, 2, "word"), Token("shingles", 33, 39, 2, "word"))

  test("ShingleFilter bigrams (testBiGramFilter)") {
    val r = Shingles.filter(testToks)
    assert(terms(r) == Seq("please", "please divide", "divide",
      "divide this", "this", "this sentence", "sentence", "sentence into",
      "into", "into shingles", "shingles"))
    assert(incs(r) == Seq(1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1))
    assert(r.map(_.tokenType) == Seq("word", "shingle", "word", "shingle",
      "word", "shingle", "word", "shingle", "word", "shingle", "word"))
    assert(offs(r) == Seq((0, 6), (0, 13), (7, 13), (7, 18), (14, 18),
      (14, 27), (19, 27), (19, 32), (28, 32), (28, 39), (33, 39)))
  }

  test("ShingleFilter bigrams with holes (testBiGramFilterWithHoles)") {
    val r = Shingles.filter(toksWithHoles)
    assert(terms(r) == Seq("please", "please divide", "divide", "divide _",
      "_ sentence", "sentence", "sentence _", "_ shingles", "shingles"))
    assert(incs(r) == Seq(1, 0, 1, 0, 1, 1, 0, 1, 1))
    assert(offs(r) == Seq((0, 6), (0, 13), (7, 13), (7, 19), (19, 27),
      (19, 27), (19, 33), (33, 39), (33, 39)))
  }

  test("ShingleFilter without unigrams (+ holes)") {
    val r = Shingles.filter(testToks, outputUnigrams = false)
    assert(terms(r) == Seq("please divide", "divide this", "this sentence",
      "sentence into", "into shingles"))
    assert(incs(r) == Seq(1, 1, 1, 1, 1))
    val h = Shingles.filter(toksWithHoles, outputUnigrams = false)
    assert(terms(h) == Seq("please divide", "divide _", "_ sentence",
      "sentence _", "_ shingles"))
    assert(incs(h) == Seq(1, 1, 1, 1, 1))
  }

  test("ShingleFilter trigrams (testTriGramFilter + min=3 variants)") {
    val r = Shingles.filter(testToks, maxShingleSize = 3)
    assert(terms(r) == Seq(
      "please", "please divide", "please divide this",
      "divide", "divide this", "divide this sentence",
      "this", "this sentence", "this sentence into",
      "sentence", "sentence into", "sentence into shingles",
      "into", "into shingles", "shingles"))
    assert(incs(r) == Seq(1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 1))

    val m3 = Shingles.filter(testToks, minShingleSize = 3, maxShingleSize = 3)
    assert(terms(m3) == Seq("please", "please divide this", "divide",
      "divide this sentence", "this", "this sentence into", "sentence",
      "sentence into shingles", "into", "shingles"))
    assert(incs(m3) == Seq(1, 0, 1, 0, 1, 0, 1, 0, 1, 1))

    val m34 = Shingles.filter(testToks, minShingleSize = 3, maxShingleSize = 4,
      outputUnigrams = false)
    assert(terms(m34) == Seq("please divide this", "please divide this sentence",
      "divide this sentence", "divide this sentence into",
      "this sentence into", "this sentence into shingles",
      "sentence into shingles"))
    assert(incs(m34) == Seq(1, 0, 1, 0, 1, 0, 1))
  }

  test("ShingleFilter hole == maxShingleSize (testPositionIncrementEqualToN)") {
    val in = Vector(
      Token("please", 0, 6, 1, "word"), Token("divide", 7, 13, 1, "word"),
      Token("this", 14, 18, 1, "word"), Token("sentence", 29, 37, 3, "word"),
      Token("into", 38, 42, 1, "word"), Token("shingles", 43, 49, 1, "word"))
    val r = Shingles.filter(in, minShingleSize = 2, maxShingleSize = 3)
    assert(terms(r) == Seq(
      "please", "please divide", "please divide this",
      "divide", "divide this", "divide this _",
      "this", "this _", "this _ _",
      "_ _ sentence", "_ sentence", "_ sentence into",
      "sentence", "sentence into", "sentence into shingles",
      "into", "into shingles", "shingles"))
    assert(incs(r) == Seq(1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 1, 0, 1, 0, 0, 1, 0, 1))
    assert(offs(r)(5) == (7, 29)) // "divide this _" ends at sentence.start
    assert(offs(r)(9) == (29, 37)) // "_ _ sentence" starts at sentence.start
  }

  test("ShingleFilter hole > maxShingleSize caps fillers (testPositionIncrementGreaterThanN)") {
    val in = Vector(
      Token("please", 0, 6, 1, "word"), Token("divide", 57, 63, 8, "word"),
      Token("this", 64, 68, 1, "word"), Token("sentence", 69, 77, 1, "word"),
      Token("into", 78, 82, 1, "word"), Token("shingles", 83, 89, 1, "word"))
    val r = Shingles.filter(in, minShingleSize = 2, maxShingleSize = 3)
    assert(terms(r) == Seq(
      "please", "please _", "please _ _",
      "_ _ divide", "_ divide", "_ divide this",
      "divide", "divide this", "divide this sentence",
      "this", "this sentence", "this sentence into",
      "sentence", "sentence into", "sentence into shingles",
      "into", "into shingles", "shingles"))
    assert(incs(r) == Seq(1, 0, 0, 1, 1, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 1))
  }

  test("ShingleFilter separators, single token, unigramsIfNoShingles") {
    val noSep = Shingles.filter(testToks.take(2), separator = "")
    assert(terms(noSep) == Seq("please", "pleasedivide", "divide"))
    val alt = Shingles.filter(testToks.take(2), separator = "<SEP>")
    assert(terms(alt) == Seq("please", "please<SEP>divide", "divide"))

    val single = Vector(Token("please", 0, 6, 1, "word"))
    assert(terms(Shingles.filter(single)) == Seq("please"))
    assert(Shingles.filter(single, outputUnigrams = false).isEmpty)
    assert(terms(Shingles.filter(single, outputUnigrams = false,
      outputUnigramsIfNoShingles = true)) == Seq("please"))
    assert(Shingles.filter(Vector.empty).isEmpty)
  }
}
