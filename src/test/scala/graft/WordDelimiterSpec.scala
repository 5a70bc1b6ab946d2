package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Token, WordDelimiter}
import graft.analysis.WordDelimiter._

/** Golden vectors from the reference's TestWordDelimiterFilter.java
  * (lucene/analysis/common/src/test/org/apache/lucene/analysis/
  * miscellaneous/TestWordDelimiterFilter.java:62-338), including the
  * documented posInc quirks. */
class WordDelimiterSpec extends AnyFunSuite {

  private val AllSplit = GenerateWordParts | GenerateNumberParts |
    SplitOnCaseChange | SplitOnNumerics | StemEnglishPossessive

  private def tok(term: String, so: Int, eo: Int, posInc: Int = 1): Token =
    Token(term, so, eo, posInc, "word")

  /** MockTokenizer.WHITESPACE equivalent: split on spaces, keep case. */
  private def ws(text: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    while (i < text.length) {
      while (i < text.length && text(i) == ' ') i += 1
      if (i < text.length) {
        val start = i
        while (i < text.length && text(i) != ' ') i += 1
        out += tok(text.substring(start, i), start, i)
      }
    }
    out.result()
  }

  private def terms(ts: Seq[Token]) = ts.map(_.term)
  private def starts(ts: Seq[Token]) = ts.map(_.startOffset)
  private def ends(ts: Seq[Token]) = ts.map(_.endOffset)
  private def incs(ts: Seq[Token]) = ts.map(_.posInc)

  test("offsets: legal and illegal input offsets (testOffsets)") {
    val flags = AllSplit | CatenateAll
    val r1 = filter(Vector(tok("foo-bar", 5, 12)), flags)
    assert(terms(r1) == Seq("foo", "foobar", "bar"))
    assert(starts(r1) == Seq(5, 5, 9))
    assert(ends(r1) == Seq(8, 12, 12))

    // illegal offsets (synonym-injected): everything keeps (5,6)
    val r2 = filter(Vector(tok("foo-bar", 5, 6)), flags)
    assert(terms(r2) == Seq("foo", "bar", "foobar"))
    assert(starts(r2) == Seq(5, 5, 5))
    assert(ends(r2) == Seq(6, 6, 6))
  }

  test("offset adjustment around stripped delimiters (testOffsetChange 1-4)") {
    val flags = AllSplit | CatenateAll
    val r1 = filter(Vector(tok("übelkeit)", 7, 16)), flags)
    assert(terms(r1) == Seq("übelkeit") && starts(r1) == Seq(7) && ends(r1) == Seq(15))
    val r2 = filter(Vector(tok("(übelkeit", 7, 17)), flags)
    assert(terms(r2) == Seq("übelkeit") && starts(r2) == Seq(8) && ends(r2) == Seq(17))
    val r3 = filter(Vector(tok("(übelkeit", 7, 16)), flags)
    assert(terms(r3) == Seq("übelkeit") && starts(r3) == Seq(8) && ends(r3) == Seq(16))
    val r4 = filter(Vector(tok("(foo,bar)", 7, 16)), flags)
    assert(terms(r4) == Seq("foo", "foobar", "bar"))
    assert(starts(r4) == Seq(8, 8, 12))
    assert(ends(r4) == Seq(11, 15, 15))
  }

  test("splits (testSplits)") {
    def doSplit(in: String, out: String*): Unit =
      assert(terms(filter(Vector(tok(in, 0, in.length)), AllSplit)) == out,
        s"input: $in")
    doSplit("basic-split", "basic", "split")
    doSplit("camelCase", "camel", "Case")
    doSplit("บ้าน", "บ้าน")
    doSplit("test's'", "test")
    doSplit("Роберт", "Роберт")
    doSplit("РобЕрт", "Роб", "Ерт")
    doSplit("aǅungla", "aǅungla")
    doSplit("ســـــــــــــــــلام", "ســـــــــــــــــلام")
    doSplit("test⃝", "test⃝")
    doSplit("हिन्दी", "हिन्दी")
    doSplit("١٢٣٤", "١٢٣٤")
    doSplit("𠀀𠀀", "𠀀𠀀")
  }

  test("possessive toggle (testPossessives)") {
    val withStem = AllSplit
    val noStem = GenerateWordParts | GenerateNumberParts |
      SplitOnCaseChange | SplitOnNumerics
    assert(terms(filter(Vector(tok("ra's", 0, 4)), withStem)) == Seq("ra"))
    assert(terms(filter(Vector(tok("ra's", 0, 4)), noStem)) == Seq("ra", "s"))
  }

  test("position increments incl. delimiter-only tokens (testPositionIncrements)") {
    val flags = AllSplit | CatenateAll
    val prot = Set("NUTCH")

    val r1 = filter(ws("LUCENE / SOLR"), flags, prot)
    assert(terms(r1) == Seq("LUCENE", "SOLR"))
    assert(starts(r1) == Seq(0, 9) && ends(r1) == Seq(6, 13))
    assert(incs(r1) == Seq(1, 1))

    val r2 = filter(ws("LUCENE / solR"), flags, prot)
    assert(terms(r2) == Seq("LUCENE", "sol", "solR", "R"))
    assert(starts(r2) == Seq(0, 9, 9, 12) && ends(r2) == Seq(6, 12, 13, 13))
    assert(incs(r2) == Seq(1, 1, 0, 1))

    val r3 = filter(ws("LUCENE / NUTCH SOLR"), flags, prot)
    assert(terms(r3) == Seq("LUCENE", "NUTCH", "SOLR"))
    assert(incs(r3) == Seq(1, 1, 1))

    // LargePosIncTokenFilter: "largegap" and "/" carry posInc 10
    def large(ts: Vector[Token]): Vector[Token] = ts.map(t =>
      if (t.term == "largegap" || t.term == "/") t.copy(posInc = 10) else t)

    val r4 = filter(large(ws("LUCENE largegap SOLR")), flags, prot)
    assert(terms(r4) == Seq("LUCENE", "largegap", "SOLR"))
    assert(incs(r4) == Seq(1, 10, 1))

    val r5 = filter(large(ws("LUCENE / SOLR")), flags, prot)
    assert(terms(r5) == Seq("LUCENE", "SOLR"))
    assert(incs(r5) == Seq(1, 11))

    val r6 = filter(large(ws("LUCENE / solR")), flags, prot)
    assert(terms(r6) == Seq("LUCENE", "sol", "solR", "R"))
    assert(incs(r6) == Seq(1, 11, 0, 1))

    val r7 = filter(large(ws("LUCENE / NUTCH SOLR")), flags, prot)
    assert(terms(r7) == Seq("LUCENE", "NUTCH", "SOLR"))
    assert(incs(r7) == Seq(1, 11, 1))

    // after a StopFilter: "lucene.solr" and gap from a dropped stopword
    val r8 = filter(ws("lucene.solr"), flags, prot)
    assert(terms(r8) == Seq("lucene", "lucenesolr", "solr"))
    assert(starts(r8) == Seq(0, 0, 7) && ends(r8) == Seq(6, 11, 11))
    assert(incs(r8) == Seq(1, 0, 1))

    val stopped = ws("the lucene.solr").drop(1)
      .map(t => t.copy(posInc = 2)) // StopFilter dropped "the"
    val r9 = filter(stopped, flags, prot)
    assert(terms(r9) == Seq("lucene", "lucenesolr", "solr"))
    assert(starts(r9) == Seq(4, 4, 11) && ends(r9) == Seq(10, 15, 15))
    assert(incs(r9) == Seq(2, 0, 1))
  }

  test("catenate words + numbers + all (testLotsOfConcatenating)") {
    val flags = AllSplit | CatenateWords | CatenateNumbers | CatenateAll
    val r = filter(ws("abc-def-123-456"), flags)
    assert(terms(r) == Seq("abc", "abcdef", "abcdef123456", "def", "123", "123456", "456"))
    assert(starts(r) == Seq(0, 0, 0, 4, 8, 8, 12))
    assert(ends(r) == Seq(3, 7, 15, 7, 11, 15, 15))
    assert(incs(r) == Seq(1, 0, 0, 1, 1, 0, 1))
  }

  test("catenations + preserve original (testLotsOfConcatenating2)") {
    val flags = AllSplit | CatenateWords | CatenateNumbers | CatenateAll |
      PreserveOriginal
    val r = filter(ws("abc-def-123-456"), flags)
    assert(terms(r) == Seq("abc-def-123-456", "abc", "abcdef", "abcdef123456",
      "def", "123", "123456", "456"))
    assert(starts(r) == Seq(0, 0, 0, 0, 4, 8, 8, 12))
    assert(ends(r) == Seq(15, 3, 7, 15, 7, 11, 15, 15))
    assert(incs(r) == Seq(1, 0, 0, 0, 1, 1, 0, 1))
  }

  test("letter-number transitions and acronym tails") {
    def doSplit(in: String, out: String*): Unit =
      assert(terms(filter(Vector(tok(in, 0, in.length)), AllSplit)) == out)
    doSplit("SD500", "SD", "500")
    doSplit("j2se", "j", "2", "se")
    doSplit("PowerShot", "Power", "Shot")
    doSplit("O'Neil's", "O", "Neil")
    doSplit("Wi-Fi", "Wi", "Fi")
    // UPPER->lower does not split: acronym followed by word stays joined
    doSplit("XLupper", "XLupper")
  }

  test("protected words pass through delimiters intact") {
    val r = filter(ws("wi-fi protected-word"), AllSplit, Set("protected-word"))
    assert(terms(r) == Seq("wi", "fi", "protected-word"))
    assert(incs(r) == Seq(1, 1, 1))
  }
}
