package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search.ClassicHighlight._

/** Classic Highlighter golden vectors from the reference's
  * lucene/highlighter/src/test/org/apache/lucene/search/highlight/
  * HighlighterTest.java (exact-string and numHighlights-count assertions).
  *
  * Test tokenizers mirror the reference test analyzers:
  *  - MockTokenizer.SIMPLE + lowercase + MockTokenFilter.ENGLISH_STOPSET
  *    (HighlighterTest.java:2030): letter runs, lowercased, stopwords
  *    dropped with position gaps (MockTokenFilter.java:45-56)
  *  - MockAnalyzer(WHITESPACE, false): whitespace split, case kept
  */
class ClassicHighlightSpec extends AnyFunSuite {

  // MockTokenFilter.ENGLISH_STOPSET (MockTokenFilter.java:45-56)
  private val stopset = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  /** MockTokenizer.SIMPLE + lowercase (+ optional English stopset). */
  private def simpleTok(text: String, stops: Boolean = true): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    var pendingInc = 1
    while (i < text.length) {
      if (Character.isLetter(text(i))) {
        val s = i
        while (i < text.length && Character.isLetter(text(i))) i += 1
        val term = text.substring(s, i).toLowerCase
        if (stops && stopset.contains(term)) pendingInc += 1
        else { out += Tok(term, s, i, pendingInc); pendingInc = 1 }
      } else i += 1
    }
    out.result()
  }

  /** MockAnalyzer(WHITESPACE, false). */
  private def wsTok(text: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < text.length) {
      if (!text(i).isWhitespace) {
        val s = i
        while (i < text.length && !text(i).isWhitespace) i += 1
        out += Tok(text.substring(s, i), s, i)
      } else i += 1
    }
    out.result()
  }

  // HighlighterTest.java:128-133
  private val texts = Vector(
    "Hello this is a piece of text that is very long and contains too much preamble and the meat is really here which says kennedy has been shot",
    "This piece of text refers to Kennedy at the beginning then has a longer piece of text that is very long in the middle and finally ends with another reference to Kennedy",
    "JFK has been shot", "John Kennedy has been shot",
    "This text has a typo in referring to Keneddy",
    "wordx wordy wordz wordx wordy wordx worda wordb wordy wordc",
    "y z x y z a b", "lets is a the lets is a the lets is a the lets")

  private def countAll(q: HQuery, frag: Fragmenter = SimpleFrag(20),
                       maxFrags: Int = 2): Int =
    texts.map { t =>
      val toks = simpleTok(t)
      highlight(toks, t, extract(q, toks), frag, maxFrags).numHighlights
    }.sum

  // ----- testOverlapAnalyzer2 (HighlighterTest.java:1797-1878): exact
  // strings over two hand-built overlapping token streams, in BOTH scorer
  // modes (TestHighlightRunner.start runs QueryScorer then QueryTermScorer)
  private val s2 = "Hi-Speed10 foo"
  private val ts2 = Vector( // getTS2 (HighlighterTest.java:1696-1722)
    Tok("hi", 0, 2, 1), Tok("hispeed", 0, 8, 1), Tok("speed", 3, 8, 0),
    Tok("10", 8, 10, 1), Tok("foo", 11, 14, 1))
  private val ts2a = Vector( // getTS2a (bigger token first)
    Tok("hispeed", 0, 8, 1), Tok("hi", 0, 2, 0), Tok("speed", 3, 8, 1),
    Tok("10", 8, 10, 1), Tok("foo", 11, 14, 1))

  private val overlapVectors = Seq[(HQuery, String)](
    (HTerm("foo"), "Hi-Speed10 <B>foo</B>"),
    (HTerm("10"), "Hi-Speed<B>10</B> foo"),
    (HTerm("hi"), "<B>Hi</B>-Speed10 foo"),
    (HTerm("speed"), "Hi-<B>Speed</B>10 foo"),
    (HTerm("hispeed"), "<B>Hi-Speed</B>10 foo"),
    (HBool(Seq(HTerm("hi"), HTerm("speed"))), "<B>Hi-Speed</B>10 foo"))

  test("testOverlapAnalyzer2: overlapping token groups, both scorers") {
    for ((q, expected) <- overlapVectors; toks <- Seq(ts2, ts2a)) {
      assert(bestFragments(toks, s2, extract(q, toks),
        SimpleFrag(100), 3) === expected, s"QueryScorer $q")
      assert(bestFragments(toks, s2, extractFlat(q),
        SimpleFrag(100), 3) === expected, s"QueryTermScorer $q")
    }
  }

  // ----- testHighlightingCommonTermsQuery (HighlighterTest.java:167-197):
  // CommonTermsQuery extraction = all terms, non-sensitive;
  // SimpleSpanFragmenter(scorer) default size 100
  test("testHighlightingCommonTermsQuery: exact fragments") {
    val q = HBool(Seq(HTerm("this"), HTerm("long"), HTerm("very")))
    val t0 = simpleTok(texts(0))
    assert(bestFragment(t0, texts(0), extract(q, t0), SpanFrag(100)) ===
      Some("Hello this is a piece of text that is <B>very</B> <B>long</B> and contains too much preamble and the meat is really here which says kennedy has been shot"))
    val t1 = simpleTok(texts(1))
    assert(bestFragment(t1, texts(1), extract(q, t1), SpanFrag(100)) ===
      Some("This piece of text refers to Kennedy at the beginning then has a longer piece of text that is <B>very</B>"))
  }

  // ----- testOffByOne (HighlighterTest.java:1126-1142): QueryTermScorer +
  // NullFragmenter over a text with non-letter tail
  test("testOffByOne: NullFragmenter keeps the full text") {
    val text = "help me [54-65]"
    val toks = simpleTok(text)
    assert(bestFragment(toks, text, extractFlat(HTerm("help")), NullFrag) ===
      Some("<B>help</B> me [54-65]"))
  }

  // ----- testGetBestSingleFragmentWithWeights (HighlighterTest.java:1289):
  // explicit weights steer fragment choice; spans present but
  // positionSensitive=false (the reference constructor quirk)
  test("testGetBestSingleFragmentWithWeights") {
    val toks = simpleTok(texts(0))
    val q1 = HBool(Seq(
      HWeighted("hello", 10f, Vector(PosSpan(0, 0))),
      HWeighted("kennedy", 1f, Vector(PosSpan(14, 14)))))
    assert(bestFragment(toks, texts(0), extract(q1, toks), SimpleFrag(2))
      .get.trim === "<B>Hello</B>")
    val q2 = HBool(Seq(
      HWeighted("hello", 10f, Vector(PosSpan(0, 0))),
      HWeighted("kennedy", 50f, Vector(PosSpan(14, 14)))))
    assert(bestFragment(toks, texts(0), extract(q2, toks), SimpleFrag(2))
      .get.trim === "<B>kennedy</B>")
  }

  // ----- count-based vectors (the reference test formatter's numHighlights)

  test("testSimpleQueryScorerPhraseHighlighting: 3 phrase shapes") {
    // "very long" + "contains"@3: slop += largestInc(2), unordered
    assert(countAll(HPhrase(Seq("very" -> 0, "long" -> 1, "contains" -> 3)),
      SimpleFrag(40)) === 3)
    // piece@1 text@3 refers@4 kennedy@6
    assert(countAll(HPhrase(Seq("piece" -> 1, "text" -> 3, "refers" -> 4,
      "kennedy" -> 6)), SimpleFrag(40)) === 4)
    // repeating term: lets@0,4,8,12
    assert(countAll(HPhrase(Seq("lets" -> 0, "lets" -> 4, "lets" -> 8,
      "lets" -> 12)), SimpleFrag(40)) === 4)
  }

  test("testSimpleQueryScorerPhraseHighlighting2: slop 5 unordered") {
    assert(countAll(HPhrase(Seq("text" -> 0, "piece" -> 1, "long" -> 2),
      slop = 5), SimpleFrag(40)) === 6)
  }

  test("testSimpleQueryScorerPhraseHighlighting3: exact in-order phrase") {
    assert(countAll(HPhrase(Seq("x" -> 0, "y" -> 1, "z" -> 2)),
      SimpleFrag(40)) === 3)
  }

  test("testNearSpanSimpleQuery: unordered span near") {
    assert(countAll(HSpanNear(Seq(Seq("beginning"), Seq("kennedy")), 3,
      inOrder = false)) === 2)
  }

  test("testSpanHighlighting: two span-nears in a boolean") {
    assert(countAll(HBool(Seq(
      HSpanNear(Seq(Seq("wordx"), Seq("wordy")), 1, inOrder = false),
      HSpanNear(Seq(Seq("wordy"), Seq("wordc")), 1, inOrder = false)))) === 7)
  }

  test("testNotSpanSimpleQuery: span-not excludes overlapped spans") {
    assert(countAll(HSpanNot(
      HSpanNear(Seq(Seq("shot"), Seq("kennedy")), 3, inOrder = false),
      "john")) === 4)
  }

  test("testGetBestFragmentsSimpleQuery / testGetSimpleHighlight: kennedy x4") {
    assert(countAll(HTerm("kennedy"), SimpleFrag(20)) === 4)
    assert(countAll(HTerm("kennedy"), SimpleFrag(40), maxFrags = 1) === 4)
  }

  test("testGetBestFragmentsWithOr: jfk or kennedy -> 5") {
    // HighlighterTest.java:1214-1232
    assert(countAll(HBool(Seq(HTerm("jfk"), HTerm("kennedy")))) === 5)
  }

  test("testRepeatingTermsInMultBooleans: repeated phrase terms union spans") {
    val content = "x y z a b c d e f g b c g"
    val toks = wsTok(content)
    val q = HBool(Seq(
      HBool(Seq(
        HPhrase(Seq("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3)),
        HPhrase(Seq("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3)))),
      HBool(Seq(
        HPhrase(Seq("b" -> 0, "c" -> 1, "g" -> 2)),
        HPhrase(Seq("b" -> 0, "c" -> 1, "g" -> 2))))))
    assert(highlight(toks, content, extract(q, toks), SimpleFrag(20), 2)
      .numHighlights === 7)
  }

  test("testMaxSizeHighlight: maxDocCharsToAnalyze cuts analysis") {
    val toks = simpleTok(texts(0))
    val r = highlight(toks, texts(0), extract(HTerm("meat"), toks),
      SimpleFrag(100), 1, maxDocCharsToAnalyze = 30)
    assert(r.numHighlights === 0)
    // and the truncation drops the trailing unanalyzed text entirely
    assert(r.frags.isEmpty)
  }

  test("multi-fragment output joins score>0 fragments with the separator") {
    // kennedy appears twice in texts[1]; SimpleFragmenter(40) cuts the doc
    // into >2 fragments, two of which contain kennedy
    val t1 = simpleTok(texts(1))
    val out = bestFragments(t1, texts(1), extract(HTerm("kennedy"), t1),
      SimpleFrag(40), 2)
    assert(out.count(_ == 'B') >= 2 * 2) // two <B>..</B> pairs
    assert(out.contains("<B>Kennedy</B>"))
    assert(out.contains("..."))
  }

  test("contiguous fragments merge in original order") {
    // one term per fragment over adjacent fragments -> merged single string
    val text = "aaaa bbbb cccc dddd"
    val toks = wsTok(text)
    val q = HBool(Seq(HTerm("aaaa"), HTerm("bbbb"), HTerm("cccc"), HTerm("dddd")))
    val out = bestFragments(toks, text, extract(q, toks), SimpleFrag(5), 4)
    assert(out === "<B>aaaa</B> <B>bbbb</B> <B>cccc</B> <B>dddd</B>")
  }

  test("position-sensitive term scores only inside its spans") {
    // phrase "been shot" must not highlight the lone "shot" in texts[2]'s
    // prefix positions... (both tokens are in-phrase there, so use texts[0]
    // where "kennedy has been shot" matches but "been"/"shot" elsewhere do
    // not exist; verify the non-matching doc texts[4] yields nothing)
    val q = HPhrase(Seq("been" -> 0, "shot" -> 1))
    val t4 = simpleTok(texts(4))
    assert(highlight(t4, texts(4), extract(q, t4), SimpleFrag(40), 2)
      .numHighlights === 0)
    val t0 = simpleTok(texts(0))
    assert(highlight(t0, texts(0), extract(q, t0), SimpleFrag(40), 2)
      .numHighlights === 2)
  }

  test("encoder is applied to gap and token text") {
    val text = "a <tag> kennedy"
    val toks = simpleTok(text) // "tag" and "kennedy" (a is a stopword)
    val out = highlight(toks, text, extract(HTerm("kennedy"), toks), NullFrag, 1,
      encode = s => s.replace("<", "&lt;").replace(">", "&gt;"))
    assert(out.frags.head.text === "a &lt;tag&gt; <B>kennedy</B>")
  }
}
