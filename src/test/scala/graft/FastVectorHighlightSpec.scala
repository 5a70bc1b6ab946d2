package graft

import java.util.Locale

import org.scalatest.funsuite.AnyFunSuite

import graft.search.FastVectorHighlight
import graft.search.FastVectorHighlight._

/** FastVectorHighlighter semantics against the reference's own test
  * vectors: SimpleFragListBuilderTest (frag assembly + centering),
  * FastVectorHighlighterTest (end-to-end tagged fragments incl. sloppy
  * phrases and the accept-phrase gate), WeightedFragListBuilderTest
  * (distinct-term idf*boost scoring with the sqrt-length norm), and
  * FieldQueryTest's overlapping-phrase expansion. */
class FastVectorHighlightSpec extends AnyFunSuite {

  /** MockTokenizer.WHITESPACE + lowercase — what the reference tests index
    * with. */
  private def ws(content: String): Seq[Token] =
    "\\S+".r.findAllMatchIn(content).zipWithIndex.map { case (m, i) =>
      Token(m.matched.toLowerCase(Locale.ROOT), i, m.start, m.end)
    }.toSeq

  /** The reference WeightedFragInfo.toString format. */
  private def fmt(f: FragInfo): String = {
    val sb = new StringBuilder("subInfos=(")
    f.subInfos.foreach { si =>
      sb.append(si.text).append('(')
      si.termsOffsets.foreach(to => sb.append(s"(${to.start},${to.end})"))
      sb.append(')')
    }
    sb.append(")/").append(f.totalBoost).append(s"(${f.start},${f.end})")
    sb.toString
  }

  private def ffl(flat: Seq[Flat], content: String, fragCharSize: Int,
                  weighted: Boolean = false): Vector[FragInfo] = {
    val fq = new FieldQuery(flat)
    val stack = termStack(ws(content), fq, 1L, _ => 0L)
    fragList(phraseList(stack, fq), fragCharSize, weighted = weighted)
  }

  // ---- SimpleFragListBuilderTest vectors ----

  test("null field frag list / too small frag size") {
    assert(ffl(Seq(FlatTerm("a")), "b c d", 100).isEmpty)
    intercept[IllegalArgumentException] {
      ffl(Seq(FlatTerm("a")), "b c d", 17)
    }
  }

  test("smaller frag size than term / than phrase") {
    val l = ffl(Seq(FlatTerm("abcdefghijklmnopqrs")), "abcdefghijklmnopqrs", 18)
    assert(l.map(fmt) == Vector("subInfos=(abcdefghijklmnopqrs((0,19)))/1.0(0,19)"))
    val p = ffl(Seq(FlatPhrase(Vector("abcdefgh", "jklmnopqrs"))),
      "abcdefgh   jklmnopqrs", 18)
    assert(p.map(fmt) == Vector("subInfos=(abcdefghjklmnopqrs((0,21)))/1.0(0,21)"))
  }

  test("1-term and 2-terms single fragment (centering)") {
    assert(ffl(Seq(FlatTerm("a")), "a", 100).map(fmt) ==
      Vector("subInfos=(a((0,1)))/1.0(0,100)"))
    assert(ffl(Seq(FlatTerm("a")), "a a", 100).map(fmt) ==
      Vector("subInfos=(a((0,1))a((2,3)))/2.0(0,100)"))
    assert(ffl(Seq(FlatTerm("a")), "a b b b b b b b b a", 20).map(fmt) ==
      Vector("subInfos=(a((0,1))a((18,19)))/2.0(0,20)"))
    assert(ffl(Seq(FlatTerm("a")), "b b b b a b b b b a", 20).map(fmt) ==
      Vector("subInfos=(a((8,9))a((18,19)))/2.0(4,24)"))
  }

  test("2 terms, 2 fragments (previous-border clamp)") {
    assert(ffl(Seq(FlatTerm("a")), "a b b b b b b b b b b b b b a", 20)
      .map(fmt) == Vector("subInfos=(a((0,1)))/1.0(0,20)",
        "subInfos=(a((28,29)))/1.0(20,40)"))
    assert(ffl(Seq(FlatTerm("a")), "a b b b b b b b b b b b b a", 20)
      .map(fmt) == Vector("subInfos=(a((0,1)))/1.0(0,20)",
        "subInfos=(a((26,27)))/1.0(20,40)"))
    assert(ffl(Seq(FlatTerm("a")), "a b b b b b b b b b a", 20)
      .map(fmt) == Vector("subInfos=(a((0,1)))/1.0(0,20)",
        "subInfos=(a((20,21)))/1.0(20,40)"))
  }

  test("2-term boolean query") {
    val q = Seq(FlatTerm("a"), FlatTerm("b"))
    assert(ffl(q, "c d e", 20).isEmpty)
    assert(ffl(q, "d b c", 20).map(fmt) ==
      Vector("subInfos=(b((2,3)))/1.0(0,20)"))
    assert(ffl(q, "a b c", 20).map(fmt) ==
      Vector("subInfos=(a((0,1))b((2,3)))/2.0(0,20)"))
  }

  test("phrase query: exact and sloppy (split Toffs)") {
    val pq = Seq(FlatPhrase(Vector("a", "b")))
    assert(ffl(pq, "c d e", 20).isEmpty)
    assert(ffl(pq, "a c b", 20).isEmpty)
    assert(ffl(pq, "a b c", 20).map(fmt) ==
      Vector("subInfos=(ab((0,3)))/1.0(0,20)"))
    val sloppy = Seq(FlatPhrase(Vector("a", "b"), slop = 1))
    assert(ffl(sloppy, "a c b", 20).map(fmt) ==
      Vector("subInfos=(ab((0,1)(4,5)))/1.0(0,20)"))
  }

  // ---- FastVectorHighlighterTest end-to-end vectors ----

  private def best(flat: Seq[Flat], content: String, fragCharSize: Int,
                   max: Int = 1): Vector[String] =
    bestFragments(ws(content), content, flat, fragCharSize, max,
      weighted = false)

  private val SimpleDoc =
    "This is a test where foo is highlighed and should be highlighted"

  test("simple highlight: centered fragments at 54/52/30 chars") {
    val q = Seq(FlatTerm("foo"))
    assert(best(q, SimpleDoc, 54) == Vector(
      "This is a test where <b>foo</b> is highlighed and should be highlighted"))
    assert(best(q, SimpleDoc, 52) == Vector(
      "This is a test where <b>foo</b> is highlighed and should be"))
    assert(best(q, SimpleDoc, 30) == Vector(
      "a test where <b>foo</b> is highlighed"))
  }

  private val Netscape =
    "Netscape was the general name for a series of web browsers originally " +
    "produced by Netscape Communications Corporation, now a subsidiary of " +
    "AOL The original browser was once the dominant browser in terms of " +
    "usage share, but as a result of the first browser war it lost " +
    "virtually all of its share to Internet Explorer Netscape was " +
    "discontinued and support for all Netscape browsers and client " +
    "products was terminated on March 1, 2008 Netscape Navigator was the " +
    "name of Netscape's web browser from versions 1.0 through 4.8 The " +
    "first beta release versions of the browser were released in 1994 and " +
    "known as Mosaic and then Mosaic Netscape until a legal challenge from " +
    "the National Center for Supercomputing Applications (makers of NCSA " +
    "Mosaic, which many of Netscape's founders used to develop), led to " +
    "the name change to Netscape Navigator The company's name also " +
    "changed from Mosaic Communications Corporation to Netscape " +
    "Communications Corporation The browser was easily the most advanced..."

  test("long text: terms vs phrase highlighting differ in tag granularity") {
    val terms = Seq(FlatTerm("internet"), FlatTerm("explorer"))
    assert(best(terms, Netscape, 128) == Vector(
      "first browser war it lost virtually all of its share to <b>Internet</b> " +
      "<b>Explorer</b> Netscape was discontinued and support for all Netscape browsers"))
    val phrase = Seq(FlatPhrase(Vector("internet", "explorer")))
    assert(best(phrase, Netscape, 128) == Vector(
      "first browser war it lost virtually all of its share to <b>Internet " +
      "Explorer</b> Netscape was discontinued and support for all Netscape browsers"))
  }

  test("phrase highlight: accept-phrase gate and sloppy phrases") {
    // three MUST terms: two fragments, score order picks the 2-hit one
    val terms = Seq(FlatTerm("test"), FlatTerm("foo"), FlatTerm("highlighed"))
    assert(best(terms, SimpleDoc, 18) ==
      Vector("<b>foo</b> is <b>highlighed</b> and"))

    // slop-5 phrase (+ MUST terms its walk consumes): match spans 28 chars
    // -> rejected at 18, accepted at 30
    val pq5 = Seq(FlatTerm("foo"),
      FlatPhrase(Vector("test", "foo", "highlighed"), slop = 5),
      FlatTerm("highlighed"))
    assert(best(pq5, SimpleDoc, 18).isEmpty)
    assert(best(pq5, SimpleDoc, 30) ==
      Vector("a <b>test</b> where <b>foo</b> is <b>highlighed</b> and"))

    // bare slop-3 phrase: same acceptance behavior
    val pq3 = Seq(FlatPhrase(Vector("test", "foo", "highlighed"), slop = 3))
    assert(best(pq3, SimpleDoc, 18).isEmpty)
    assert(best(pq3, SimpleDoc, 30) ==
      Vector("a <b>test</b> where <b>foo</b> is <b>highlighed</b> and"))

    // slop-30 phrase whose last term only matches at gap > slop per-pair:
    // no fragment (per-adjacent-gap check, not total slop)
    val pq30 = Seq(FlatPhrase(Vector("test", "foo", "highlighted"), slop = 30))
    assert(best(pq30, SimpleDoc, 18).isEmpty)
  }

  test("phrase walk falls back to the longest registered prefix") {
    // "a b" and "b c" expand to "a b c"; over "a b c" ONE merged match
    val q = Seq(FlatPhrase(Vector("a", "b")), FlatPhrase(Vector("b", "c")))
    assert(ffl(q, "a b c", 20).map(fmt) ==
      Vector("subInfos=(abc((0,5)))/1.0(0,20)"))
    // over "a b x" the expanded phrase fails; retry matches "a b"
    assert(ffl(q, "a b x", 20).map(fmt) ==
      Vector("subInfos=(ab((0,3)))/1.0(0,20)"))
    // over "b c x" the walk never leaves "b c"
    assert(ffl(q, "b c x", 20).map(fmt) ==
      Vector("subInfos=(bc((0,3)))/1.0(0,20)"))
  }

  test("weighted frag list: distinct-term idf*boost with sqrt-length norm") {
    // one doc (numDocs=1, df=1): weight = log(1/2)+1 per term
    val w = (math.log(1.0 / 2) + 1.0).toFloat
    val fq = new FieldQuery(Seq(FlatPhrase(Vector("the", "both"))))
    val stack = termStack(ws("x y the both z"), fq, 1L, _ => 1L)
    val frags = fragList(phraseList(stack, fq), 100, weighted = true)
    assert(frags.size == 1)
    // phraseTotalBoost = (w_the + w_both) * boost; norm = sqrt(2)
    val expected = (w + w) * 1f * (2 * (1 / math.sqrt(2).toFloat))
    assert(math.abs(frags.head.totalBoost - expected) < 1e-6f)
    assert(frags.head.subInfos.map(_.boost).sum === frags.head.totalBoost)

    // a repeated term counts toward length but not distinct boost
    val fq2 = new FieldQuery(Seq(FlatTerm("examples")))
    val stack2 = termStack(ws("examples foo examples"), fq2, 1L, _ => 1L)
    val frags2 = fragList(phraseList(stack2, fq2), 100, weighted = true)
    // length=2, distinct=1: norm = 2/sqrt(2); subinfo boosts = (w, 0)*norm
    val expected2 = w * (2 / math.sqrt(2).toFloat)
    assert(math.abs(frags2.head.totalBoost - expected2) < 1e-6f)
  }

  test("same-position ring (posInc=0 synonyms) is probed by the walk") {
    // tokens: quick(0) [fast(0) synonym] fox(1); query phrase "fast fox"
    val tokens = Seq(Token("quick", 0, 0, 5), Token("fast", 0, 0, 5),
      Token("fox", 1, 6, 9))
    val fq = new FieldQuery(Seq(FlatPhrase(Vector("fast", "fox"))))
    val stack = termStack(tokens, fq, 1L, _ => 0L)
    val out = phraseList(stack, fq)
    assert(out.map(_.text) == Seq("fastfox"))
    assert(out.head.termsOffsets == Vector(Toffs(0, 9)))
  }

  test("overlapping matches fold into the first (addIfNoOverlap)") {
    // term a and phrase "a b": walk emits "a b" first; the standalone a at
    // the same offset region folds in, growing termsInfos not offsets
    val q = Seq(FlatPhrase(Vector("a", "b")), FlatTerm("b"))
    val fq = new FieldQuery(q)
    val stack = termStack(ws("a b"), fq, 1L, _ => 0L)
    val out = phraseList(stack, fq)
    assert(out.size == 1)
    assert(out.head.text == "ab")
  }

  test("score order ties break by start offset; document order preserved otherwise") {
    val q = Seq(FlatTerm("a"))
    val frags = ffl(q, "a b b b b b b b b b b b b b a", 20)
    val out = createFragments("a b b b b b b b b b b b b b a", frags, 2)
    // equal boosts -> start-offset order
    assert(out == Vector("<b>a</b> b b b b b b b b b b", "b b b b <b>a</b>"))
  }
}
