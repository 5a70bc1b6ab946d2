package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Wikipedia
import graft.analysis.Wikipedia._

/** WikipediaTokenizer vs the reference's own test vectors
  * (lucene/analysis/common/src/test/.../wikipedia/
  * WikipediaTokenizerTest.java): testSimple, testHandwritten,
  * testLinkPhrases, testLinks, testLucene1133 (UNTOKENIZED_ONLY) and
  * testBoth. */
class WikipediaSpec extends AnyFunSuite {

  private val LinkPhrases = "click [[link here again]] click " +
    "[http://lucene.apache.org here again] [[Category:a b c d]]"

  test("testSimple: category token") {
    val toks = Wikipedia.tokenize("This is a [[Category:foo]]")
    assert(toks.map(_.term) == Vector("This", "is", "a", "foo"))
    assert(toks.map(_.start) == Vector(0, 5, 8, 21))
    assert(toks.map(_.end) == Vector(4, 7, 9, 24))
    assert(toks.map(_.tpe) == Vector("<ALPHANUM>", "<ALPHANUM>",
      "<ALPHANUM>", Category))
    assert(toks.map(_.posInc) == Vector(1, 1, 1, 1))
  }

  test("testLinkPhrases: posInc 0 on the first external-link word") {
    val toks = Wikipedia.tokenize(LinkPhrases)
    assert(toks.map(_.term) == Vector("click", "link", "here", "again",
      "click", "http://lucene.apache.org", "here", "again",
      "a", "b", "c", "d"))
    assert(toks.map(_.posInc) == Vector(1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1))
  }

  test("testLinks: external link URLs with anchors and query strings") {
    val toks = Wikipedia.tokenize(
      "[http://lucene.apache.org/java/docs/index.html#news here]" +
      " [http://lucene.apache.org/java/docs/index.html?b=c here]" +
      " [https://lucene.apache.org/java/docs/index.html?b=c here]")
    assert(toks.map(_.term) == Vector(
      "http://lucene.apache.org/java/docs/index.html#news", "here",
      "http://lucene.apache.org/java/docs/index.html?b=c", "here",
      "https://lucene.apache.org/java/docs/index.html?b=c", "here"))
    assert(toks.map(_.tpe) == Vector(ExternalLinkUrl, ExternalLink,
      ExternalLinkUrl, ExternalLink, ExternalLinkUrl, ExternalLink))
  }

  test("testHandwritten: the full markup soup") {
    val text = "[[link]] This is a [[Category:foo]] Category  This is a " +
      "linked [[:Category:bar none withstanding]] " +
      "Category This is (parens) This is a [[link]]  This is an external " +
      "URL [http://lucene.apache.org] " +
      "Here is ''italics'' and ''more italics'', '''bold''' and " +
      "'''''five quotes''''' " +
      " This is a [[link|display info]]  This is a period.  Here is " +
      "$3.25 and here is 3.50.  Here's Johnny.  " +
      "==heading== ===sub head=== followed by some text  " +
      "[[Category:blah| ]] " +
      "''[[Category:ital_cat]]''  here is some that is ''italics " +
      "[[Category:foo]] but is never closed." +
      "'''same [[Category:foo]] goes for this '''''and2 " +
      "[[Category:foo]] and this" +
      " [http://foo.boo.com/test/test/ Test Test] " +
      "[http://foo.boo.com/test/test/test.html Test Test]" +
      " [http://foo.boo.com/test/test/test.html?g=b&c=d Test Test] " +
      "<ref>Citation</ref> <sup>martian</sup> <span class=\"glue\">code</span>"
    val toks = Wikipedia.tokenize(text)
    val A = "<ALPHANUM>"
    assert(toks.map(_.term) == Vector("link", "This", "is", "a",
      "foo", "Category", "This", "is", "a", "linked", "bar", "none",
      "withstanding", "Category", "This", "is", "parens", "This", "is", "a",
      "link", "This", "is", "an", "external", "URL",
      "http://lucene.apache.org", "Here", "is", "italics", "and", "more",
      "italics", "bold", "and", "five", "quotes", "This", "is", "a", "link",
      "display", "info", "This", "is", "a", "period", "Here", "is", "3.25",
      "and", "here", "is", "3.50", "Here's", "Johnny", "heading", "sub",
      "head", "followed", "by", "some", "text", "blah", "ital", "cat",
      "here", "is", "some", "that", "is", "italics", "foo", "but", "is",
      "never", "closed", "same", "foo", "goes", "for", "this", "and2",
      "foo", "and", "this", "http://foo.boo.com/test/test/", "Test", "Test",
      "http://foo.boo.com/test/test/test.html", "Test", "Test",
      "http://foo.boo.com/test/test/test.html?g=b&c=d", "Test", "Test",
      "Citation", "martian", "code"))
    assert(toks.map(_.tpe) == Vector(InternalLink,
      A, A, A, Category, A, A, A, A, A, Category, Category, Category,
      A, A, A, A, A, A, A, InternalLink, A, A, A, A, A,
      ExternalLinkUrl, A, A, Italics, A, Italics, Italics, Bold, A,
      BoldItalics, BoldItalics, A, A, A, InternalLink, InternalLink,
      InternalLink, A, A, A, A, A, A, "<NUM>", A, A, A, "<NUM>",
      "<APOSTROPHE>", A, Heading, SubHeading, SubHeading, A, A, A, A,
      Category, Category, Category, A, A, A, A, A, Italics, Category,
      A, A, A, A, Bold, Category, A, A, A, BoldItalics, Category, A, A,
      ExternalLinkUrl, ExternalLink, ExternalLink,
      ExternalLinkUrl, ExternalLink, ExternalLink,
      ExternalLinkUrl, ExternalLink, ExternalLink, Citation, A, A))
  }

  test("testLucene1133: UNTOKENIZED_ONLY collapses categories/italics") {
    // untokenized types don't affect streams that lack them
    val lp = Wikipedia.tokenize(LinkPhrases, UntokenizedOnly,
      Set(Category, Italics))
    assert(lp.map(_.term) == Vector("click", "link", "here", "again",
      "click", "http://lucene.apache.org", "here", "again", "a b c d"))
    val text = "[[Category:a b c d]] [[Category:e f g]] [[link here]] " +
      "[[link there]] ''italics here'' something ''more italics'' " +
      "[[Category:h   i   j]]"
    val toks = Wikipedia.tokenize(text, UntokenizedOnly,
      Set(Category, Italics))
    assert(toks.map(_.term) == Vector("a b c d", "e f g", "link", "here",
      "link", "there", "italics here", "something", "more italics",
      "h   i   j"))
    assert(toks.map(_.start) == Vector(11, 32, 42, 47, 56, 61, 71, 86, 98, 124))
    assert(toks.map(_.end) == Vector(18, 37, 46, 51, 60, 66, 83, 95, 110, 133))
    assert(toks.map(_.posInc) == Vector(1, 1, 1, 1, 1, 1, 1, 1, 1, 1))
    assert(toks.filter(t => Set(Category, Italics)(t.tpe)).forall(_.untokenized))
  }

  test("testBoth: collapsed span then members, first member at posInc 0") {
    val text = "[[Category:a b c d]] [[Category:e f g]] [[link here]] " +
      "[[link there]] ''italics here'' something ''more italics'' " +
      "[[Category:h   i   j]]"
    val toks = Wikipedia.tokenize(text, Both, Set(Category, Italics))
    assert(toks.map(_.term) == Vector("a b c d", "a", "b", "c", "d",
      "e f g", "e", "f", "g", "link", "here", "link", "there",
      "italics here", "italics", "here", "something", "more italics",
      "more", "italics", "h   i   j", "h", "i", "j"))
    assert(toks.map(_.start) == Vector(11, 11, 13, 15, 17, 32, 32, 34, 36,
      42, 47, 56, 61, 71, 71, 79, 86, 98, 98, 103, 124, 124, 128, 132))
    assert(toks.map(_.end) == Vector(18, 12, 14, 16, 18, 37, 33, 35, 37,
      46, 51, 60, 66, 83, 78, 83, 95, 110, 102, 110, 133, 125, 129, 133))
    assert(toks.map(_.posInc) == Vector(1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1,
      1, 1, 1, 0, 1, 1, 1, 0, 1, 1, 0, 1, 1))
  }

  test("analyzeFlat: positions accumulate posInc") {
    val (terms, pos) = Wikipedia.analyzeFlat(
      "click [http://lucene.apache.org here again]")
    assert(terms.toSeq == Seq("click", "http://lucene.apache.org",
      "here", "again"))
    assert(pos.toSeq == Seq(0, 1, 1, 2))
  }
}
