package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{CommonGrams, PathHierarchy, PatternTokenizer, StemControl, Token}

/** Golden vectors for CommonGrams / PathHierarchy / PatternTokenizer /
  * keyword-marker + stem-override, from the reference tests:
  *  - commongrams/CommonGramsFilterTest.java:126-259
  *  - path/TestPathHierarchyTokenizer.java:28-225
  *  - pattern/TestPatternTokenizer.java:40-101
  */
class AnalysisFiltersSpec extends AnyFunSuite {

  private val common = Set("s", "a", "b", "c", "d", "the", "of")

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

  test("CommonGramsFilter overlays bigrams (testCommonGramsFilter)") {
    def check(in: String, out: Seq[String], posIncs: Seq[Int]): Unit = {
      val r = CommonGrams.filter(ws(in), common)
      assert(terms(r) == out, s"input: $in")
      assert(incs(r) == posIncs, s"posInc of: $in")
    }
    check("the", Seq("the"), Seq(1))
    check("foo", Seq("foo"), Seq(1))
    check("brown fox", Seq("brown", "fox"), Seq(1, 1))
    check("the fox", Seq("the", "the_fox", "fox"), Seq(1, 0, 1))
    check("fox of", Seq("fox", "fox_of", "of"), Seq(1, 0, 1))
    check("of the", Seq("of", "of_the", "the"), Seq(1, 0, 1))
    check("quick brown fox", Seq("quick", "brown", "fox"), Seq(1, 1, 1))
    check("quick brown the", Seq("quick", "brown", "brown_the", "the"), Seq(1, 1, 0, 1))
    check("quick the fox", Seq("quick", "quick_the", "the", "the_fox", "fox"),
      Seq(1, 0, 1, 0, 1))
    check("fox of the", Seq("fox", "fox_of", "of", "of_the", "the"),
      Seq(1, 0, 1, 0, 1))
    check("the quick brown", Seq("the", "the_quick", "quick", "brown"),
      Seq(1, 0, 1, 1))
    check("the fox of", Seq("the", "the_fox", "fox", "fox_of", "of"),
      Seq(1, 0, 1, 0, 1))
    check("of the fox", Seq("of", "of_the", "the", "the_fox", "fox"),
      Seq(1, 0, 1, 0, 1))
    check("of the of", Seq("of", "of_the", "the", "the_of", "of"),
      Seq(1, 0, 1, 0, 1))
    // case-sensitive set: "The" is not common (testCaseSensitive)
    val r = CommonGrams.filter(ws("How The s a brown s cow d like A B thing?"), common)
    assert(terms(r) == Seq("How", "The", "The_s", "s", "s_a", "a", "a_brown",
      "brown", "brown_s", "s", "s_cow", "cow", "cow_d", "d", "d_like", "like",
      "A", "B", "thing?"))
  }

  test("CommonGramsQueryFilter keeps grams, drops covered unigrams") {
    def check(in: String, out: Seq[String]): Unit =
      assert(terms(CommonGrams.queryFilter(ws(in), common)) == out, s"input: $in")
    check("brown fox", Seq("brown", "fox"))
    check("the fox", Seq("the_fox"))
    check("fox of", Seq("fox_of"))
    check("of the", Seq("of_the"))
    check("the", Seq("the"))
    check("foo", Seq("foo"))
    check("quick brown fox", Seq("quick", "brown", "fox"))
    check("quick brown the", Seq("quick", "brown_the"))
    check("quick the brown", Seq("quick_the", "the_brown"))
    check("fox of the", Seq("fox_of", "of_the"))
    check("the quick brown", Seq("the_quick", "quick", "brown"))
    check("the fox of", Seq("the_fox", "fox_of"))
    check("of the fox", Seq("of_the", "the_fox"))
    check("of the of", Seq("of_the", "the_of"))
  }

  test("PathHierarchyTokenizer basic + skip vectors") {
    def check(path: String, skip: Int, out: Seq[String],
              so: Seq[Int], eo: Seq[Int], pi: Seq[Int]): Unit = {
      val r = PathHierarchy.tokenize(path, skip = skip)
      assert(terms(r) == out, s"path: $path skip: $skip")
      assert(r.map(_.startOffset) == so, s"startOffsets of $path")
      assert(r.map(_.endOffset) == eo, s"endOffsets of $path")
      assert(incs(r) == pi, s"posIncs of $path")
    }
    check("/a/b/c", 0, Seq("/a", "/a/b", "/a/b/c"),
      Seq(0, 0, 0), Seq(2, 4, 6), Seq(1, 0, 0))
    check("/a/b/c/", 0, Seq("/a", "/a/b", "/a/b/c", "/a/b/c/"),
      Seq(0, 0, 0, 0), Seq(2, 4, 6, 7), Seq(1, 0, 0, 0))
    check("a/b/c", 0, Seq("a", "a/b", "a/b/c"),
      Seq(0, 0, 0), Seq(1, 3, 5), Seq(1, 0, 0))
    check("a/b/c/", 0, Seq("a", "a/b", "a/b/c", "a/b/c/"),
      Seq(0, 0, 0, 0), Seq(1, 3, 5, 6), Seq(1, 0, 0, 0))
    check("/", 0, Seq("/"), Seq(0), Seq(1), Seq(1))
    check("//", 0, Seq("/", "//"), Seq(0, 0), Seq(1, 2), Seq(1, 0))
    check("/a/b/c", 1, Seq("/b", "/b/c"), Seq(2, 2), Seq(4, 6), Seq(1, 0))
    check("/a/b/c/", 1, Seq("/b", "/b/c", "/b/c/"),
      Seq(2, 2, 2), Seq(4, 6, 7), Seq(1, 0, 0))
    check("a/b/c", 1, Seq("/b", "/b/c"), Seq(1, 1), Seq(3, 5), Seq(1, 0))
    check("a/b/c/", 1, Seq("/b", "/b/c", "/b/c/"),
      Seq(1, 1, 1), Seq(3, 5, 6), Seq(1, 0, 0))
    check("/", 1, Seq(), Seq(), Seq(), Seq())
    check("//", 1, Seq("/"), Seq(1), Seq(2), Seq(1))
    // delimiter replacement + windows paths
    assert(terms(PathHierarchy.tokenize("/a/b/c", '/', '\\')) ==
      Seq("\\a", "\\a\\b", "\\a\\b\\c"))
    val win = PathHierarchy.tokenize("c:\\a\\b\\c", '\\', '\\')
    assert(terms(win) == Seq("c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"))
    assert(win.map(_.endOffset) == Seq(2, 4, 6, 8))
  }

  test("ReversePathHierarchyTokenizer vectors (TestReversePathHierarchyTokenizer)") {
    def check(path: String, skip: Int, out: Seq[String],
              so: Seq[Int], eo: Seq[Int], pi: Seq[Int]): Unit = {
      val r = PathHierarchy.tokenizeReverse(path, skip = skip)
      assert(terms(r) == out, s"path: $path skip: $skip")
      assert(r.map(_.startOffset) == so, s"startOffsets of $path")
      assert(r.map(_.endOffset) == eo, s"endOffsets of $path")
      assert(incs(r) == pi, s"posIncs of $path")
    }
    check("/a/b/c", 0, Seq("/a/b/c", "a/b/c", "b/c", "c"),
      Seq(0, 1, 3, 5), Seq(6, 6, 6, 6), Seq(1, 0, 0, 0))
    check("/a/b/c/", 0, Seq("/a/b/c/", "a/b/c/", "b/c/", "c/"),
      Seq(0, 1, 3, 5), Seq(7, 7, 7, 7), Seq(1, 0, 0, 0))
    check("a/b/c", 0, Seq("a/b/c", "b/c", "c"),
      Seq(0, 2, 4), Seq(5, 5, 5), Seq(1, 0, 0))
    check("a/b/c/", 0, Seq("a/b/c/", "b/c/", "c/"),
      Seq(0, 2, 4), Seq(6, 6, 6), Seq(1, 0, 0))
    check("/", 0, Seq("/"), Seq(0), Seq(1), Seq(1))
    check("//", 0, Seq("//", "/"), Seq(0, 1), Seq(2, 2), Seq(1, 0))
    check("/a/b/c/", 1, Seq("/a/b/", "a/b/", "b/"),
      Seq(0, 1, 3), Seq(5, 5, 5), Seq(1, 0, 0))
    check("a/b/c", 1, Seq("a/b/", "b/"), Seq(0, 2), Seq(4, 4), Seq(1, 0))
    check("a/b/c/", 1, Seq("a/b/", "b/"), Seq(0, 2), Seq(4, 4), Seq(1, 0))
    check("/", 1, Seq(), Seq(), Seq(), Seq())
    check("//", 1, Seq("/"), Seq(0), Seq(1), Seq(1))
    // delimiter replacement applies inside the suffix terms too
    assert(terms(PathHierarchy.tokenizeReverse("/a/b/c", '/', '\\')) ==
      Seq("\\a\\b\\c", "a\\b\\c", "b\\c", "c"))
  }

  test("PatternTokenizer split and group modes") {
    def check(pattern: String, group: Int, in: String, out: Seq[String]): Unit =
      assert(terms(PatternTokenizer.tokenize(in, pattern, group)) == out,
        s"pattern: $pattern group: $group input: $in")
    check("--", -1, "aaa--bbb--ccc", Seq("aaa", "bbb", "ccc"))
    check(":", -1, "aaa:bbb:ccc", Seq("aaa", "bbb", "ccc"))
    check("\\p{Space}", -1, "aaa   bbb \t\tccc  ", Seq("aaa", "bbb", "ccc"))
    check(":", -1, "boo:and:foo", Seq("boo", "and", "foo"))
    check("o", -1, "boo:and:foo", Seq("b", ":and:f"))
    check(":", 0, "boo:and:foo", Seq(":", ":"))
    check("'([^']+)'", 0, "aaa 'bbb' 'ccc'", Seq("'bbb'", "'ccc'"))
    check("'([^']+)'", 1, "aaa 'bbb' 'ccc'", Seq("bbb", "ccc"))
    // offsets in split mode
    val r = PatternTokenizer.tokenize("Günther, is\there", "[,;/\\s]+")
    assert(r.map(t => (t.term, t.startOffset, t.endOffset)) ==
      Seq(("Günther", 0, 7), ("is", 9, 11), ("here", 12, 16)))
  }

  test("keyword marker + stemmer override control the stemmer") {
    assert(StemControl.porterWithControl("value", Set.empty, Map.empty) == "valu")
    assert(StemControl.porterWithControl("table", Set("table"), Map.empty) == "table")
    assert(StemControl.porterWithControl("table", Set.empty, Map.empty) == "tabl")
    assert(StemControl.porterWithControl("batch", Set.empty,
      Map("batch" -> "bat")) == "bat")
    // override beats the keyword set only when the term is not protected
    assert(StemControl.porterWithControl("batch", Set("batch"),
      Map("batch" -> "bat")) == "batch")
  }
}
