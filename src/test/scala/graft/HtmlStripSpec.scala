package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Analyzer, HtmlStrip}

/** HTMLStripCharFilter parity — golden vectors ported from the
  * reference's HTMLStripCharFilterTest.java (test, testGamma,
  * testEntities, testMoreEntities, testReserved, testScriptQuotes,
  * testStyle, testMalformedHTML cases). */
class HtmlStripSpec extends AnyFunSuite {

  test("reference test(): tags, entities, comment") {
    val html = "<div class=\"foo\">this is some text</div> here is a " +
      "<a href=\"#bar\">link</a> and another " +
      "<a href=\"http://lucene.apache.org/\">link</a>. " +
      "This is an entity: &amp; plus a &lt;.  Here is an &. " +
      "<!-- is a comment -->"
    val gold = "\nthis is some text\n here is a link and another link. " +
      "This is an entity: & plus a <.  Here is an &. "
    assert(HtmlStrip.strip(html) == gold)
  }

  test("reference testGamma/testEntities/testMoreEntities") {
    assert(HtmlStrip.strip("&Gamma;") == "Γ")
    assert(HtmlStrip.strip(
      "&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;") ==
      "  <foo> Übermensch = Γ bar Γ")
    assert(HtmlStrip.strip("&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and &#8217;") ==
      "  <junk/>   ! @ and ’")
    // upper-case variants of the six reserved entities only
    assert(HtmlStrip.strip("&AMP; &LT; &GT; &QUOT; &REG; &COPY; &GAMMA;") ==
      "& < > \" ® © &GAMMA;")
  }

  test("reference testReserved: escapedTags pass through verbatim") {
    val in = "aaa bbb <reserved ccc=\"ddddd\"> eeee </reserved> ffff " +
      "<reserved ggg=\"hhhh\"/> <other/>"
    val out = HtmlStrip.strip(in, Set("reserved"))
    assert(out.indexOf("reserved") == 9)
    assert(out.indexOf("reserved", 15) == 38)
    assert(out.indexOf("reserved", 41) == 54)
    assert(!out.contains("other"))
  }

  test("reference testScriptQuotes + testStyle: element collapses to one \\n") {
    assert(HtmlStrip.strip("one<script attr= bare><!-- action('<!-- comment -->'" +
      ", \"\\\"-->\\\"\"); --></script>two") == "one\ntwo")
    assert(HtmlStrip.strip(
      "hello<script><!-- f('<!--internal--></script>'); --></script>") == "hello\n")
    assert(HtmlStrip.strip("one<style type=\"text/css\">\n<!--\n" +
      "@import url('http://www.lasletrasdecanciones.com/css.css');\n-->\n" +
      "</style>two") == "one\ntwo")
  }

  test("reference testMalformedHTML cases") {
    val cases = Seq(
      "a <a hr<ef=aa<a>> </close</a>" -> "a <a hr<ef=aa> </close",
      ("<a href=\" http://www.surgery4was.happyhost.org/video-of-arthroscopic-" +
        "knee-surgery symptoms.html, heat congestive heart failure <a href=\" " +
        "http://www.symptoms1bad.happyhost.org/canine") ->
        ("<a href=\" http://www.surgery4was.happyhost.org/video-of-arthroscopic-" +
          "knee-surgery symptoms.html, heat congestive heart failure <a href=\" " +
          "http://www.symptoms1bad.happyhost.org/canine"),
      "<a href=\"" -> "<a href=\"",
      "<a rel=\"nofollow\" href=\"http://anissanina31.skyrock.com/18950394" +
        "93-Hi-tout-le-monde.html\" title=\" Hi, tout le monde !>#</a>" -> "#")
    cases.foreach { case (in, gold) =>
      assert(HtmlStrip.strip(in) == gold, s"input: $in")
    }
  }

  test("block vs inline element sets drive the replacement") {
    assert(HtmlStrip.strip("x<p>y</p>z") == "x\ny\nz")
    assert(HtmlStrip.strip("x<br>y") == "x\ny")
    assert(HtmlStrip.strip("x<b>y</b>z") == "xyz")
    assert(HtmlStrip.strip("x<span class=\"s\">y</span>z") == "xyz")
    assert(HtmlStrip.strip("<?php echo 1; ?>x<!DOCTYPE html>y") == "xy")
  }

  test("strip composes with the analyzer chain (positions stay ordinal)") {
    val toks = Analyzer.analyze(
      HtmlStrip.strip("<p>alpha <b>beta</b></p> <script>x='g';</script>gamma"),
      Set.empty)
    assert(toks.map(_.term) == Vector("alpha", "beta", "gamma"))
    assert(toks.map(_.position) == Vector(0, 1, 2))
  }
}
