package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.UrlEmail

/** Golden parity with the reference's TestUAX29URLEmailTokenizer:
  *  - testURLs: every URL in random.text.with.urls.txt (643 golden URLs)
  *  - testEmails: every address in random.text.with.email.addresses.txt
  *    (265 golden emails)
  *  - testWikiURLs: the Lucene wiki page's 105 URLs
  *  - the inline vectors (LUCENE-3880 mailto, LUCENE-5391 bad bare URLs,
  *    types, plain-word passthrough)
  */
class UrlEmailSpec extends AnyFunSuite {

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/urlemail/$name")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.mkString finally src.close()
  }
  private def resourceLines(name: String): Vector[String] =
    resource(name).linesIterator.map(_.trim).filter(_.nonEmpty).toVector

  private def tokensOfType(text: String, tpe: String,
                           maxLen: Int = 255): Vector[String] =
    UrlEmail.tokenize(text, maxLen).filter(_.tokenType == tpe).map(_.term)

  test("testURLs: 643 golden URLs from random text") {
    val text = resource("random.text.with.urls.txt")
    val want = resourceLines("urls.from.random.text.with.urls.txt")
    val got = tokensOfType(text, UrlEmail.UrlType, maxLen = Int.MaxValue)
    val misses = want.zipAll(got, "<missing>", "<extra>")
      .zipWithIndex.filter { case ((w, g), _) => w != g }
    assert(misses.isEmpty,
      s"${misses.size} diffs; first 5: ${misses.take(5).map { case ((w, g), ix) => s"#$ix want[$w] got[$g]" }.mkString("; ")}")
  }

  test("testEmails: 265 golden emails from random text") {
    val text = resource("random.text.with.email.addresses.txt")
    val want = resourceLines("email.addresses.from.random.text.with.email.addresses.txt")
    val got = tokensOfType(text, UrlEmail.EmailType)
    val misses = want.zipAll(got, "<missing>", "<extra>")
      .zipWithIndex.filter { case ((w, g), _) => w != g }
    assert(misses.isEmpty,
      s"${misses.size} diffs; first 5: ${misses.take(5).map { case ((w, g), ix) => s"#$ix want[$w] got[$g]" }.mkString("; ")}")
  }

  test("testWikiURLs: URLs extracted from the Lucene wiki page") {
    val text = resource("LuceneResourcesWikiPage.html")
    val want = resourceLines("LuceneResourcesWikiPageURLs.txt")
    val got = tokensOfType(text, UrlEmail.UrlType, maxLen = Int.MaxValue)
    val misses = want.zipAll(got, "<missing>", "<extra>")
      .zipWithIndex.filter { case ((w, g), _) => w != g }
    assert(misses.isEmpty,
      s"${misses.size} diffs; first 5: ${misses.take(5).map { case ((w, g), ix) => s"#$ix want[$w] got[$g]" }.mkString("; ")}")
  }

  test("mailto: scheme split (LUCENE-3880)") {
    val toks = UrlEmail.tokenize("mailto:test@example.org")
    assert(toks.map(t => (t.term, t.tokenType)) === Vector(
      ("mailto", "<ALPHANUM>"), ("test@example.org", "<EMAIL>")))
  }

  test("bare hosts: URL unless followed by [-\\w] (LUCENE-5391)") {
    // bare host at EOF and before punctuation is a URL
    assert(tokensOfType("example.com", UrlEmail.UrlType) === Vector("example.com"))
    assert(tokensOfType("visit example.com, please", UrlEmail.UrlType) ===
      Vector("example.com"))
    // followed by a word char: not a URL, tokenizes as words
    val toks = UrlEmail.tokenize("test.coma")
    assert(toks.map(_.term) === Vector("test.coma"))
    assert(toks.head.tokenType !== UrlEmail.UrlType)
    // scheme'd URLs keep paths/queries/fragments
    assert(tokensOfType("see http://example.com/a/b?q=1#frag now", UrlEmail.UrlType) ===
      Vector("http://example.com/a/b?q=1#frag"))
  }

  test("plain text passes through the UAX#29 word rules") {
    val toks = UrlEmail.tokenize("testing 1234 don't stop")
    assert(toks.map(_.term) === Vector("testing", "1234", "don't", "stop"))
    assert(toks.map(_.tokenType) === Vector("<ALPHANUM>", "<NUM>", "<ALPHANUM>", "<ALPHANUM>"))
  }

  test("IPv4/IPv6 hosts") {
    assert(tokensOfType("at 192.168.0.1:8080/admin go", UrlEmail.UrlType) ===
      Vector("192.168.0.1:8080/admin"))
    assert(tokensOfType("http://[2001:db8::1]/x", UrlEmail.UrlType) ===
      Vector("http://[2001:db8::1]/x"))
    assert(tokensOfType("a@[127.0.0.1] b", UrlEmail.EmailType) === Vector("a@[127.0.0.1]"))
  }
}
