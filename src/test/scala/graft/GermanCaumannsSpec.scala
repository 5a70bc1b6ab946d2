package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.GermanCaumanns

/** The classic Caumanns German stemmer vs the reference's OWN golden
  * vector file (analysis/common/src/test/.../de/data.txt, the
  * TestGermanStemFilter data file) — every line must match, quirks
  * included (the `substCount =+ 2` assignment, masked-buffer
  * optimize()). */
class GermanCaumannsSpec extends AnyFunSuite {

  test("all data.txt vectors match") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/stems/de_caumanns.txt"), "UTF-8")
    val vecs = src.getLines().map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => val Array(w, s) = l.split("\t", 2); (w, s.trim) }.toVector
    src.close()
    assert(vecs.size > 20)
    vecs.foreach { case (w, expect) =>
      assert(GermanCaumanns.stem(w) == expect, s"word '$w'")
    }
  }

  test("non-letter terms pass through; casing folds with German locale") {
    assert(GermanCaumanns.stem("abc123") == "abc123")
    assert(GermanCaumanns.stem("HÄUFIG") == GermanCaumanns.stem("häufig"))
  }
}
