package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.BrazilianStemmer

/** BrazilianStemmer vs every published reference vector
  * (analysis/common/src/test/.../br/TestBrazilianAnalyzer.java:41-131 —
  * the Snowball-comparison list plus the normalization edge cases). */
class BrazilianStemSpec extends AnyFunSuite {

  private def pairs: Vector[(String, String)] = {
    val in = getClass.getResourceAsStream("/stems/brazilian.txt")
    require(in != null, "missing /stems/brazilian.txt")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val t = l.split('\t'); (t(0), t(1))
      }.toVector
    finally in.close()
  }

  test("all TestBrazilianAnalyzer vectors") {
    val vecs = pairs
    assert(vecs.length >= 80)
    val bad = vecs.flatMap { case (w, want) =>
      val got = BrazilianStemmer.filter(w)
      if (got != want) Some(s"$w -> $got (want $want)") else None
    }
    assert(bad.isEmpty, s"${bad.length} mismatches: ${bad.take(15).mkString("; ")}")
  }

  test("unindexable terms keep the original (filter null path)") {
    // length <= 2 after trim: stem() abstains (TestBrazilianAnalyzer: áá -> áá)
    assert(BrazilianStemmer.filter("áá") === "áá")
    assert(BrazilianStemmer.filter("ab") === "ab")
    // length >= 30: abstains
    val long = "a" * 30
    assert(BrazilianStemmer.filter(long) === long)
  }

  test("non-letter terms get only lowercase+deaccent") {
    assert(BrazilianStemmer.filter("quimio5terápicos") === "quimio5terapicos")
  }

  test("quirk branches preserved: logias unchanged-but-altered, ira no-op") {
    // R2("metodologias") = "ologias", so step1's logias branch fires — and
    // discards the replacement, leaving the full word while skipping step2/4
    assert(BrazilianStemmer.filter("metodologias") === "metodologias")
    // RV("partira") = "tira": step2's length-3 "ira" branch removes "ava"
    // (a no-op) but marks altered, so step4's residual strip never runs
    assert(BrazilianStemmer.filter("partira") === "partira")
  }
}
