package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Rslp

/** RSLP stemmers vs the reference golden vocabularies (gltestdata.zip,
  * ptrslptestdata.zip). */
class RslpSpec extends AnyFunSuite {

  private def pairs(name: String): Vector[(String, String)] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val t = l.split('\t'); (t(0), if (t.length > 1) t(1) else "")
      }.toVector
    finally in.close()
  }

  private def check(name: String, stem: String => String, minWords: Int): Unit = {
    val vecs = pairs(name)
    assert(vecs.length >= minWords)
    var bad = 0
    val ex = Vector.newBuilder[String]
    vecs.foreach { case (w, want) =>
      val got = stem(w)
      if (got != want) { bad += 1; if (bad <= 15) ex += s"$w -> $got (want $want)" }
    }
    assert(bad == 0, s"$bad/${vecs.length} mismatches; first: ${ex.result().mkString("; ")}")
  }

  test("Galician RSLP: full reference vocabulary (9.4k pairs)") {
    check("/stems/glrslp.txt", Rslp.galician, 9000)
  }
  test("Portuguese RSLP: full reference vocabulary (32k pairs)") {
    check("/stems/ptrslp.txt", Rslp.portuguese, 30000)
  }
  test("Galician minimal: plural-only step") {
    // reference TestGalicianMinimalStemFilter vectors
    assert(Rslp.galicianMinimal("elefantes") == "elefante")
    assert(Rslp.galicianMinimal("elefante") == "elefante")
    assert(Rslp.galicianMinimal("kalóres") == "kalór")
    assert(Rslp.galicianMinimal("E") == "e")
  }
}
