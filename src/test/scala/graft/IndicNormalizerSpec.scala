package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.IndicNormalizer

/** IndicNormalizer vs the reference's test vectors
  * (in/TestIndicNormalizer.java:37-45). */
class IndicNormalizerSpec extends AnyFunSuite {

  test("TestIndicNormalizer basics") {
    assert(IndicNormalizer.normalize("अाॅअाॅ") === "ऑऑ")
    assert(IndicNormalizer.normalize("अाॆअाॆ") === "ऒऒ")
    assert(IndicNormalizer.normalize("अाेअाे") === "ओओ")
    assert(IndicNormalizer.normalize("अाैअाै") === "औऔ")
    assert(IndicNormalizer.normalize("अाअा") === "आआ")
    assert(IndicNormalizer.normalize("अाैर") === "और")
    // bengali khanda-ta: ta + virama + ZWJ composes
    assert(IndicNormalizer.normalize("ত্‍") === "ৎ")
  }

  test("nukta consonants compose (devanagari qa)") {
    // U+0915 KA + U+093C NUKTA -> U+0958 QA
    assert(IndicNormalizer.normalize("क़") === "क़")
  }

  test("empty and non-Indic text pass through") {
    assert(IndicNormalizer.normalize("") === "")
    assert(IndicNormalizer.normalize("hello") === "hello")
  }
}
