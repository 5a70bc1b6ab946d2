package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.IcuText

/** ICU normalization / transliteration / segmentation against the
  * reference's own vectors (icu/src/test/.../TestICUNormalizer2Filter
  * .java:56-88, TestICUTransformFilter.java:38-61). */
class IcuTextSpec extends AnyFunSuite {

  test("nfkc_cf default: TestICUNormalizer2Filter vectors") {
    assert(IcuText.normalize("This is a test") === "this is a test")
    assert(IcuText.normalize("Ruß") === "russ")        // case folding
    assert(IcuText.normalize("ΜΆΪΟΣ") === "μάϊοσ")      // case folding
    assert(IcuText.normalize("Μάϊος") === "μάϊοσ")
    assert(IcuText.normalize("ﴳﴺﰧ") === "طمطمطم")       // compatibility composed
    assert(IcuText.normalize("क्‍ष") === "क्ष")     // default-ignorable removed
  }

  test("explicit decompose mode (the test's custom nfc DECOMPOSE filter)") {
    assert(IcuText.normalize("é", "nfd") === "\u0065\u0301")
  }

  test("transform: TestICUTransformFilter basic functionality") {
    assert(IcuText.transform("Traditional-Simplified", "簡化字") === "简化字")
    assert(IcuText.transform("Katakana-Hiragana", "ヒラガナ") === "ひらがな")
    assert(IcuText.transform("Fullwidth-Halfwidth", "アルアノリウ") === "ｱﾙｱﾉﾘｳ")
    assert(IcuText.transform("Any-Latin", "Αλφαβητικός Κατάλογος")
      === "Alphabētikós Katálogos")
    assert(IcuText.transform("NFD; [:Nonspacing Mark:] Remove",
      "Alphabētikós Katálogos") === "Alphabetikos Katalogos")
    assert(IcuText.transform("Han-Latin", "中国") === "zhōng guó")
  }

  test("transform: custom rules (TestICUTransformFilter.testCustomFunctionality)") {
    assert(IcuText.transform("test-ab", "abacadaba",
      Some("a > b; b > c;")) === "bcbcbdbcb")
  }

  test("tokenize: UAX#29 + dictionary breaks for Thai and CJK") {
    val toks = IcuText.tokenize("testing คนที่ไปโรงเรียน 1234 日本語テキスト")
    assert(toks.map(_._1) ===
      Vector("testing", "คน", "ที่", "ไป", "โรงเรียน", "1234", "日本語", "テキスト"))
    assert(toks.map(_._2) === (0 until 8).toVector)
  }

  test("tokenize: punctuation and whitespace emit nothing") {
    assert(IcuText.tokenize("... --- !!!").isEmpty)
    assert(IcuText.tokenize("don't stop").map(_._1) === Vector("don't", "stop"))
  }
}
