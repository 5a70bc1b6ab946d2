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

  test("divergence census vs the reference's compiled break/norm data") {
    // The reference ships ICU data-format-v2 binaries modern ICU4J
    // refuses to load (utr30.nrm for exact-UTR#30 normalization,
    // Default.brk / Khmer.brk / Myanmar tailorings for icu/segmentation/
    // DefaultICUTokenizerConfig.java) — the SURVEY-documented
    // environmental limit. This census PINS the engine's behavior on
    // every known-divergent class so the set is enumerated, not vague:
    import graft.analysis.IcuText.tokenize
    // (1) Khmer: the runtime ICU4J dictionary segments into syllabic
    //     words (3 tokens here); the reference's custom Khmer.brk may
    //     tailor boundaries differently. Pinned: token char-lengths and
    //     slots over a 15-char run.
    val km = "កម្ពុជាជាប្រទេស"
    assert(tokenize(km).map(t => (t._1.length, t._2)) ==
      Seq((7, 0), (2, 1), (6, 2)))
    assert(tokenize(km).map(_._1).mkString == km) // partition, no loss
    // (2) Myanmar: no runtime dictionary -> the whole 13-char syllable
    //     run stays ONE token, where the reference's tailored Default.brk
    //     breaks syllables. Pinned as the single-token behavior.
    val my = "မြန်မာနိုင်ငံ"
    assert(tokenize(my).map(t => (t._1.length, t._2)) == Seq((13, 0)))
    // (3) Lao: runtime dictionary splits (5,3) — included so the census
    //     records which SEA scripts DO segment here.
    val lo = "ປະເທດລາວ"
    assert(tokenize(lo).map(t => (t._1.length, t._2)) ==
      Seq((5, 0), (3, 1)))
    // (4) Folding: the rule-ported UTR#30 set covers the published
    //     foldings (ligatures, width, superscripts) — these are NOT
    //     divergent; pinned here as the census's green boundary.
    import graft.analysis.IcuFolding.fold
    assert(fold("ﬃ") == "ffi")
    assert(fold("Ａｂｃ") == "abc")
    assert(fold("ʰᵘᶠᶠ") == "huff")
  }

  test("tokenize: punctuation and whitespace emit nothing") {
    assert(IcuText.tokenize("... --- !!!").isEmpty)
    assert(IcuText.tokenize("don't stop").map(_._1) === Vector("don't", "stop"))
  }
}
