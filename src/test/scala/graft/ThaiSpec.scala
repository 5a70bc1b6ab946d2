package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{StopSets, Thai}

/** Thai segmentation vs the reference's TestThaiAnalyzer vectors. */
class ThaiSpec extends AnyFunSuite {

  test("DBBI available in this JRE") {
    assert(Thai.available)
  }

  test("basic segmentation (TestThaiAnalyzer.testAnalyzer)") {
    assert(Thai.tokenize("การที่ได้ต้องแสดงว่างานดี") ==
      Vector("การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"))
  }

  test("mixed thai/latin with symbols (testBuggyTokenType vector)") {
    assert(Thai.tokenize("บริษัทชื่อ XY&Z คุยกับ xyz@demo.com")
      .map(graft.analysis.Analyzer.lowerCase) ==
      Vector("บริษัท", "ชื่อ", "xy", "z", "คุย", "กับ", "xyz", "demo.com"))
  }

  test("two-word probe (testAttributeReuse)") {
    assert(Thai.tokenize("ภาษาไทย") == Vector("ภาษา", "ไทย"))
  }

  test("latin passthrough with lowercase (testEnglish)") {
    val (terms, _) =
      Thai.analyzeFlat("This is a test. การที่ได้ต้องแสดงว่างานดี", Set.empty)
    assert(terms.toVector == Vector("this", "is", "a", "test",
      "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"))
  }

  test("default stop set drops particles (testDefaultStopwordsUsed)") {
    val (terms, positions) =
      Thai.analyzeFlat("การที่ได้ต้องแสดงว่างานดี", StopSets.thai)
    assert(terms.toVector == Vector("แสดง", "งาน", "ดี"))
    // StopFilter leaves position gaps: แสดง is the 5th token (pos 4)
    assert(positions.toVector == Vector(4, 6, 7))
  }
}
