package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.SmartChinese

/** SmartCN segmentation vs the reference's TestSmartChineseAnalyzer
  * vectors, using the reference's own coredict.mem lexicon. */
class SmartChineseSpec extends AnyFunSuite {

  private def terms(text: String): Vector[String] =
    SmartChinese.analyzeFlat(text)._1.toVector

  test("lexicon loads (85k words)") {
    assert(SmartChinese.dict.size > 80000)
    assert(SmartChinese.dict.get("购买") == 700)
  }

  test("basic segmentation (testChineseAnalyzer)") {
    assert(terms("我购买了道具和服装。") ==
      Vector("我", "购买", "了", "道具", "和", "服装"))
  }

  test("mixed latin with porter stem (testMixedLatinChinese)") {
    assert(terms("我购买 Tests 了道具和服装") ==
      Vector("我", "购买", "test", "了", "道具", "和", "服装"))
  }

  test("numerics form one token (testNumerics)") {
    assert(terms("我购买 Tests 了道具和服装1234") ==
      Vector("我", "购买", "test", "了", "道具", "和", "服装", "1234"))
  }

  test("full-width forms fold (testFullWidth)") {
    assert(terms("我购买 Ｔｅｓｔｓ 了道具和服装１２３４") ==
      Vector("我", "购买", "test", "了", "道具", "和", "服装", "1234"))
  }

  test("non-chinese symbol is a delimiter (testDelimiters)") {
    assert(terms("我购买︱ Tests 了道具和服装") ==
      Vector("我", "购买", "test", "了", "道具", "和", "服装"))
  }

  test("other-script letters tokenize per char (testNonChinese)") {
    assert(terms("我购买 روبرتTests 了道具和服装") ==
      Vector("我", "购买", "ر", "و", "ب", "ر", "ت", "test",
        "了", "道具", "和", "服装"))
  }

  test("OOV names split to single chars (testOOV)") {
    assert(terms("优素福·拉扎·吉拉尼") ==
      Vector("优", "素", "福", "拉", "扎", "吉", "拉", "尼"))
    assert(terms("优素福拉扎吉拉尼") ==
      Vector("优", "素", "福", "拉", "扎", "吉", "拉", "尼"))
  }

  test("repeated sentence (testChineseAnalyzerTwice)") {
    val two = terms("我购买了道具和服装。 我购买了道具和服装。")
    assert(two == Vector("我", "购买", "了", "道具", "和", "服装",
      "我", "购买", "了", "道具", "和", "服装"))
  }

  test("stopped delimiter leaves a position gap (testChineseStopWords2)") {
    // ':' folds to the common delimiter token and is stop-removed;
    // the reference pins posIncr {1, 2} (and "Title" porter-stems)
    val (ts, ps) = SmartChinese.analyzeFlat("Title:San")
    assert(ts.toVector == Vector("titl", "san"))
    assert(ps.toVector == Vector(0, 2))
  }
}
