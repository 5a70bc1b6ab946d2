package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Collation

/** Collation-key vectors from the reference tests:
  *  - TestICUCollationDocValuesField.testBasic (en: "abc" sorts before
  *    "ABC"),
  *  - CollationTestBase.testFarsiRangeQueryCollating (fa/ar: U+0633 word
  *    excluded from [U+062F, U+0698], included in [U+0633, U+0638] —
  *    the opposite of code-point order),
  *  - TestICUCollationDocValuesField.testRanges' differential property
  *    (range membership via key bytes == collator.compare), seeded.
  */
class CollationSpec extends AnyFunSuite {

  test("ICU en: lowercase sorts before uppercase at tertiary (testBasic)") {
    val key = Collation.icuKey("en")
    assert(Collation.compareKeys(key("abc"), key("ABC")) < 0)
    // binary code-point order says the opposite
    assert("abc".compareTo("ABC") > 0)
    val sorted = Seq("Merge", "merge", "ABC", "abc").sortWith(
      (a, b) => Collation.compareKeys(key(a), key(b)) < 0)
    assert(sorted === Seq("abc", "ABC", "merge", "Merge"))
  }

  test("Farsi range semantics (CollationTestBase farsi vectors)") {
    val word = "ساب"
    for (key <- Seq(Collation.icuKey("ar"), Collation.icuKey("fa"),
      Collation.jdkKey("ar"))) {
      val in = Collation.inRange(key) _
      // Unicode order would include U+0633 in [U+062F, U+0698]; the
      // collator orders U+0698 before U+0633, so it must be excluded...
      assert(!in(word, "د", "ژ", true, true))
      // ...and included in [U+0633, U+0638].
      assert(in(word, "س", "ظ", true, true))
    }
  }

  test("differential: key-byte range == collator.compare range (testRanges)") {
    val coll = com.ibm.icu.text.Collator.getInstance(
      new com.ibm.icu.util.ULocale("de"))
    val key = Collation.icuKey("de")
    val rnd = new scala.util.Random(42)
    def simple(): String =
      (0 until (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(28)).toChar)
        .map(c => if (c > 'z') (if (c == '{') 'ä' else 'ß') else c)
        .map(c => if (rnd.nextBoolean()) c.toUpper else c).mkString
    val values = Vector.fill(300)(simple())
    var checks = 0
    (0 until 100).foreach { _ =>
      val lo = simple(); val hi = simple()
      values.foreach { v =>
        val byKey = Collation.inRange(key)(v, lo, hi, true, true)
        val byCmp = coll.compare(v, lo) >= 0 && coll.compare(v, hi) <= 0
        assert(byKey === byCmp, s"v=$v lo=$lo hi=$hi")
        checks += 1
      }
    }
    assert(checks === 30000)
  }

  test("PRIMARY strength ignores case and accents") {
    val key = Collation.icuKey("en",
      Some(com.ibm.icu.text.Collator.PRIMARY))
    assert(Collation.compareKeys(key("ABC"), key("abc")) === 0)
    assert(Collation.compareKeys(key("résumé"), key("resume")) === 0)
    val tert = Collation.icuKey("en")
    assert(Collation.compareKeys(tert("résumé"), tert("resume")) !== 0)
  }
}
