package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.KStem

/** KStem pinned by the reference's own golden data: the 12,130
  * input/output pairs of kstemTestData.zip!kstem_examples.txt
  * (lucene/analysis/common/src/test/org/apache/lucene/analysis/en/
  * TestKStemmer.java:63 testVocabulary). */
class KStemSpec extends AnyFunSuite {

  test("full reference vocabulary (12,130 golden pairs)") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/stems/kstem_examples.txt"), "UTF-8")
    var n = 0
    val bad = Vector.newBuilder[(String, String, String)]
    for (line <- src.getLines() if line.nonEmpty) {
      val Array(in, expected) = line.split('\t')
      val got = KStem.stem(in)
      if (got != expected) bad += ((in, expected, got))
      n += 1
    }
    val fails = bad.result()
    assert(fails.isEmpty,
      s"${fails.length}/$n mismatches; first 20: ${fails.take(20)}")
    assert(n == 12129 || n == 12130, s"expected ~12130 pairs, read $n")
  }

  test("dictionary-gated behavior: derivational endings need a root hit") {
    assert(KStem.stem("aging") == "age") // direct conflation
    assert(KStem.stem("italians") == "italy") // plural -> nationality root
    assert(KStem.stem("memorial") == "memorial") // in dict: untouched
    assert(KStem.stem("dogs") == "dogs") // "dogs" is itself a head word
    assert(KStem.stem("hats") == "hat")
    assert(KStem.stem("UNCHANGED") == "UNCHANGED") // not lowercase alpha
    assert(KStem.stem("ab") == "ab") // len <= 2 untouched
  }
}
