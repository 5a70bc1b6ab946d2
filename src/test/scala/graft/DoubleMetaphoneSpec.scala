package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.DoubleMetaphone

/** Golden vectors from the reference's phonetic module tests
  * (lucene/analysis/phonetic/src/test/.../DoubleMetaphoneFilterTest.java,
  * TestPhoneticFilter.java) plus published examples of the Philips
  * algorithm. */
class DoubleMetaphoneSpec extends AnyFunSuite {

  private def enc(w: String, len: Int = 4): (String, String) = {
    val e = new DoubleMetaphone(len)
    (e.encode(w, alternate = false), e.encode(w, alternate = true))
  }

  test("DoubleMetaphoneFilterTest vectors") {
    // testSize4FalseInject / testSize4TrueInject
    assert(enc("international")._1 == "ANTR")
    // testSize8FalseInject
    assert(enc("international", 8)._1 == "ANTRNXNL")
    // testAlternateInjectFalse
    assert(enc("Kuczewski") == (("KSSK", "KXFS")))
    // testNonConvertableStringsWithoutInject — trailing real word
    assert(enc("hello", 8)._1 == "HL")
  }

  test("TestPhoneticFilter algorithm vectors (default maxCodeLen=4)") {
    assert(enc("aaa")._1 == "A")
    assert(enc("bbb")._1 == "PP")
    assert(enc("ccc")._1 == "KK")
    assert(enc("easgasg")._1 == "ASKS")
  }

  test("non-encodable input passes through at the filter layer") {
    assert(DoubleMetaphone.filterTokens("12345") == Seq("12345"))
    assert(DoubleMetaphone.filterTokens("#$%@#^%&") == Seq("#$%@#^%&"))
    assert(DoubleMetaphone.filterTokens("", 8) == Seq(""))
  }

  test("filter emission semantics (DoubleMetaphoneFilter.java)") {
    // inject=false: replace with primary (+ alternate when it differs)
    assert(DoubleMetaphone.filterTokens("international") == Seq("ANTR"))
    assert(DoubleMetaphone.filterTokens("Kuczewski") == Seq("KSSK", "KXFS"))
    // inject=true: original + codes
    assert(DoubleMetaphone.filterTokens("international", 4, inject = true) ==
      Seq("international", "ANTR"))
    assert(DoubleMetaphone.filterTokens("12345", 8, inject = true) ==
      Seq("12345"))
  }

  test("published algorithm examples") {
    // Philips' canonical illustration pairs: same code for both spellings
    assert(enc("Smith")._1 == enc("Smyth")._1)
    assert(enc("Katherine")._1 == enc("Catherine")._1)
    assert(enc("Thomas")._1 == "TMS")
    // Slavo-Germanic vs anglicized alternates diverge
    val (p, a) = enc("Schmidt")
    assert(p == "XMT" && a == "SMT")
    // vowels only encode at position 0
    assert(enc("AOU")._1 == "A")
  }

  test("codes use only the Double-Metaphone alphabet") {
    val alpha = "AFHJKLMNPRSTX0 ".toSet
    for (w <- Seq("jumble", "exquisite", "brown", "fox", "Wagner", "Xavier",
                  "cough", "laugh", "night", "judge", "phone", "czar",
                  "Jose", "San Jose", "sugar", "island", "school", "charm"))
      for (c <- enc(w, 8)._1 ++ enc(w, 8)._2)
        assert(alpha.contains(c), s"$w -> ${enc(w, 8)}")
  }
}
