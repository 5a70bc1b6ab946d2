package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Phonetic

/** Soundex pins: the textbook examples (Knuth TAOCP vol. 3 §5.4) plus the
  * corpus witnesses the ft_phonetic oracle depends on. */
class PhoneticSpec extends AnyFunSuite {

  test("textbook codes") {
    assert(Phonetic.soundex("robert") == "R163")
    assert(Phonetic.soundex("rupert") == "R163")
    assert(Phonetic.soundex("ashcraft") == "A261") // h transparent
    assert(Phonetic.soundex("ashcroft") == "A261")
    assert(Phonetic.soundex("tymczak") == "T522")
    assert(Phonetic.soundex("pfister") == "P236")
    assert(Phonetic.soundex("honeyman") == "H555")
  }

  test("corpus witnesses: vektor ~ vector; no other vocab word is V236") {
    assert(Phonetic.soundex("vektor") == "V236")
    assert(Phonetic.soundex("vector") == "V236")
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer",
      "data", "dup", "fast", "filter", "group", "hash", "join", "key",
      "line", "merge", "order", "part", "query", "row", "scan", "slow",
      "small", "sort", "spark", "stream", "table", "the", "value",
      "window")
    assert(vocab.forall(w => Phonetic.soundex(w) != "V236"))
  }

  test("edge cases") {
    assert(Phonetic.soundex("") == "")
    assert(Phonetic.soundex("42") == "")
    assert(Phonetic.soundex("a") == "A000")
    assert(Phonetic.soundex("Washington") == "W252")
  }
}
