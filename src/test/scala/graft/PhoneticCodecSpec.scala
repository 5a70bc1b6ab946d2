package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Phonetic

/** BeiderMorse / DaitchMokotoffSoundex / generic PhoneticFilter semantics
  * against the reference's own test vectors (lucene/analysis/phonetic
  * TestBeiderMorseFilter.java, TestDaitchMokotoffSoundexFilter.java,
  * TestPhoneticFilter.java). The encoders themselves are commons-codec,
  * the exact library the reference filters wrap. */
class PhoneticCodecSpec extends AnyFunSuite {

  private def flat(ts: Seq[String]): (Array[String], Array[Int]) =
    (ts.toArray, ts.indices.toArray)

  test("BeiderMorse: TestBeiderMorseFilter.testBasicUsage (EXACT, concat)") {
    assert(Phonetic.beiderMorse("Angelo") ==
      Seq("anZelo", "andZelo", "angelo", "anhelo", "anjelo", "anxelo"))
    assert(Phonetic.beiderMorse("D'Angelo") ==
      Seq("anZelo", "andZelo", "angelo", "anhelo", "anjelo", "anxelo",
          "danZelo", "dandZelo", "dangelo", "danhelo", "danjelo", "danxelo"))
  }

  test("BeiderMorse: testLanguageSet (italian+greek+spanish)") {
    assert(Phonetic.beiderMorse("Angelo",
      languages = Set("italian", "greek", "spanish")) ==
      Seq("andZelo", "angelo", "anxelo"))
  }

  test("BeiderMorse: testNumbers — no-letter token passes through") {
    assert(Phonetic.beiderMorse("1234") == Seq("1234"))
  }

  test("BeiderMorse flat: alternates share the original position") {
    val (t, p) = Phonetic.beiderMorseFlat(
      Array("Angelo", "1234"), Array(0, 1))
    assert(t.length == 7)
    assert(p.toSeq == Seq(0, 0, 0, 0, 0, 0, 1))
  }

  test("DM-Soundex: TestDaitchMokotoffSoundexFilter.testAlgorithms") {
    val (inj, _) = Phonetic.dmSoundexFlat(
      flat(Seq("aaa", "bbb", "ccc", "easgasg"))._1,
      Array(0, 1, 2, 3), inject = true)
    assert(inj.toSeq == Seq("aaa", "000000", "bbb", "700000", "ccc",
      "400000", "450000", "454000", "540000", "545000", "500000",
      "easgasg", "045450"))
    val (rep, _) = Phonetic.dmSoundexFlat(
      flat(Seq("aaa", "bbb", "ccc", "easgasg"))._1,
      Array(0, 1, 2, 3), inject = false)
    assert(rep.toSeq == Seq("000000", "700000", "400000", "450000",
      "454000", "540000", "545000", "500000", "045450"))
  }

  test("PhoneticFilter: TestPhoneticFilter.testAlgorithms vectors") {
    val in = flat(Seq("aaa", "bbb", "ccc", "easgasg"))
    val (mInj, _) = Phonetic.phoneticFlat(in._1, in._2, "Metaphone", inject = true)
    assert(mInj.toSeq == Seq("A", "aaa", "B", "bbb", "KKK", "ccc", "ESKS", "easgasg"))
    val (mRep, _) = Phonetic.phoneticFlat(in._1, in._2, "Metaphone", inject = false)
    assert(mRep.toSeq == Seq("A", "B", "KKK", "ESKS"))
    val (dInj, _) = Phonetic.phoneticFlat(in._1, in._2, "DoubleMetaphone", inject = true)
    assert(dInj.toSeq == Seq("A", "aaa", "PP", "bbb", "KK", "ccc", "ASKS", "easgasg"))
    val (dRep, _) = Phonetic.phoneticFlat(in._1, in._2, "DoubleMetaphone", inject = false)
    assert(dRep.toSeq == Seq("A", "PP", "KK", "ASKS"))
  }

  test("PhoneticFilter: unchanged encoding keeps only the original") {
    // Metaphone("A") == "A": encode equals input -> pass through, no inject
    val in = flat(Seq("A"))
    val (t, _) = Phonetic.phoneticFlat(in._1, in._2, "Metaphone", inject = true)
    assert(t.toSeq == Seq("A"))
  }

  test("corpus property behind ft_phonetic_bm/_dmx: 'vektor' matches " +
       "exactly {vector} in the corpus vocabulary") {
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer",
      "data", "dup", "fast", "filter", "group", "hash", "join", "key",
      "line", "merge", "order", "part", "query", "row", "scan", "slow",
      "small", "sort", "spark", "stream", "table", "the", "value",
      "vector", "window")
    val qBm = Phonetic.beiderMorse("vektor", exact = false).toSet
    val bmMatches = vocab.filter(w =>
      Phonetic.beiderMorse(w, exact = false).exists(qBm))
    assert(bmMatches == Seq("vector"), s"bm: $bmMatches")
    val qDm = Phonetic.dmSoundex("vektor").toSet
    val dmMatches = vocab.filter(w => Phonetic.dmSoundex(w).exists(qDm))
    assert(dmMatches == Seq("vector"), s"dm: $dmMatches")
  }
}
