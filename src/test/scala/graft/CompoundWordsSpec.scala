package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.CompoundWords

/** Golden vectors from the reference's
  * TestCompoundWordTokenFilter.java:134 (testDumbCompoundWordsSE,
  * testDumbCompoundWordsSELongestMatch,
  * testTokenEndingWithWordComponentOfMinimumLength,
  * testWordComponentWithLessThanMinimumLength). */
class CompoundWordsSpec extends AnyFunSuite {

  private val seDict = CompoundWords.compileDict(Seq("Bil", "Dörr", "Motor",
    "Tak", "Borr", "Slag", "Hammar", "Pelar", "Glas", "Ögon", "Fodral",
    "Bas", "Fiol", "Makare", "Gesäll", "Sko", "Vind", "Rute", "Torkare",
    "Blad"))

  private def full(token: String, dict: Set[String],
                   longest: Boolean = false): Seq[String] =
    token +: CompoundWords.decompose(token, dict,
      onlyLongestMatch = longest)

  test("testDumbCompoundWordsSE vectors") {
    assert(full("Bildörr", seDict) == Seq("Bildörr", "Bil", "dörr"))
    assert(full("Bilmotor", seDict) == Seq("Bilmotor", "Bil", "motor"))
    assert(full("Biltak", seDict) == Seq("Biltak", "Bil", "tak"))
    assert(full("Slagborr", seDict) == Seq("Slagborr", "Slag", "borr"))
    assert(full("Hammarborr", seDict) == Seq("Hammarborr", "Hammar", "borr"))
    assert(full("Pelarborr", seDict) == Seq("Pelarborr", "Pelar", "borr"))
    assert(full("Glasögonfodral", seDict) ==
      Seq("Glasögonfodral", "Glas", "ögon", "fodral"))
    assert(full("Basfiolsfodral", seDict) ==
      Seq("Basfiolsfodral", "Bas", "fiol", "fodral"))
    assert(full("Basfiolsfodralmakaregesäll", seDict) ==
      Seq("Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral", "makare",
        "gesäll"))
    assert(full("Skomakare", seDict) == Seq("Skomakare", "Sko", "makare"))
    assert(full("Vindrutetorkare", seDict) ==
      Seq("Vindrutetorkare", "Vind", "rute", "torkare"))
    assert(full("Vindrutetorkarblad", seDict) ==
      Seq("Vindrutetorkarblad", "Vind", "rute", "blad"))
    // below minWordSize=5: no decomposition attempted
    assert(full("abba", seDict) == Seq("abba"))
  }

  test("testDumbCompoundWordsSELongestMatch") {
    val dict = CompoundWords.compileDict(Seq("Bil", "Dörr", "Motor", "Tak",
      "Borr", "Slag", "Hammar", "Pelar", "Glas", "Ögon", "Fodral", "Bas",
      "Fiols", "Makare", "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad",
      "Fiolsfodral"))
    assert(full("Basfiolsfodralmakaregesäll", dict, longest = true) ==
      Seq("Basfiolsfodralmakaregesäll", "Bas", "fiolsfodral", "fodral",
        "makare", "gesäll"))
  }

  test("token ending with minimum-length word component") {
    val dict = CompoundWords.compileDict(Seq("ab", "cd", "ef"))
    assert(full("abcdef", dict) == Seq("abcdef", "ab", "cd", "ef"))
  }

  test("word component shorter than minSubwordSize is dropped") {
    val dict = CompoundWords.compileDict(Seq("abc", "d", "efg"))
    assert(full("abcdefg", dict) == Seq("abcdefg", "abc", "efg"))
  }

  test("dictionary lookup is case-insensitive, output keeps token case") {
    val dict = CompoundWords.compileDict(Seq("RIND", "fleisch"))
    assert(full("Rindfleisch", dict) == Seq("Rindfleisch", "Rind", "fleisch"))
  }

  test("applyFlat injects at the compound's position with dl unchanged") {
    val dict = CompoundWords.compileDict(Seq("basket", "ball"))
    val (t, p, dl) = CompoundWords.applyFlat(
      Array("the", "basketball", "game"), Array(0, 1, 2), dict)
    assert(t.toSeq == Seq("the", "basketball", "basket", "ball", "game"))
    assert(p.toSeq == Seq(0, 1, 1, 1, 2))
    assert(dl == 3)
  }
}
