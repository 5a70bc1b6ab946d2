package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Analyzer, LightStemmers, StopSets}

/** Light stemmers vs the reference's full golden-vector data — the same
  * word pairs TestGermanLightStemFilter / TestSpanishLightStemFilter /
  * TestItalianLightStemFilter / TestFrenchMinimalStemFilter assert against
  * (delighttestdata.zip etc., ~120k pairs total). */
class LightStemSpec extends AnyFunSuite {

  private def pairs(name: String): Vector[(String, String)] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val t = l.split('\t'); (t(0), t(1))
      }.toVector
    finally in.close()
  }

  private def check(name: String, stem: String => String, minWords: Int): Unit = {
    val vecs = pairs(name)
    assert(vecs.length >= minWords)
    var bad = 0
    val examples = Vector.newBuilder[String]
    vecs.foreach { case (w, want) =>
      val got = stem(w)
      if (got != want) {
        bad += 1
        if (bad <= 10) examples += s"$w -> $got (want $want)"
      }
    }
    assert(bad == 0, s"$bad mismatches; first: ${examples.result().mkString("; ")}")
  }

  test("German light: full reference vocabulary (35k pairs)") {
    check("/stems/delight.txt", LightStemmers.german, 30000)
  }
  test("Spanish light: full reference vocabulary (28k pairs)") {
    check("/stems/eslight.txt", LightStemmers.spanish, 25000)
  }
  test("Italian light: full reference vocabulary (35k pairs)") {
    check("/stems/itlight.txt", LightStemmers.italian, 30000)
  }
  test("French minimal: full reference vocabulary (20k pairs)") {
    check("/stems/frminimal.txt", LightStemmers.french, 18000)
  }
  test("Portuguese light: full reference vocabulary (32k pairs)") {
    check("/stems/ptlight.txt", LightStemmers.portuguese, 30000)
  }
  test("Russian light: full reference vocabulary (49k pairs)") {
    check("/stems/rulight.txt", LightStemmers.russian, 45000)
  }
  test("Swedish light: full reference vocabulary (30k pairs)") {
    check("/stems/svlight.txt", LightStemmers.swedish, 28000)
  }
  test("Finnish light: full reference vocabulary (50k pairs)") {
    check("/stems/filight.txt", LightStemmers.finnish, 45000)
  }
  test("Hungarian light: full reference vocabulary (30k pairs)") {
    check("/stems/hulight.txt", LightStemmers.hungarian, 28000)
  }
  test("Norwegian light: reference nb_light.txt golden data") {
    check("/stems/nolight.txt", LightStemmers.norwegian, 100)
  }
  test("Norwegian minimal: reference nb_minimal.txt golden data") {
    check("/stems/nominimal.txt", LightStemmers.norwegianMinimal, 70)
  }
  test("German minimal: full reference vocabulary (35k pairs)") {
    check("/stems/deminimal.txt", LightStemmers.germanMinimal, 30000)
  }
  test("Czech: reference TestCzechStemmer vectors") {
    check("/stems/czvectors.txt", LightStemmers.czech, 130)
  }
  test("Latvian: reference TestLatvianStemmer vectors") {
    check("/stems/lvvectors.txt", LightStemmers.latvian, 100)
  }
  test("Bulgarian: reference TestBulgarianStemmer vectors") {
    check("/stems/bgvectors.txt", LightStemmers.bulgarian, 90)
  }
  test("Hindi: reference TestHindiStemmer vectors") {
    check("/stems/hivectors.txt", LightStemmers.hindi, 15)
  }
  test("Hindi normalizer: reference TestHindiNormalizer vectors") {
    check("/stems/hinorm.txt", LightStemmers.hindiNormalize, 14)
  }
  test("Indonesian: reference TestIndonesianStemmer vectors") {
    check("/stems/idvectors.txt", LightStemmers.indonesian, 55)
  }
  test("Sorani: full reference vocabulary (8k pairs, ckbtestdata.zip)") {
    check("/stems/ckbstem.txt", LightStemmers.sorani, 8000)
  }
  test("Arabic stemmer: reference TestArabicStemFilter vectors") {
    check("/stems/arstem.txt", LightStemmers.arabicStem, 18)
  }
  test("Arabic normalizer: reference TestArabicNormalizationFilter vectors") {
    check("/stems/arnorm.txt", LightStemmers.arabicNormalize, 12)
  }
  test("Persian normalizer: reference TestPersianNormalizationFilter vectors") {
    check("/stems/fanorm.txt", LightStemmers.persianNormalize, 5)
  }
  test("Greek: reference TestGreekStemmer vectors (335 pairs)") {
    import graft.analysis.GreekStemmer
    check("/stems/elvectors.txt",
      w => GreekStemmer.stem(GreekStemmer.lowerCase(w)), 300)
  }

  test("snowball stop sets load for the five new languages") {
    import graft.analysis.StopSets
    assert(StopSets.forLang("pt").contains("de") && StopSets.forLang("pt").size > 100)
    assert(StopSets.forLang("ru").contains("и") && StopSets.forLang("ru").size > 100)
    assert(StopSets.forLang("sv").contains("och"))
    assert(StopSets.forLang("fi").contains("ja"))
    assert(StopSets.forLang("hu").contains("és"))
  }

  test("corpus-vocabulary witnesses (the oracle queries' stem families)") {
    assert(LightStemmers.german("order") == "ord")
    assert(LightStemmers.german("customer") == "custom")
    assert(LightStemmers.french("vector") == "vecto")
    assert(LightStemmers.spanish("table") == "tabl")
    // Italian strips only final vowels; consonant-final English-ish vocab
    // is untouched (len<6 also untouched)
    assert(LightStemmers.italian("window") == "window")
    assert(LightStemmers.italian("finestra") == "finestr")
  }

  test("light chain: stop-before-stem with position gaps") {
    val (terms, pos) = Analyzer.analyzeLightFlat(
      "der Fenster und die Ordner", StopSets.forLang("de"),
      LightStemmers.german)
    // "der"/"und"/"die" are German stopwords; gaps preserved
    assert(terms.toSeq == Seq("fen", "ordn"))
    assert(pos.toSeq == Seq(1, 4))
  }

  test("English minimal s-stemmer: reference examples incl. the fallthrough") {
    import graft.analysis.LightStemmers.englishMinimal
    // TestEnglishMinimalStemFilter.testExamples
    assert(englishMinimal("queries") === "query")
    assert(englishMinimal("phrases") === "phrase")
    assert(englishMinimal("corpus") === "corpus")
    assert(englishMinimal("stress") === "stress")
    assert(englishMinimal("kings") === "king")
    assert(englishMinimal("panels") === "panel")
    assert(englishMinimal("aerodynamics") === "aerodynamic")
    assert(englishMinimal("congress") === "congress")
    assert(englishMinimal("serious") === "serious")
    // guards: -ies after a/e keeps; vowel+es keeps; short words keep
    assert(englishMinimal("aes") === "aes")
    assert(englishMinimal("ties") === "ty") // len-4 't' is not a/e
    assert(englishMinimal("goes") === "goes")
    assert(englishMinimal("as") === "as")
  }

}
