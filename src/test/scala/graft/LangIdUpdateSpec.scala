package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LangIdUpdate
import graft.operators.LangIdUpdate.{Config, Detected}

/** Vectors from the reference's
  * LanguageIdentifierUpdateProcessorFactoryTestCase.java (the
  * detector-agnostic mapping/resolution/fallback assertions; the
  * Tika/LangDetect profile tests exercise the pluggable detector, which
  * here is the engine's stopword-profile heuristic). */
class LangIdUpdateSpec extends AnyFunSuite {

  private val noDetect: String => Seq[Detected] = _ => Nil
  private def en(certainty: Double = 1.0): String => Seq[Detected] =
    _ => Seq(Detected("en", certainty))

  // testMapFieldName (LanguageIdentifierUpdateProcessorFactoryTestCase
  // .java:86-111)
  test("getMappedField: default pattern, map.lcmap, enforceSchema, custom regex") {
    val cfg = Config(inputFields = Seq("name"),
      mapLcMap = Map("jp" -> "s", "zh" -> "cjk", "ko" -> "cjk"),
      enforceSchema = false)
    assert(LangIdUpdate.getMappedField(cfg, "test", "no") === Some("test_no"))
    assert(LangIdUpdate.getMappedField(cfg, "test", "en") === Some("test_en"))
    assert(LangIdUpdate.getMappedField(cfg, "test", "jp") === Some("test_s"))
    assert(LangIdUpdate.getMappedField(cfg, "test", "zh") === Some("test_cjk"))
    assert(LangIdUpdate.getMappedField(cfg, "test", "ko") === Some("test_cjk"))

    // enforceSchema=true: unknown output field -> None
    val strict = cfg.copy(enforceSchema = true,
      schemaFields = Some(Set("title_no_s", "body_sv_s")))
    assert(LangIdUpdate.getMappedField(strict, "inputfield", "sv") === None)

    // custom pattern/replace, still enforced
    val custom = strict.copy(mapPattern = "text_(.*?)_field",
      mapReplace = "$1_{lang}_s")
    assert(LangIdUpdate.getMappedField(custom, "text_title_field", "no") ===
      Some("title_no_s"))
    assert(LangIdUpdate.getMappedField(custom, "text_body_field", "sv") ===
      Some("body_sv_s"))
  }

  // testMapLangcode (:113-127)
  test("lcmap normalizes detected codes before whitelist/threshold") {
    val cfg = Config(inputFields = Seq("name"),
      lcMap = Map("zh_cn" -> "zh", "zh_tw" -> "zh"), enforceSchema = false)
    def res(code: String) = LangIdUpdate.resolveLanguage(cfg,
      Seq(Detected(code, 1.0)), Some("NA"))
    assert(res("zh_cn") === "zh")
    assert(res("zh_tw") === "zh")
    assert(res("no") === "no")
    assert(LangIdUpdate.resolveLanguage(cfg, Seq(Detected("zh_cn", 0.8)),
      Some("NA")) === "zh")
  }

  // testResolveLanguage (:237-258)
  test("resolveLanguage: empty list, fallback, threshold") {
    val cfg = Config(inputFields = Seq("text"), langField = Some("language"))
    assert(LangIdUpdate.resolveLanguage(cfg, Nil, None) === "")
    assert(LangIdUpdate.resolveLanguage(cfg, Nil, Some("fallback")) === "fallback")
    assert(LangIdUpdate.resolveLanguage(cfg, Seq(Detected("one", 1.0)),
      Some("fallback")) === "one")
    // under the default 0.5 threshold -> fallback
    assert(LangIdUpdate.resolveLanguage(cfg, Seq(Detected("under", 0.1)),
      Some("fallback")) === "fallback")
  }

  // testFallback (:216-235)
  test("fallback fields before fallback value; missing fields skipped") {
    val cfg = Config(inputFields = Seq("text"), langField = Some("language"),
      fallbackFields = Seq("noop", "fb"), fallbackValue = Some("fbVal"),
      enforceSchema = false)
    val short = Map("text" -> Seq("?!???"))
    assert(LangIdUpdate.process(cfg, short + ("fb" -> Seq("fbField")),
      noDetect)("language") === Seq("fbField"))
    assert(LangIdUpdate.process(cfg, short, noDetect)("language") ===
      Seq("fbVal"))
  }

  // testDefaultFallbackEmptyString (:203-214)
  test("no fallback configured resolves to empty string") {
    val cfg = Config(inputFields = Seq("text"), langField = Some("language"),
      enforceSchema = false)
    assert(LangIdUpdate.process(cfg, Map("text" -> Seq("??")), noDetect)(
      "language") === Seq(""))
  }

  // testPreExisting (:129-153)
  test("pre-existing langField wins without overwrite; mapping uses it") {
    val cfg = Config(inputFields = Seq("text"), langField = Some("language"),
      langsField = Some("languages"), mapEnable = true, enforceSchema = false)
    val doc = Map("id" -> Seq("1"), "text" -> Seq("Apache Lucene is great"))

    val d1 = LangIdUpdate.process(cfg, doc, en())
    assert(d1("language") === Seq("en"))
    assert(d1("languages") === Seq("en"))
    assert(d1.contains("text_en") && !d1.contains("text"))

    val d2 = LangIdUpdate.process(cfg, doc + ("language" -> Seq("no")), en())
    assert(d2("language") === Seq("no"))
    assert(d2("languages") === Seq("no"))
    assert(d2.contains("text_no")) // mapped with the existing language
  }

  test("overwrite=true re-detects over a pre-existing value") {
    val cfg = Config(inputFields = Seq("text"), langField = Some("language"),
      overwrite = true, enforceSchema = false)
    val doc = Map("text" -> Seq("x"), "language" -> Seq("no"))
    assert(LangIdUpdate.process(cfg, doc, en())("language") === Seq("en"))
  }

  test("mapKeepOrig keeps the source field; whitelist gates detection") {
    val cfg = Config(inputFields = Seq("text"), langField = Some("lang_out"),
      mapEnable = true, mapKeepOrig = true, whitelist = Set("de", "fr"),
      fallbackValue = Some("other"), enforceSchema = false)
    val doc = Map("text" -> Seq("hello"))
    val out = LangIdUpdate.process(cfg, doc, en()) // en not whitelisted
    assert(out("lang_out") === Seq("other"))
    assert(out.contains("text_other") && out.contains("text"))
  }

  test("map.individual re-detects per field and collects langsField") {
    val cfg = Config(inputFields = Seq("a"), langField = Some("language"),
      langsField = Some("languages"), mapEnable = true,
      mapFields = Seq("a", "b"), mapIndividual = true,
      mapIndividualFields = Seq("b"), enforceSchema = false)
    val detect: String => Seq[Detected] = s =>
      if (s.contains("bonjour")) Seq(Detected("fr", 1.0))
      else Seq(Detected("en", 1.0))
    val doc = Map("a" -> Seq("hello world"), "b" -> Seq("bonjour monde"))
    val out = LangIdUpdate.process(cfg, doc, detect)
    assert(out("language") === Seq("en"))
    assert(out.contains("a_en") && out.contains("b_fr"))
    assert(out("languages") === Seq("en", "fr"))
  }

  test("stopword detector: engine profile over [a-z0-9]+ tokens") {
    assert(LangIdUpdate.stopwordDetector("the quick fox and the dog") ===
      Seq(Detected("en", 1.0)))
    assert(LangIdUpdate.stopwordDetector("12345 !!!") === Nil)
  }

  test("detectionText truncates per field and in total") {
    val cfg = Config(inputFields = Seq("a", "b"), maxFieldValueChars = 3,
      maxTotalChars = 5)
    val doc = Map("a" -> Seq("abcdef"), "b" -> Seq("ghijkl"))
    assert(LangIdUpdate.detectionText(cfg, doc) === "abc g ")
  }
}
