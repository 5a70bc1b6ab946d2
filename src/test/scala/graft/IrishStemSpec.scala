package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.SnowballStemmers2

/** Irish Snowball stemmer vs the reference analyzer vectors
  * (ga/TestIrishAnalyzer.java:38-59) plus hand-traced rule cases from
  * ext/IrishStemmer.java. */
class IrishStemSpec extends AnyFunSuite {

  test("TestIrishAnalyzer vectors") {
    assert(SnowballStemmers2.irish("siopadóireacht") === "siopadóir")
    assert(SnowballStemmers2.irish("síceapatacha") === "síceapaite")
  }

  test("initial_morph: eclipsis/lenition/elision prefixes") {
    assert(SnowballStemmers2.irish("n-athair") === "athair") // n- deleted
    assert(SnowballStemmers2.irish("bhfear") === "fear")     // bhf -> f (longest wins over bh)
    assert(SnowballStemmers2.irish("tsaoil") === "saoil")    // ts -> s
    assert(SnowballStemmers2.irish("dtír") === "tír")        // dt -> t
    assert(SnowballStemmers2.irish("chara") === "cara")      // ch -> c
    assert(SnowballStemmers2.irish("d'fhear") === "fear")    // d'fh -> f (longest over d')
  }

  test("noun_sfx longest-then-gate: R2 failure leaves the word whole") {
    // "ceolteoirí" ends irí (R2-gated) but p2 = 9 > match start 7: the
    // gate fails and the rule fails WITHOUT retrying a shorter suffix
    assert(SnowballStemmers2.irish("ceolteoirí") === "ceolteoirí")
  }

  test("verb_sfx: RV-gated delete") {
    // "ceapaimid" ends imid -> RV gate (past first vowel) -> "ceap"
    assert(SnowballStemmers2.irish("ceapaimid") === "ceap")
  }

  test("short words and no-vowel words pass through") {
    assert(SnowballStemmers2.irish("b") === "b")
    assert(SnowballStemmers2.irish("grr") === "grr")
  }
}
