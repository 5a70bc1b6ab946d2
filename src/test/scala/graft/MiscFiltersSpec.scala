package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Analyzer, MiscFilters, StandardTokenizer, Token}

/** Golden vectors from the reference tests:
  *  - util/TestElision.java:45-56
  *  - miscellaneous/TestLengthFilter.java:28-36
  *  - miscellaneous/TestKeepWordFilter.java:36-48
  *  - miscellaneous/TestTrimFilter.java:33-50
  *  - miscellaneous/TestTruncateTokenFilter.java:30-35
  *  - miscellaneous/TestLimitTokenCountFilter.java:27-34
  *  - tr/TestApostropheFilter.java:25-30
  *  - miscellaneous/TestRemoveDuplicatesTokenFilter.java:40-90
  */
class MiscFiltersSpec extends AnyFunSuite {

  private def ws(text: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    while (i < text.length) {
      while (i < text.length && text(i) == ' ') i += 1
      if (i < text.length) {
        val start = i
        while (i < text.length && text(i) != ' ') i += 1
        out += Token(text.substring(start, i), start, i, 1, "word")
      }
    }
    out.result()
  }

  private def terms(ts: Seq[Token]) = ts.map(_.term)
  private def incs(ts: Seq[Token]) = ts.map(_.posInc)

  test("ElisionFilter (testElision vector + default fr articles)") {
    val toks = StandardTokenizer.tokenize(
      "Plop, juste pour voir l'embrouille avec O'brian. M'enfin.")
    val stripped = toks.map(t =>
      MiscFilters.elision(t.term, Set("l", "m"))) // {l, M} case-insensitive
    assert(stripped(4) == "embrouille")
    assert(stripped(6) == "O'brian") // 'O' is not an article
    assert(stripped(7) == "enfin")
    // default article set, U+2019 apostrophe, pre-lowercase position
    assert(MiscFilters.elision("L’avion", MiscFilters.FrenchArticles) == "avion")
    assert(MiscFilters.elision("jusqu'ici", MiscFilters.FrenchArticles) == "ici")
    assert(MiscFilters.elision("dell'arte", MiscFilters.ItalianArticles) == "arte")
  }

  test("french chain applies elision before lowercase+stop+stem") {
    val (t, _) = Analyzer.analyzeLightFlat("l'Avion", Set.empty,
      graft.analysis.LightStemmers.french,
      pre = MiscFilters.elision(_, MiscFilters.FrenchArticles))
    assert(t.toSeq == Seq(graft.analysis.LightStemmers.french("avion")))
  }

  test("LengthFilter keeps [min,max] with position gaps (testFilterWithPosIncr)") {
    val r = MiscFilters.lengthFilter(
      ws("short toolong evenmuchlongertext a ab toolong foo"), 2, 6)
    assert(terms(r) == Seq("short", "ab", "foo"))
    assert(incs(r) == Seq(1, 4, 2))
    assertThrows[IllegalArgumentException](
      MiscFilters.lengthFilter(ws("x"), -4, -1))
  }

  test("KeepWordFilter (testStopAndGo)") {
    val in = ws("xxx yyy aaa zzz BBB ccc ddd EEE")
    val r = MiscFilters.keepWords(in, Set("aaa", "bbb"), ignoreCase = true)
    assert(terms(r) == Seq("aaa", "BBB"))
    assert(incs(r) == Seq(3, 2))
    // case-sensitive: BBB no longer matches
    val cs = MiscFilters.keepWords(in, Set("aaa", "bbb"))
    assert(terms(cs) == Seq("aaa"))
  }

  test("TrimFilter strips surrounding whitespace only") {
    val in = Vector(Token(" a ", 1, 5, 1, "word"), Token("b   ", 6, 10, 1, "word"),
      Token("cCc", 11, 15, 1, "word"), Token("   ", 16, 20, 1, "word"),
      Token("", 21, 21, 1, "word"))
    assert(terms(MiscFilters.trim(in)) == Seq("a", "b", "cCc", "", ""))
  }

  test("TruncateTokenFilter (testTruncating) + keyword protection") {
    val r = MiscFilters.truncate(
      ws("abcdefg 1234567 ABCDEFG abcde abc 12345 123"), 5)
    assert(terms(r) == Seq("abcde", "12345", "ABCDE", "abcde", "abc", "12345", "123"))
    val k = MiscFilters.truncate(ws("abcdefg"), 5, keywords = Set("abcdefg"))
    assert(terms(k) == Seq("abcdefg"))
    assertThrows[IllegalArgumentException](MiscFilters.truncate(ws("x"), -48))
  }

  test("LimitTokenCountFilter emits the first N tokens") {
    assert(terms(MiscFilters.limitTokenCount(ws("A1 B2 C3 D4 E5 F6"), 3)) ==
      Seq("A1", "B2", "C3"))
    assertThrows[IllegalArgumentException](
      MiscFilters.limitTokenCount(ws("x"), -1))
  }

  test("ApostropheFilter (testApostropheFilter, Turkish)") {
    val r = ws("türkiye'de 2003'te van gölü'nü gördüm").map(t =>
      MiscFilters.apostrophe(t.term))
    assert(r == Seq("türkiye", "2003", "van", "gölü", "gördüm"))
    assert(MiscFilters.apostrophe("gölü’nü") == "gölü")
  }

  test("RemoveDuplicatesTokenFilter: same term at same position only") {
    def tok(inc: Int, term: String) = Token(term, 0, 0, inc, "word")
    // testNoDups: B at different positions both survive
    val noDups = Vector(tok(1, "A"), tok(1, "B"), tok(1, "B"), tok(1, "C"),
      tok(0, "D"), tok(1, "E"))
    assert(terms(MiscFilters.removeDuplicates(noDups)) ==
      Seq("A", "B", "B", "C", "D", "E"))
    // testSimpleDups: overlapping duplicate B dropped
    val dups = Vector(tok(1, "A"), tok(1, "B"), tok(0, "B"), tok(1, "C"),
      tok(0, "D"), tok(1, "E"))
    assert(terms(MiscFilters.removeDuplicates(dups)) ==
      Seq("A", "B", "C", "D", "E"))
  }

  test("TurkishLowerCaseFilter (TestTurkishLowerCaseFilter vectors)") {
    def tlc(s: String) = MiscFilters.turkishLowerCase(s)
    // composed forms
    assert(tlc("İSTANBUL") == "istanbul")
    assert(tlc("İZMİR") == "izmir")
    assert(tlc("ISPARTA") == "ısparta")
    // decomposed I + combining dot above
    assert(tlc("İSTANBUL") == "istanbul")
    assert(tlc("İZMİR") == "izmir")
    // other NSMs ride along; the dot still composes through them
    assert(tlc("İ̖STANBUL") == "i̖stanbul")
    assert(tlc("I̖SPARTA") == "ı̖sparta")
    assert(tlc("İ") == "i")
    assert(tlc("") == "")
  }

  test("ScandinavianFoldingFilter (TestScandinavianFoldingFilter vectors)") {
    def f(s: String) = MiscFilters.scandinavianFold(s)
    assert(f("aeäaeeea") == "aaaeea")
    assert(f("aeäaeeeae") == "aaaeea")
    assert(f("aeaeeeae") == "aaeea")
    assert(f("bøen") == "boen")
    assert(f("åene") == "aene")
    assert(f("räksmörgås") == "raksmorgas")
    assert(f("ræksmørgås") == "raksmorgas")
    assert(f("ræksmörgaos") == "raksmorgas")
    assert(f("aA") == "a")
    assert(f("aO") == "a")
    assert(f("blåbærsyltetøj") == "blabarsyltetoj")
    assert(f("blaabaarsyltetoej") == "blabarsyltetoj")
    assert(f("raeksmoergaas") == "raksmorgas")
    assert(f("ab") == "ab")
    assert(f("ao") == "a")
    assert(f("aa") == "a")
    assert(f("oo") == "o")
    assert(f("AA") == "A")
    assert(f("Øre") == "Ore")
  }

  test("ScandinavianNormalizationFilter digraphs") {
    def n(s: String) = MiscFilters.scandinavianNormalize(s)
    assert(n("blåbærsyltetøj") == "blåbærsyltetøj")
    assert(n("blaabaersyltetoej") == "blåbærsyltetøj")
    assert(n("blåbärsyltetöj") == "blåbærsyltetøj")
    assert(n("raeksmoergaos") == "ræksmørgås")
    assert(n("AEskimo") == "Æskimo")
    assert(n("aoo") == "åo") // aa/ao collapse left to right
  }

  test("KeywordRepeatFilter + RemoveDuplicates = original and stem overlaid") {
    val in = ws("customers line")
    val r = MiscFilters.removeDuplicates(
      MiscFilters.keywordRepeat(in, graft.analysis.KStem.stem))
    assert(terms(r) == Seq("customers", "customer", "line"))
    assert(incs(r) == Seq(1, 0, 1)) // stem overlays; no-op stem deduped
  }

  test("CapitalizationFilter (TestCapitalizationFilter vectors)") {
    val keep = Set("and", "the", "it", "BIG")
    def cap(s: String, onlyFirst: Boolean = true, force: Boolean = true,
            okPrefix: Seq[String] = Nil, minLen: Int = 0) =
      MiscFilters.capitalize(s, onlyFirstWord = onlyFirst, keep = keep,
        forceFirstLetter = force, okPrefix = okPrefix, minWordLength = minLen)
    assert(cap("kiTTEN") == "Kitten")
    assert(cap("and") == "And") // keep word, but first letter forced
    assert(cap("AnD") == "And") // case-sensitive keep: not protected
    assert(cap("AnD", force = false) == "And")
    assert(cap("big") == "Big")
    assert(cap("BIG") == "BIG") // protected by keep
    assert(cap("Hello thEre my Name is Ryan") == "Hello there my name is ryan")
    assert("Hello thEre my Name is Ryan".split(' ')
      .map(w => cap(w, onlyFirst = false)).toSeq ==
      Seq("Hello", "There", "My", "Name", "Is", "Ryan"))
    assert("Hello thEre my Name is Ryan".split(' ')
      .map(w => cap(w, onlyFirst = false, minLen = 3)).toSeq ==
      Seq("Hello", "There", "my", "Name", "is", "Ryan"))
    assert(cap("McKinley") == "Mckinley")
    assert(cap("McKinley", okPrefix = Seq("McK")) == "McKinley")
    assert("1st 2nd third".split(' ')
      .map(w => cap(w, onlyFirst = false, force = false)).toSeq ==
      Seq("1st", "2nd", "Third"))
    assert(cap("the The the", onlyFirst = false) == "The The the")
  }

  test("HyphenatedWordsFilter (TestHyphenatedWordsFilter vectors)") {
    // whitespace tokenization of "ecologi-\r\ncal devel-\r\n\r\nop ..."
    val in = ws("ecologi- cal devel- op compre-\thensive-hands-on and ecologi- cal")
      .map(t => t.copy(term = t.term.replace("\t", ""))) // tab inside ws()
    val toks = Vector("ecologi-", "cal", "devel-", "op",
      "compre-", "hensive-hands-on", "and", "ecologi-", "cal")
      .map(w => graft.analysis.Token(w, 0, w.length, 1, "word"))
    assert(terms(MiscFilters.hyphenatedWords(toks)) ==
      Seq("ecological", "develop", "comprehensive-hands-on", "and", "ecological"))
    // trailing dangler keeps its hyphen
    val dangle = Vector(graft.analysis.Token("eco-", 0, 4, 1, "word"))
    assert(terms(MiscFilters.hyphenatedWords(dangle)) == Seq("eco-"))
    assert(in.nonEmpty)
  }

  test("GermanNormalizationFilter (TestGermanNormalizationFilter vectors)") {
    def g(s: String) = MiscFilters.germanNormalize(s)
    assert(g("Schaltflächen") == "Schaltflachen")
    assert(g("Schaltflaechen") == "Schaltflachen")
    assert(g("dauer") == "dauer") // 'ue' after a vowel is NOT folded
    assert(g("weißbier") == "weissbier")
    assert(g("") == "")
  }

  test("SerbianNormalizationFilter (TestSerbianNormalizationFilter vectors)") {
    def s(x: String) = MiscFilters.serbianNormalize(x)
    assert(s("абвгдђежзијклљмнњопрстћуфхцчџш") ==
      "abvgddjezzijklljmnnjoprstcufhccdzs")
    assert(s("abcčćddžđefghijklljmnnjoprsštuvzž") ==
      "abcccddzdjefghijklljmnnjoprsstuvzz")
    assert(s("") == "")
  }

  test("PersianCharFilter: ZWNJ becomes a space") {
    assert(MiscFilters.persianCharFilter("ab\u200Ccd") == "ab cd")
    assert(MiscFilters.persianCharFilter("plain") == "plain")
  }

  test("CJKWidthFilter (TestCJKWidthFilter vectors)") {
    def w(s: String) = MiscFilters.cjkWidth(s)
    assert(w("Ｔｅｓｔ") == "Test") // fullwidth ASCII
    assert(w("１２３４") == "1234")
    assert(w("ｶﾀｶﾅ") == "カタカナ") // halfwidth katakana
    assert(w("ｳﾞｨｯﾂ") == "ヴィッツ") // voice mark composes ウ -> ヴ
    assert(w("ﾊﾟﾅｿﾆｯｸ") == "パナソニック") // half-voiced ハ -> パ
    assert(w("plain") == "plain")
    assert(w("") == "")
    // reference CJKAnalyzer chain order: width fold before lowercase
    assert(Analyzer.analyzeCjk("ＴＥＳＴ ｶﾀｶﾅ").map(_.term) ==
      Seq("test", "カタカナ"))
  }

  test("IrishLowerCaseFilter + ga/ca elision article sets") {
    // TestIrishLowerCaseFilter vector: "nAthair tUISCE hARD"
    def ir(s: String) = MiscFilters.irishLowerCase(s)
    assert(ir("nAthair") == "n-athair")
    assert(ir("tUISCE") == "t-uisce")
    assert(ir("hARD") == "hard") // h- is handled by the HYPHENATIONS stop
    assert(ir("TUISCE") == "tuisce")
    assert(ir("nathair") == "nathair") // lowercase vowel: no eclipsis
    assert(MiscFilters.elision("d'Athair", MiscFilters.IrishArticles) == "Athair")
    assert(MiscFilters.elision("l'aigua", MiscFilters.CatalanArticles) == "aigua")
  }

  test("LimitTokenPositionFilter: position cap, stacked tokens survive (TestLimitTokenPositionFilter)") {
    def lp(toks: Vector[Token], max: Int) =
      MiscFilters.limitTokenPosition(toks, max).map(_.term)
    assert(lp(ws("1  2     3  4  5"), 2) == Seq("1", "2"))
    assert(lp(ws("1 2 3 4 5"), 2) == Seq("1", "2"))
    assert(lp(ws("1  "), 2) == Seq("1")) // below the limit
    assert(lp(ws("1  2  "), 2) == Seq("1", "2")) // exactly at the limit
    // testMaxPosition3WithSynonyms shape: posInc=0 tokens stacked at the
    // boundary position are kept; the next increment stops the stream
    val syn = Vector(Token("one", 0, 3, 1, "word"),
      Token("first", 0, 3, 0, "SYNONYM"), Token("alpha", 0, 3, 0, "SYNONYM"),
      Token("two", 4, 7, 1, "word"), Token("three", 8, 13, 1, "word"),
      Token("four", 14, 18, 1, "word"))
    assert(MiscFilters.limitTokenPosition(syn, 3).map(_.term) ==
      Seq("one", "first", "alpha", "two", "three"))
    assertThrows[IllegalArgumentException](MiscFilters.limitTokenPosition(syn, 0))
  }

  test("UpperCaseFilter: per-codepoint uppercase (TestUpperCaseFilter shape)") {
    assert(MiscFilters.upperCase("the quick fox") == "THE QUICK FOX")
    assert(MiscFilters.upperCase("déjà") == "DÉJÀ")
    // per-codepoint (CharacterUtils.toUpperCase): ß maps 1:1 (to itself —
    // its uppercase form "SS" needs a String-level map), not to SS
    assert(MiscFilters.upperCase("straße") == "STRAßE")
    // supplementary-plane codepoints round-trip
    assert(MiscFilters.upperCase("𐐨") == "𐐀") // DESERET
  }

  test("PatternKeywordMarkerFilter: whole-term match shields the stemmer (TestKeywordMarkerFilter)") {
    import java.util.regex.Pattern
    def run(p: String): Seq[String] =
      ws("The quIck browN LuceneFox Jumps").map(t =>
        MiscFilters.stemWithPatternKeyword(t.term, Pattern.compile(p),
          Analyzer.lowerCase))
    assert(run("[a-zA-Z]+[fF]ox") ==
      Seq("the", "quick", "brown", "LuceneFox", "jumps"))
    assert(run("[a-zA-Z]+[f]ox") ==
      Seq("the", "quick", "brown", "lucenefox", "jumps"))
  }

  test("CodepointCountFilter counts codepoints, not chars") {
    // "𝄞𝄞" is 2 codepoints / 4 chars
    val in = Vector(Token("𝄞𝄞", 0, 4, 1, "word"),
      Token("abc", 5, 8, 1, "word"))
    assert(terms(MiscFilters.codepointCountFilter(in, 1, 2)) == Seq("𝄞𝄞"))
    // char-based LengthFilter sees 4 and 3 chars -> both outside [1,2]
    assert(MiscFilters.lengthFilter(in, 1, 2).isEmpty)
  }
}
