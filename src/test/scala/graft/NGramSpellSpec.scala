package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search.{NGramSpell, StringDistances}
import graft.search.NGramSpell._

/** Classic n-gram SpellChecker vectors from the reference's own suite
  * (suggest/spell/TestSpellChecker.java:58-300) on the reference's own
  * corpus: English.intToEnglish(0..999) in field1, (1..1000) in field2,
  * "fvei"/"fvei five" in field3, plus the extra eight/twenty-one/twenty
  * docs (TestSpellChecker.java:60-90), whitespace-tokenized like
  * MockAnalyzer. */
class NGramSpellSpec extends AnyFunSuite {

  // ---- English.intToEnglish port (test-framework util/English.java) ----
  private val unitsW = Array("", "one ", "two ", "three ", "four ", "five ",
    "six ", "seven ", "eight ", "nine ", "ten ", "eleven ", "twelve ",
    "thirteen ", "fourteen ", "fifteen ", "sixteen ", "seventeen ",
    "eighteen ", "nineteen ")
  private val tensW = Array("", "", "twenty", "thirty", "forty", "fifty",
    "sixty", "seventy", "eighty", "ninety")
  private def toEnglish(i0: Int, r: StringBuilder): Unit = {
    var i = i0
    if (i >= 1000) { toEnglish(i / 1000, r); r.append("thousand, "); i %= 1000 }
    if (i >= 100) { toEnglish(i / 100, r); r.append("hundred "); i %= 100 }
    if (i >= 20) {
      r.append(tensW(i / 10)); i %= 10
      if (i == 0) r.append(" ") else r.append("-")
    }
    r.append(unitsW(i))
  }
  private def intToEnglish(i: Int): String =
    if (i == 0) "zero" else { val r = new StringBuilder; toEnglish(i, r); r.toString }

  private def toks(doc: String): Seq[String] =
    doc.split("\\s+").filter(_.nonEmpty).toSeq

  private val field1Docs: Seq[String] =
    (0 until 1000).map(intToEnglish) ++
      Seq("eight", "twenty-one twenty-one", "twenty")
  private val field2Docs: Seq[String] = (0 until 1000).map(i => intToEnglish(i + 1))
  private val field3Docs: Seq[String] =
    (0 until 1000).map(i => "fvei" + (if (i % 2 == 0) " five" else ""))

  private def dfOf(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(d => toks(d).distinct).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }

  private val df1 = dfOf(field1Docs)
  private val df2 = dfOf(field2Docs)
  private val df3 = dfOf(field3Docs)

  private def dictOf(ms: Map[String, Long]*): Seq[(String, Long)] =
    ms.flatMap(_.keys).distinct.sorted.map(w => (w, 0L))

  private val dict12 = dictOf(df1, df2) // testBuild: field1 then field2
  private val dict1 = dictOf(df1)
  private val dict3 = dictOf(df3)

  private def strings(out: Seq[SuggestWord]) = out.map(_.string).toList

  // ---- sanity on the replicated corpus ----
  test("corpus dfs match the reference's comments") {
    assert(df1("eighty") === 10L)
    assert(df1("eight") === 110L) // 10 + the 800s + the extra doc
    assert(df1("twenty") === 11L)
    assert(df1("twenty-one") === 11L)
    assert(df3("fvei") === 1000L)
    assert(df3("five") === 500L)
    assert(df2.contains("thousand,")) // the trailing-comma quirk is real
    assert(!df1.contains("thousand,"))
  }

  // ---- band + clause construction (SpellChecker.java:340-361,548-566) ----
  test("length bands and duplicate clauses") {
    assert((getMin(4), getMax(4)) === (1, 2))
    assert((getMin(5), getMax(5)) === (2, 3))
    assert((getMin(6), getMax(6)) === (3, 4))
    val cl = queryClauses("aaaa") // grams1 x4 (dups kept) + grams2 x3 + start/end per band
    assert(cl.count(c => c._1 == "gram1" && c._2 == "a") === 4)
    assert(cl.count(c => c._1 == "gram2" && c._2 == "aa") === 3)
    assert(cl.count(_._1 == "start1") === 1)
    assert(cl.filter(_._1.startsWith("start")).forall(_._3 === 2.0f))
    assert(cl.filter(_._1.startsWith("end")).forall(_._3 === 1.0f))
  }

  test("candidate TFIDF value: coord, dup freq, start boost") {
    val clauses = queryClauses("fvie")
    val idf = Map.empty[(String, String), Float] // idf defaults to 1
    // five matches all 4 gram1 letters; ten matches only 'e'.
    val vFive = candidateValue(indexEntries("five"), clauses, idf)
    val vTen = candidateValue(indexEntries("ten"), clauses, idf)
    assert(vFive > vTen)
    // a word starting with the query's start gram gets the 2.0 boost
    val vF = candidateValue(indexEntries("four"), clauses, idf) // starts with f
    val vNoStart = candidateValue(indexEntries("vie"), clauses, idf)
    assert(vF > 0 && vNoStart > 0)
    // no shared gram at the right band -> not a hit at all
    assert(candidateValue(indexEntries("seventy"), clauses, idf) === Float.MinValue)
  }

  // ---- checkCommonSuggestions + checkLevenshteinSuggestions ----
  test("Levenshtein suggestions (TestSpellChecker common vectors)") {
    assert(strings(suggestLocal(dict12, "fvie", 2)) === List("five"))
    val self = suggestLocal(dict12, "five", 2)
    assert(self.nonEmpty && self.head.string != "five")
    assert(strings(self) === List("nine"))
    assert(strings(suggestLocal(dict12, "fiv", 2)) === List("five"))
    assert(strings(suggestLocal(dict12, "fives", 2)) === List("five"))
    assert(strings(suggestLocal(dict12, "ive", 2)) === List("five", "nine"))
    assert(strings(suggestLocal(dict12, "fie", 2)) === List("five", "nine"))
    assert(strings(suggestLocal(dict12, "fi", 2)) === List("five"))
    assert(strings(suggestLocal(dict12, "onety", 2)) === List("ninety", "one"))
  }

  test("JaroWinkler suggestions at accuracy 0.8") {
    def jw(a: String, b: String) = StringDistances.jaroWinkler(a, b)
    assert(strings(suggestLocal(dict12, "onety", 2, accuracy = 0.8f,
      distance = jw)) === List("one", "ninety"))
    // best score for fvie is ~0.925: empty at 0.93, one hit at 0.92
    assert(suggestLocal(dict12, "fvie", 2, accuracy = 0.93f, distance = jw).isEmpty)
    assert(suggestLocal(dict12, "fvie", 2, accuracy = 0.92f, distance = jw).size === 1)
    assert(strings(suggestLocal(dict12, "fiv", 2, accuracy = 0.8f,
      distance = jw)).head === "five")
  }

  test("NGramDistance(2) suggestions") {
    def ng(a: String, b: String) = StringDistances.ngram(a, b, 2)
    assert(strings(suggestLocal(dict12, "onety", 2, distance = ng)) ===
      List("one", "ninety"))
  }

  // ---- testSuggestModes (field1 dictionary + field1 user df) ----
  test("suggest modes (TestSpellChecker.testSuggestModes)") {
    def run(w: String, n: Int, m: Mode) =
      strings(suggestLocal(dict1, w, n, mode = m,
        restrictToUserField = true, userField = df1))
    assert(run("eighty", 2, WhenNotInIndex) === List("eighty"))
    assert(run("eight", 2, WhenNotInIndex) === List("eight"))
    val pop = run("eighty", 5, MorePopular)
    assert(pop.size === 5 && pop.head === "eight")
    assert(run("twenty", 5, MorePopular) === List("twenty-one"))
    assert(run("eight", 5, MorePopular) === List.empty)
    val alw1 = strings(suggestLocal(dict1, "eighty", 5))
    assert(alw1.size === 5 && alw1.head === "eight")
    val alw2 = strings(suggestLocal(dict1, "eight", 5))
    assert(alw2.size === 5 && alw2.head === "eighty")
  }

  // ---- testComparator: frequency comparator on score ties ----
  test("frequency comparator breaks the fvei/five score tie by freq") {
    val out = suggestLocal(dict3, "fvie", 2, mode = WhenNotInIndex,
      restrictToUserField = true, userField = df3, byFrequency = true)
    assert(strings(out) === List("fvei", "five"))
    assert(out.map(_.freq) === Seq(1000L, 500L))
  }

  // ---- field-restricted tousand (testBuild tail) ----
  test("field restriction gates words absent from the user field") {
    def run(m: Map[String, Long]) =
      strings(suggestLocal(dict12, "tousand", 10, mode = WhenNotInIndex,
        restrictToUserField = true, userField = m))
    assert(run(df1) === List.empty) // thousand, only occurs in field2
    assert(run(df2) === List("thousand,"))
  }

  // ---- distributed path parity ----
  test("Spark suggest() matches suggestLocal") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val dict = dict1.map { case (w, _) => (w, df1(w)) }.toDS()
    def local(w: String, n: Int, m: Mode, restrict: Boolean) =
      suggestLocal(dict1, w, n, mode = m, restrictToUserField = restrict,
        userField = df1)
    assert(NGramSpell.suggest(spark, dict, "eighty", 5) ===
      local("eighty", 5, Always, restrict = false))
    assert(NGramSpell.suggest(spark, dict, "eighty", 5, MorePopular,
      restrictToUserField = true) ===
      local("eighty", 5, MorePopular, restrict = true))
    assert(NGramSpell.suggest(spark, dict, "twenty", 5, MorePopular,
      restrictToUserField = true) ===
      local("twenty", 5, MorePopular, restrict = true))
  }
}
