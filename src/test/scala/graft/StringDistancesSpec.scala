package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search.StringDistances._

/** Golden vectors from the reference spell tests:
  * TestLevenshteinDistance.java, TestJaroWinklerDistance.java,
  * TestNGramDistance.java (n=1/2/3), LuceneLevenshteinDistance semantics. */
class StringDistancesSpec extends AnyFunSuite {

  private def approx(got: Float, want: Double, eps: Double = 0.001): Unit =
    assert(math.abs(got - want) < eps, s"got $got want $want")

  test("LevensteinDistance (TestLevenshteinDistance)") {
    approx(levenshtein("al", "al"), 1.0)
    approx(levenshtein("martha", "marhta"), 0.6666)
    approx(levenshtein("jones", "johnson"), 0.4285)
    approx(levenshtein("abcvwxyz", "cabvwxyz"), 0.75)
    approx(levenshtein("dwayne", "duane"), 0.666)
    approx(levenshtein("dixon", "dicksonx"), 0.5)
    approx(levenshtein("six", "ten"), 0.0)
  }

  test("JaroWinklerDistance (TestJaroWinklerDistance, reference quirks)") {
    assert(jaroWinkler("al", "al") === 1.0f)
    val martha = jaroWinkler("martha", "marhta")
    assert(martha > 0.961f && martha < 0.962f)
    val jones = jaroWinkler("jones", "johnson")
    assert(jones > 0.832f && jones < 0.833f)
    val abc = jaroWinkler("abcvwxyz", "cabvwxyz")
    assert(abc > 0.958f && abc < 0.959f)
    val dwayne = jaroWinkler("dwayne", "duane")
    assert(dwayne > 0.84f && dwayne < 0.841f)
    val dixon = jaroWinkler("dixon", "dicksonx")
    assert(dixon > 0.813f && dixon < 0.814f)
    assert(jaroWinkler("fvie", "ten") === 0f)
    assert(jaroWinkler("zac ephron", "zac efron") >
      jaroWinkler("zac ephron", "kai ephron"))
    assert(jaroWinkler("brittney spears", "britney spears") >
      jaroWinkler("brittney spears", "brittney startzman"))
  }

  test("NGramDistance n=1 (TestNGramDistance.testGetDistance1)") {
    approx(ngram("al", "al", 1), 1.0)
    approx(ngram("a", "a", 1), 1.0)
    approx(ngram("b", "a", 1), 0.0)
    approx(ngram("martha", "marhta", 1), 0.6666)
    approx(ngram("jones", "johnson", 1), 0.4285)
    approx(ngram("natural", "contrary", 1), 0.25)
    approx(ngram("abcvwxyz", "cabvwxyz", 1), 0.75)
    approx(ngram("dwayne", "duane", 1), 0.666)
    approx(ngram("dixon", "dicksonx", 1), 0.5)
    approx(ngram("six", "ten", 1), 0.0)
    approx(ngram("zac ephron", "zac efron", 1), ngram("zac ephron", "kai ephron", 1))
  }

  test("NGramDistance n=2 (testGetDistance2)") {
    approx(ngram("al", "al"), 1.0)
    approx(ngram("a", "a"), 1.0)
    approx(ngram("b", "a"), 0.0)
    approx(ngram("a", "aa"), 0.5)
    approx(ngram("martha", "marhta"), 0.6666)
    approx(ngram("jones", "johnson"), 0.4285)
    approx(ngram("natural", "contrary"), 0.25)
    approx(ngram("abcvwxyz", "cabvwxyz"), 0.625)
    approx(ngram("dwayne", "duane"), 0.5833)
    approx(ngram("dixon", "dicksonx"), 0.5)
    approx(ngram("six", "ten"), 0.0)
  }

  test("LuceneLevenshteinDistance: transposition costs 1, normalized by min length") {
    // martha->marhta: one transposition => d=1, 1 - 1/6
    approx(luceneLevenshtein("martha", "marhta"), 1.0 - 1.0 / 6)
    // plain levenshtein would be 2 edits; the reference's internal
    // distance counts the swap once
    approx(levenshtein("martha", "marhta"), 1.0 - 2.0 / 6)
    approx(luceneLevenshtein("al", "al"), 1.0)
    // dixon->dicksonx: 4 edits (sub + 3 inserts), min len 5
    approx(luceneLevenshtein("dixon", "dicksonx"), 1.0 - 4.0 / 5)
    approx(luceneLevenshtein("ab", "ba"), 1.0 - 1.0 / 2)
  }
}
