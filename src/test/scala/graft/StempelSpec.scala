package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Stempel

/** Stempel Polish stemming against the reference's published behavior
  * (stempel/src/test/.../pl/TestPolishAnalyzer.java:37-49 vectors; the
  * table is the module's own stemmer_20000.tbl). */
class StempelSpec extends AnyFunSuite {

  test("TestPolishAnalyzer vectors") {
    assert(Stempel.filter("studenta") === "student")
    assert(Stempel.filter("studenci") === "student")
  }

  test("inflection families collapse to one stem") {
    // patch-command stemming maps case forms together (the module's
    // documented purpose); same-family forms must agree
    assert(Stempel.filter("studentami") === Stempel.filter("studenta"))
    assert(Stempel.filter("książki") === Stempel.filter("książka"))
  }

  test("minLength contract: words of length <= 3 pass unchanged") {
    for (w <- Seq("int", "def", "val", "to", "a"))
      assert(Stempel.filter(w) === w)
  }

  test("diffApply replays patch commands from the word end") {
    // '-a' = skip 1; 'Rx' = replace with x; 'Da' = delete 1; 'Ix' = insert
    val sb = new StringBuilder("abcde")
    Stempel.diffApply(sb, "Da") // delete last char
    assert(sb.toString === "abcd")
    val sb2 = new StringBuilder("abcde")
    Stempel.diffApply(sb2, "Rz") // replace last char
    assert(sb2.toString === "abcdz")
    val sb3 = new StringBuilder("abcde")
    Stempel.diffApply(sb3, "-aRz") // skip one, replace next
    assert(sb3.toString === "abcze")
  }

  test("pl stop set loads and filters") {
    assert(graft.analysis.StopSets.forLang("pl").contains("był"))
  }
}
