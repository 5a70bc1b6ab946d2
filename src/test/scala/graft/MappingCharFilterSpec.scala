package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.CharMaps

/** Golden vectors from the reference test
  * charfilter/TestMappingCharFilter.java:45-200 (the setUp() map and the
  * per-case token/offset assertions; offsets are whitespace-tokenizer
  * offsets run through CharFilter.correctOffset).
  */
class MappingCharFilterSpec extends AnyFunSuite {

  // TestMappingCharFilter.setUp map (fclef is U+1D122, a surrogate pair).
  private val fclef = new String(Character.toChars(0x1D122))
  private val map = CharMaps.NormMap(
    "aa" -> "a", "bbb" -> "b", "cccc" -> "cc",
    "h" -> "i", "j" -> "jj", "k" -> "kkk", "ll" -> "llll",
    "empty" -> "",
    fclef -> "fclef",
    "！" -> "full-width-exclamation")

  /** Whitespace-tokenize the filtered output and return
    * (term, correctedStart, correctedEnd) triples plus the corrected
    * final offset, like assertTokenStreamContents. */
  private def run(text: String): (List[(String, Int, Int)], Int) = {
    val (out, correct) = CharMaps.mappingCharFilter(text, map)
    val toks = List.newBuilder[(String, Int, Int)]
    var i = 0
    while (i < out.length) {
      while (i < out.length && out(i) == ' ') i += 1
      if (i < out.length) {
        val st = i
        while (i < out.length && out(i) != ' ') i += 1
        toks += ((out.substring(st, i), correct(st), correct(i)))
      }
    }
    (toks.result(), correct(out.length))
  }

  test("nothing changes") { assert(run("x") === (List(("x", 0, 1)), 1)) }

  test("1to1") { assert(run("h") === (List(("i", 0, 1)), 1)) }
  test("1to2") { assert(run("j") === (List(("jj", 0, 1)), 1)) }
  test("1to3") { assert(run("k") === (List(("kkk", 0, 1)), 1)) }
  test("2to4") { assert(run("ll") === (List(("llll", 0, 2)), 2)) }
  test("2to1") { assert(run("aa") === (List(("a", 0, 2)), 2)) }
  test("3to1") { assert(run("bbb") === (List(("b", 0, 3)), 3)) }
  test("4to2") { assert(run("cccc") === (List(("cc", 0, 4)), 4)) }
  test("5to0") { assert(run("empty") === (List.empty, 5)) }

  test("non-BMP surrogate-pair key") {
    assert(run(fclef) === (List(("fclef", 0, 2)), 2))
  }

  test("full-width char") {
    assert(run("！") === (List(("full-width-exclamation", 0, 1)), 1))
  }

  test("token stream (TestMappingCharFilter.testTokenStream)") {
    val text = "h i j k ll cccc bbb aa"
    assert(run(text) === (List(
      ("i", 0, 1), ("i", 2, 3), ("jj", 4, 5), ("kkk", 6, 7),
      ("llll", 8, 10), ("cc", 11, 15), ("b", 16, 19), ("a", 20, 22)),
      text.length))
  }

  test("chained filters (testChained)") {
    val text = "aaaa ll h"
    val (out1, c1) = CharMaps.mappingCharFilter(text, map)
    val (out2, c2) = CharMaps.mappingCharFilter(out1, map)
    assert(out2 === "a llllllll i")
    // Chained correction composes: out2 offset -> out1 offset -> input.
    def cc(i: Int) = c1(c2(i))
    val toks = List.newBuilder[(String, Int, Int)]
    var i = 0
    while (i < out2.length) {
      while (i < out2.length && out2(i) == ' ') i += 1
      if (i < out2.length) {
        val st = i
        while (i < out2.length && out2(i) != ' ') i += 1
        toks += ((out2.substring(st, i), cc(st), cc(i)))
      }
    }
    assert(toks.result() === List(("a", 0, 4), ("llllllll", 5, 7), ("i", 8, 9)))
    assert(cc(out2.length) === text.length)
  }

  test("greedy longest match wins over shorter prefix") {
    // 'aa' beats 'a'-less map; 'aaa' -> match aa at 0, lone a at 2.
    assert(CharMaps.mappingCharFilter("aaa", map)._1 === "aa")
    // 'bb' has no match ('bbb' dead-ends at input end), emits verbatim.
    assert(CharMaps.mappingCharFilter("bb", map)._1 === "bb")
    assert(CharMaps.mappingCharFilter("bbbb", map)._1 === "bb")
  }

  test("replacement is not rescanned") {
    // h->i, but the emitted 'i' never re-enters matching even though a
    // rule for 'i' exists in this map.
    val m = CharMaps.NormMap("h" -> "i", "i" -> "x")
    assert(CharMaps.mappingCharFilter("hi", m)._1 === "ix")
  }

  test("builder rejects empty and duplicate matches") {
    intercept[IllegalArgumentException](CharMaps.NormMap("" -> "x"))
    intercept[IllegalArgumentException](CharMaps.NormMap("a" -> "x", "a" -> "y"))
  }
}
