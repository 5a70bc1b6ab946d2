package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SuggestLookups
import graft.operators.SuggestLookups.Result

/** TSTLookup / JaspellLookup semantics (reference suggest/tst/
  * TSTLookup.java + TSTAutocomplete.java, suggest/jaspell/
  * JaspellLookup.java) and the dictionary-source parse rules
  * (FileDictionary, HighFrequencyDictionary, DocumentDictionary).
  */
class SuggestLookupsSpec extends AnyFunSuite {

  // the reference PersistenceTest key set
  private val keys = Seq("one", "two", "three", "four", "oneness",
    "onerous", "onesimus", "twofold", "twonk", "thrive", "through",
    "threat", "foundation", "fourier", "fourty")
  private val dictLocal: Seq[(String, Long)] =
    keys.sorted.zipWithIndex.map { case (k, i) => (k, (i * 7 + 3).toLong) }

  test("medianOrder range restriction equals the filtered full order") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(50)
      val a = rnd.nextInt(n)
      val b = a + rnd.nextInt(n - a + 1)
      val full = SuggestLookups.medianOrder(n.toLong, 0L, n.toLong)
      assert(SuggestLookups.medianOrder(n.toLong, a.toLong, b.toLong) ===
        full.filter(r => r >= a && r < b))
    }
  }

  test("medianOrder is median-first (balancedTree order)") {
    // 0..6 -> mid 3, left half (0..2 -> 1,0,2), right half (4..6 -> 5,4,6)
    assert(SuggestLookups.medianOrder(7, 0, 7) === Seq(3L, 1L, 0L, 2L, 5L, 4L, 6L))
  }

  test("TST popular mode returns descending weights, plain mode a prefix-set subset") {
    val pop = SuggestLookups.tstLookupLocal(dictLocal, "t", 10, onlyMorePopular = true)
    assert(pop.nonEmpty)
    assert(pop.map(_.weight) === pop.map(_.weight).sorted(Ordering[Long].reverse))
    assert(pop.forall(_.key.startsWith("t")))
    val expect = dictLocal.filter(_._1.startsWith("t")).sortBy(-_._2).take(10)
    assert(pop.map(r => (r.key, r.weight)) === expect)

    val plain = SuggestLookups.tstLookupLocal(dictLocal, "t", 3, onlyMorePopular = false)
    assert(plain.length === 3)
    assert(plain.forall(r => dictLocal.contains((r.key, r.weight))))
  }

  test("TST traversal yields every prefix match exactly once (incl. prefix-equal key)") {
    for (p <- Seq("one", "t", "four", "thr", "o")) {
      val got = SuggestLookups.tstLookupLocal(dictLocal, p, 100, onlyMorePopular = false)
      assert(got.map(_.key).sorted === dictLocal.map(_._1).filter(_.startsWith(p)).sorted,
        s"prefix $p")
      assert(got.map(_.key).distinct.length === got.length)
    }
  }

  test("distributed tstLookup replays the full-tree answer on the bounded slice") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 8) {
      val n = 30 + rnd.nextInt(200)
      val words = (0 until n).map(_ =>
        (1 + rnd.nextInt(6) to 0 by -1).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
        .distinct.sorted
      val dictL = words.zipWithIndex.map { case (w, i) => (w, (i * 13 + 1).toLong) }
      val df = dictL.toDF("term", "weight")
      for (prefix <- Seq("a", "ab", "b", "cd")) {
        for (pop <- Seq(true, false)) {
          val dist = SuggestLookups.tstLookup(df, prefix, 5, onlyMorePopular = pop)
          val loc = SuggestLookups.tstLookupLocal(dictL, prefix, 5, onlyMorePopular = pop)
          assert(dist === loc, s"trial $trial prefix $prefix pop $pop")
        }
      }
    }
  }

  test("LookupPQ rejects equal-weight inserts at capacity (earlier survives)") {
    val pq = new SuggestLookups.LookupPQ(2)
    pq.insertWithOverflow(Result("a", 5))
    pq.insertWithOverflow(Result("b", 5))
    pq.insertWithOverflow(Result("c", 5)) // equal weight at capacity -> rejected
    assert(pq.results().map(_.key).toSet === Set("a", "b"))
    val pq2 = new SuggestLookups.LookupPQ(2)
    Seq(("a", 1L), ("b", 9L), ("c", 4L), ("d", 7L)).foreach { case (k, w) =>
      pq2.insertWithOverflow(Result(k, w))
    }
    assert(pq2.results().map(_.key) === Seq("b", "d"))
  }

  test("Jaspell plain mode: first num matches lexicographically") {
    val got = SuggestLookups.jaspellLookupLocal(dictLocal, "t", 3, onlyMorePopular = false)
    assert(got.map(_.key) === Seq("threat", "three", "thrive"))
  }

  test("Jaspell popular mode ranks only the num*2 lexicographic head") {
    // dict where the heaviest 't' key sorts LAST alphabetically
    val d = Seq(("ta", 1L), ("tb", 2L), ("tc", 3L), ("td", 4L), ("tz", 99L))
    // num=2 -> candidates = first 4 lexicographic (ta..td); tz invisible
    val got = SuggestLookups.jaspellLookupLocal(d, "t", 2, onlyMorePopular = true)
    assert(got.map(_.key) === Seq("td", "tc"))
  }

  test("fileDictionary: field-count cases and weight fallbacks") {
    val rows = SuggestLookups.fileDictionary(Seq(
      "foo\t34", "bar\t12.7\tBAR", "turbo", "spartan\t5000000000", "spark\t9e2"))
    assert(rows === Seq(
      ("foo", 34L, None), ("bar", 12L, None), ("turbo", 1L, None),
      ("spartan", 5000000000L, None), ("spark", 900L, None)))
    assertThrows[IllegalArgumentException] {
      SuggestLookups.fileDictionary(Seq("a\tb\tc\td"))
    }
  }

  test("fileDictionary: first line decides payload presence") {
    // first line HAS a payload -> later short lines emit EMPTY payloads
    val withPay = SuggestLookups.fileDictionary(Seq(
      "a\t1\tPAY-A", "b\t2", "c"))
    assert(withPay === Seq(
      ("a", 1L, Some("PAY-A")), ("b", 2L, Some("")), ("c", 1L, Some(""))))
    // first line has NO payload -> later payloads are dropped
    val noPay = SuggestLookups.fileDictionary(Seq("a\t1", "b\t2\tPAY-B"))
    assert(noPay === Seq(("a", 1L, None), ("b", 2L, None)))
  }

  test("highFrequency threshold truncates like the reference (int cast)") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val stats = Seq(("alpha", 9L), ("beta", 10L), ("gamma", 11L))
      .toDF("term", "df")
    // thresh 0.1 * 105 docs = 10.5 -> (int) 10: beta (10) kept, alpha (9) dropped
    val hf = SuggestLookups.highFrequency(stats, 105L, 0.1f)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(hf === Set(("beta", 10L), ("gamma", 11L)))
  }

  test("fstCompletion: bucket discretization with equal-weight run inheritance") {
    val spark = SparkSuite.spark
    import spark.implicits._
    // 10 entries, weights 1,1,1,1,2,2,3,4,5,6 -> runs start at lines
    // 0,4,6,7,8,9 -> buckets (x*10/10): 0,4,6,7,8,9
    val dict = Seq(("aa", 1L), ("ab", 1L), ("ac", 1L), ("ad", 1L),
      ("ae", 2L), ("af", 2L), ("ag", 3L), ("ah", 4L), ("ai", 5L),
      ("aj", 6L)).toDF("term", "weight")
    val res = SuggestLookups.fstCompletion(dict, "a", 10,
      buckets = 10, exactFirst = false, popular = true)
    // popular: bucket desc, term asc; value IS the bucket
    assert(res.map(r => (r.key, r.weight)) === Seq(
      ("aj", 9L), ("ai", 8L), ("ah", 7L), ("ag", 6L),
      ("ae", 4L), ("af", 4L),
      ("aa", 0L), ("ab", 0L), ("ac", 0L), ("ad", 0L)))
    // alphabetical mode re-sorts by key, buckets kept
    val alpha = SuggestLookups.fstCompletion(dict, "a", 4,
      buckets = 10, exactFirst = true, popular = false)
    assert(alpha.map(_.key) === Seq("aa", "ab", "ac", "ad"))
  }

  test("fstCompletion: exactMatchFirst promotes the exact key") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val dict = Seq(("spar", 9L), ("spark", 1L), ("sparkle", 8L),
      ("sparse", 7L), ("spartan", 6L), ("sparrow", 5L))
      .toDF("term", "weight")
    // 'spark' has the LOWEST weight; without exactFirst it ranks last
    val plain = SuggestLookups.fstCompletion(dict, "spark", 2,
      buckets = 10, exactFirst = false, popular = true)
    assert(!plain.headOption.exists(_.key == "spark"))
    // exactFirst fetches it from outside the top-2 and prepends
    val ex = SuggestLookups.fstCompletion(dict, "spark", 2,
      buckets = 10, exactFirst = true, popular = true)
    assert(ex.head.key === "spark")
    assert(ex.length === 2)
  }

  test("documentDictionary skips null fields and payload-missing docs") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val docs = Seq(
      (Some("s1"), Some(10L), Some("p1")),
      (None: Option[String], Some(5L), Some("p2")), // null field -> skipped
      (Some("s3"), None: Option[Long], Some("p3")), // null weight -> 0
      (Some("s4"), Some(7L), None: Option[String])  // null payload
    ).toDF("source", "n_chars", "pay")
    val plain = SuggestLookups.documentDictionary(docs, "source", Some("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(plain === Set(("s1", 10L), ("s3", 0L), ("s4", 7L)))
    val withPay = SuggestLookups
      .documentDictionary(docs, "source", Some("n_chars"), Some("pay"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(withPay === Set(("s1", 10L, "p1"), ("s3", 0L, "p3")))
  }
}
