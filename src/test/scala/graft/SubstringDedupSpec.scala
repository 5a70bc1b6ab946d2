package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Substring-level dedup via winnowing (Dedup.substringPairs): the
  * SIGMOD-2003 guarantee — any shared token run of >= w+k-1 tokens
  * yields a shared selected fingerprint — drives the pairing. */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val run = "alpha beta gamma delta epsilon zeta eta theta"

  test("docs sharing a long run pair up; unrelated docs do not") {
    val docs = Seq(
      (1L, s"intro words here $run trailing tail"),
      (2L, s"totally different lead $run closing remarks"),
      (3L, "nothing in common with anything else at all whatsoever today")
    ).toDF("doc_id", "text")
    val pairs = Dedup.substringPairs(docs, k = 3, w = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val keys = pairs.map(p => (p._1, p._2))
    assert(keys.contains((1L, 2L)))
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
    val (_, _, shared, est) = pairs.find(p => p._1 == 1L && p._2 == 2L).get
    assert(shared >= 1 && est == shared + 2)
  }

  test("guarantee: any shared run of >= w+k-1 tokens produces a pair") {
    // w=4, k=3 -> runs of >= 6 tokens must be caught
    val shared6 = "one two three four five six"
    val docs = Seq(
      (10L, s"aa bb cc $shared6 dd ee"),
      (11L, s"xx yy $shared6 zz ww qq rr")
    ).toDF("doc_id", "text")
    val pairs = Dedup.substringPairs(docs, k = 3, w = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 10L && p._2 == 11L))
  }

  test("minShared filters weak-evidence pairs") {
    val docs = Seq(
      (1L, s"intro $run tail"),
      (2L, s"other $run close")
    ).toDF("doc_id", "text")
    val all = Dedup.substringPairs(docs, k = 3, w = 4).count()
    val none = Dedup.substringPairs(docs, k = 3, w = 4, minShared = 1000)
      .count()
    assert(all >= 1 && none == 0)
  }

  test("maxDf drops boilerplate fingerprints before pairing") {
    // the shared run appears in EVERY doc -> df = 4 > maxDf = 2 -> no pairs
    val docs = (1L to 4L).map(i => (i, s"doc $i has $run inside"))
      .toDF("doc_id", "text")
    assert(Dedup.substringPairs(docs, k = 3, w = 4, maxDf = 2).count() == 0)
    assert(Dedup.substringPairs(docs, k = 3, w = 4).count() == 6) // all pairs
  }

  test("default maxDf is finite: a hot fingerprint is dropped, the rest " +
    "of the pair multiset is unchanged") {
    // boiler appears in all 1001+2 docs (df > default 1000); runA only in
    // the two probe docs. Default must drop the boiler buckets but keep
    // the probe pair — identical to an explicit tight maxDf.
    val boiler = "common license header text block repeated verbatim"
    val runA = "unique payload tokens shared by exactly two documents here"
    val docs = ((1L to 1001L).map(i => (i, boiler)) ++
      Seq((2001L, s"x $runA y"), (2002L, s"z $runA w"))).toDF("doc_id", "text")
    val byDefault = Dedup.substringPairs(docs, k = 3, w = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    val explicit = Dedup.substringPairs(docs, k = 3, w = 4, maxDf = 500)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(byDefault.exists(p => p._1 == 2001L && p._2 == 2002L))
    assert(!byDefault.exists(p => p._1 <= 1001L || (p._2 <= 1001L)))
    assert(byDefault == explicit)
  }
}
