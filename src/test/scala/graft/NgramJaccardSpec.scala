package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Prefix-filtered exact n-gram Jaccard (Dedup.ngramJaccard): the
  * SSJoin/PPJoin candidate prune must be LOSSLESS — its output equals a
  * brute-force all-pairs Jaccard at every threshold, including corpora
  * with a corpus-hot shingle shared by every doc. */
class NgramJaccardSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def shingleSet(text: String, k: Int): Set[String] = {
    val toks = text.toLowerCase.split("[^\\p{L}\\p{N}]+")
      .filter(_.nonEmpty).toSeq
    toks.sliding(k).filter(_.size == k).map(_.mkString(" ")).toSet
  }

  private def brute(docs: Seq[(Long, String)], k: Int,
                    t: Double): Set[(Long, Long, Double)] = {
    val sets = docs.map { case (id, tx) => id -> shingleSet(tx, k) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= t
    } yield (a, b, j)).toSet
  }

  private val docs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog tonight",
    2L -> "the quick brown fox jumps over the lazy cat tonight",
    3L -> "the quick brown fox jumps over the lazy dog tonight",
    4L -> "a completely different sentence about spark shuffles here",
    5L -> "a completely different sentence about spark shuffle here",
    6L -> "the quick brown fox sat still",
    7L -> "lorem ipsum dolor sit amet consectetur adipiscing elit today")

  test("prefix-filtered output == brute force at several thresholds") {
    val df = docs.toDF("doc_id", "text")
    for (t <- Seq(0.1, 0.3, 0.5, 0.8, 1.0)) {
      val got = Dedup.ngramJaccard(df, 3, t)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          BigDecimal(r.getDouble(2)).setScale(9,
            BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
      val want = brute(docs, 3, t).map { case (a, b, j) =>
        (a, b, BigDecimal(j).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      assert(got == want, s"threshold $t")
    }
  }

  test("corpus-hot shingle stays lossless and out of the candidate join") {
    // every doc shares one hot shingle; only 1-2 are real near-dups
    val hot = (1L to 40L).map(i =>
      i -> s"common shared prefix token${i} alpha${i} beta${i} gamma${i}") ++
      Seq(100L -> "common shared prefix near dup text one two three",
        101L -> "common shared prefix near dup text one two four")
    val df = hot.toDF("doc_id", "text")
    val got = Dedup.ngramJaccard(df, 3, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val want = brute(hot, 3, 0.5).map { case (a, b, _) => (a, b) }
    assert(got == want)
    assert(got.contains((100L, 101L)))
  }
}
