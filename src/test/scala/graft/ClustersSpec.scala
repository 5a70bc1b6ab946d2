package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Connected components over near-dup pairs (Dedup.clusters): the
  * min-label propagation fixed point must equal brute-force union-find,
  * including long chains (rounds = diameter, not 1). */
class ClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def bruteCc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("min-label propagation == brute-force union-find") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (22L, 20L), (30L, 31L), (3L, 7L))
    val got = Dedup.clusters(pairs.toDF("a", "b"))
      .as[(Long, Long)].collect()
      .map { case (c, m) => m -> c }.toMap
    assert(got == bruteCc(pairs))
  }

  test("a 12-hop chain converges to one cluster") {
    val pairs = (0L until 12L).map(i => (i, i + 1))
    val got = Dedup.clusters(pairs.toDF("a", "b"))
      .as[(Long, Long)].collect()
    assert(got.length == 13 && got.forall(_._1 == 0L))
  }
}
