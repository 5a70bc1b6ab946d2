package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityEval

/** QualityStats math hand-traced from the reference
  * (benchmark/quality/QualityStats.java:70-233): running precision,
  * extrapolated P@n, the rank<=5 MRR rule, AvP normalization by
  * maxGoodPoints, and the good-queries-only average. */
class QualityEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def run(rows: (String, Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("query_id", "rank", "doc_name")
  }
  private def judges(rows: (String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("query_id", "doc_name")
  }

  private def collectMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r).toMap

  test("per-query stats: precision walk, extrapolation, MRR, AvP") {
    // A: hits d1..d6, relevant {d1, d3, d9, d10} (2 of 4 retrieved)
    val r = run(
      (1 to 6).map(i => ("A", i.toLong, s"d$i")): _*)
    val j = judges(("A", "d1"), ("A", "d3"), ("A", "d9"), ("A", "d10"))
    val out = collectMap(QualityEval.evaluate(r, j))("A")
    assert(out.getAs[Double]("num_points") === 6.0)
    assert(out.getAs[Double]("num_good_points") === 2.0)
    assert(out.getAs[Double]("max_good_points") === 4.0)
    assert(out.getAs[Double]("recall") === 0.5)
    assert(out.getAs[Double]("mrr") === 1.0) // first relevant at rank 1
    // AvP = (p(1) + p(3)) / maxGood = (1 + 2/3) / 4
    assert(math.abs(out.getAs[Double]("avp") - (1.0 + 2.0 / 3.0) / 4.0) < 1e-12)
    assert(out.getAs[Double]("p_at_1") === 1.0)
    assert(out.getAs[Double]("p_at_5") === 0.4)
    // beyond numPoints: numPoints * p(numPoints) / n  (6 * (1/3) / n)
    assert(math.abs(out.getAs[Double]("p_at_10") - 0.2) < 1e-12)
    assert(math.abs(out.getAs[Double]("p_at_20") - 0.1) < 1e-12)
  }

  test("MRR only counts a first relevant hit at rank <= 5") {
    val r = run((1 to 6).map(i => ("D", i.toLong, s"d$i")): _*)
    val j = judges(("D", "d6"))
    val out = collectMap(QualityEval.evaluate(r, j))("D")
    assert(out.getAs[Double]("mrr") === 0.0)
    assert(out.getAs[Double]("recall") === 1.0)
    assert(math.abs(out.getAs[Double]("avp") - 1.0 / 6.0) < 1e-12)
    // boundary: first hit exactly at 5
    val r5 = run((1 to 5).map(i => ("E", i.toLong, s"d$i")): _*)
    val out5 = collectMap(QualityEval.evaluate(r5, judges(("E", "d5"))))("E")
    assert(out5.getAs[Double]("mrr") === 0.2)
  }

  test("zero-relevant-retrieved query and the good-queries-only average") {
    val r = run(
      ("A", 1L, "d1"), ("A", 2L, "d2"), // relevant {d1}: perfect first hit
      ("B", 1L, "x1"), ("B", 2L, "x2"), ("B", 3L, "x3")) // relevant {y}: nothing found
    val j = judges(("A", "d1"), ("B", "y"))
    val m = collectMap(QualityEval.evaluate(r, j))
    assert(m("B").getAs[Double]("num_good_points") === 0.0)
    assert(m("B").getAs[Double]("recall") === 0.0)
    assert(m("B").getAs[Double]("mrr") === 0.0)
    assert(m("B").getAs[Double]("avp") === 0.0)
    assert(m("B").getAs[Double]("p_at_1") === 0.0)
    // average over BOTH (both have judgments): element-wise mean
    assert(m("average").getAs[Double]("recall") === 0.5)
    assert(m("average").getAs[Double]("mrr") === 0.5)
    assert(m("average").getAs[Double]("num_points") === 2.5)
    assert(m("average").getAs[Double]("max_good_points") === 1.0)
    // p_at_5 averages the EXTRAPOLATED values: A: 2*(1/2)/5=0.2; B: 0
    assert(math.abs(m("average").getAs[Double]("p_at_5") - 0.1) < 1e-12)
  }

  test("a query with no judgments is excluded from the average") {
    val r = run(("A", 1L, "d1"), ("C", 1L, "c1"))
    val j = judges(("A", "d1"))
    val m = collectMap(QualityEval.evaluate(r, j))
    assert(m("C").getAs[Double]("max_good_points") === 0.0)
    assert(m("C").getAs[Double]("avp") === 0.0)
    assert(m("average").getAs[Double]("recall") === 1.0) // A only
    assert(m("average").getAs[Double]("mrr") === 1.0)
  }
}
