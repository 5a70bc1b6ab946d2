package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Deterministic domain mixing: the output class mixture matches the
  * target weights (to hash granularity), selection is stable, only
  * downsampling ever happens, and unweighted classes drop. */
class MixDomainsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def corpus() = {
    import spark.implicits._
    // class sizes deliberately far from the target mix
    val rows =
      (1 to 8000).map(i => (i.toLong, "a")) ++
        (1 to 1000).map(i => (10000L + i, "b")) ++
        (1 to 3000).map(i => (20000L + i, "c")) ++
        (1 to 500).map(i => (30000L + i, "junk"))
    rows.toDF("doc_id", "source")
  }

  test("output mixture matches weights; only downsampling; junk dropped") {
    val out = TextAnalysis.mixDomains(corpus(),
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25), classCol = "source")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("junk"))
    // b is the binding class: T = min(8000/.5, 1000/.25, 3000/.25) = 4000
    // -> targets a=2000, b=1000 (kept whole), c=1000
    assert(out("b") === 1000L) // ppm = 1e6 exactly -> every row kept
    // hash granularity: within ~5% of target
    assert(math.abs(out("a") - 2000L) < 100, s"a=${out("a")}")
    assert(math.abs(out("c") - 1000L) < 60, s"c=${out("c")}")
    // never upsample
    assert(out.values.sum <= 12500)
  }

  test("selection is deterministic and subset-stable") {
    val w = Map("a" -> 0.5, "b" -> 0.5)
    val ids1 = TextAnalysis.mixDomains(corpus(), w, classCol = "source")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = TextAnalysis.mixDomains(corpus(), w, classCol = "source")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    // a kept subset is drawn by the same hash rule as sampleStratified:
    // every kept id satisfies the ppm predicate for its class
    assert(ids1.nonEmpty)
  }
}
