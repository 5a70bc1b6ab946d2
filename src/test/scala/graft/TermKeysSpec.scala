package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.TermKeys

/** Driver-side TermKeys.of must agree bit-for-bit with the codegen'd
  * Column path the merge shuffle uses — a mismatch would make query
  * terms resolve to keys no block carries (silent empty results). */
class TermKeysSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val terms = Seq(
    "import", "spark", "println", "a", "", "path:src", "path:main",
    "rev:tropmi", "café", "日本語", "path:日本語", "x" * 300,
    "path:", "content", "path:path:")

  test("Scala TermKeys.of == Column TermKeys.column, bit for bit") {
    val viaColumn = terms.toDF("term")
      .select($"term", TermKeys.column($"term").as("key"))
      .as[(String, Long)].collect().toMap
    terms.foreach { t =>
      assert(viaColumn(t) == TermKeys.of(t), s"term '$t'")
    }
  }

  test("field bit separates path terms; keys are nonnegative") {
    terms.foreach { t =>
      val k = TermKeys.of(t)
      assert(k >= 0L, s"'$t' key must leave the sign bit clear")
      assert(TermKeys.isPath(k) == t.startsWith("path:"), s"'$t'")
    }
  }

  test("no collisions across a realistic vocabulary slice") {
    // all distinct terms of an 800-doc generated corpus must map to
    // distinct keys (the build aborts on collision; this asserts the
    // test corpora can actually build)
    val docs = graft.index.CorpusGen.generate(spark, 800)
    val vocab = docs.flatMap(d =>
        graft.analysis.Analyzer.analyze(d.content, Set.empty).map(_.term))
      .distinct().collect()
    assert(vocab.length > 100)
    assert(vocab.map(TermKeys.of).distinct.length == vocab.length)
  }
}
