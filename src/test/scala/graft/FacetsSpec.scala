package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Facets
import graft.operators.Facets.DrillDown

/** The reference's TestDrillSideways.testBasic corpus (5 docs, Author +
  * hierarchical Publish Date) and TestTaxonomyFacetCounts.testBasic,
  * re-checked value-for-value (tie order here is label asc, documented
  * deviation from taxonomy-ordinal order). */
final case class Assoc(path: String, value: Double)

class FacetsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  // TestDrillSideways.java:87-110
  private lazy val docs = Seq(
    ("Bob", "2010", "10", "15"),
    ("Lisa", "2010", "10", "20"),
    ("Lisa", "2012", "1", "1"),
    ("Susan", "2012", "1", "7"),
    ("Frank", "1999", "5", "5")
  ).toDF("author", "year", "month", "day")

  private val dims = Map("Author" -> col("author"), "Publish Date" -> col("year"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, String, Long)].collect().toList

  test("drill-down on one dim: sideways restores siblings (testBasic case 1)") {
    val r = rows(Facets.drillSideways(docs, dims,
      Seq(DrillDown("Author", Seq("Lisa")))))
    // Publish Date is pure drill-down: Lisa published in 2010 and 2012
    assert(r.filter(_._1 == "Publish Date") ===
      List(("Publish Date", "2010", 1L), ("Publish Date", "2012", 1L)))
    // Author is drill-sideways: all four authors stay visible
    assert(r.filter(_._1 == "Author").map(t => (t._2, t._3)).toMap ===
      Map("Lisa" -> 2L, "Bob" -> 1L, "Susan" -> 1L, "Frank" -> 1L))
    assert(r.filter(_._1 == "Author").head._2 === "Lisa") // count desc first
  }

  test("OR of two values within a dim (testBasic case 3)") {
    val r = rows(Facets.drillSideways(docs, dims,
      Seq(DrillDown("Author", Seq("Lisa", "Bob")))))
    assert(r.filter(_._1 == "Publish Date").map(t => (t._2, t._3)).toMap ===
      Map("2010" -> 2L, "2012" -> 1L))
    assert(r.filter(_._1 == "Author").map(t => (t._2, t._3)).toMap ===
      Map("Lisa" -> 2L, "Bob" -> 1L, "Susan" -> 1L, "Frank" -> 1L))
  }

  test("drill-down on two dims: each counts against the other's filter (case 4)") {
    val r = rows(Facets.drillSideways(docs, dims,
      Seq(DrillDown("Author", Seq("Lisa")), DrillDown("Publish Date", Seq("2010")))))
    // Publish Date sideways = Lisa's years
    assert(r.filter(_._1 == "Publish Date").map(t => (t._2, t._3)).toMap ===
      Map("2010" -> 1L, "2012" -> 1L))
    // Author sideways = authors who published in 2010
    assert(r.filter(_._1 == "Author").map(t => (t._2, t._3)).toMap ===
      Map("Bob" -> 1L, "Lisa" -> 1L))
  }

  test("two dims, one ORed (testBasic case 5)") {
    val r = rows(Facets.drillSideways(docs, dims,
      Seq(DrillDown("Author", Seq("Lisa", "Bob")),
        DrillDown("Publish Date", Seq("2010")))))
    assert(r.filter(_._1 == "Publish Date").map(t => (t._2, t._3)).toMap ===
      Map("2010" -> 2L, "2012" -> 1L))
    assert(r.filter(_._1 == "Author").map(t => (t._2, t._3)).toMap ===
      Map("Bob" -> 1L, "Lisa" -> 1L))
  }

  test("drillDownFilter is the AND-of-ORs DrillDownQuery") {
    val n = docs.where(Facets.drillDownFilter(dims,
      Seq(DrillDown("Author", Seq("Lisa", "Bob")),
        DrillDown("Publish Date", Seq("2010"))))).count()
    assert(n === 2) // Bob 2010 + Lisa 2010
  }

  test("taxonomy child counts at root and below a path (TestTaxonomyFacetCounts)") {
    val path = Seq(col("year"), col("month"), col("day"))
    // dim=Publish Date path=[]: 2010 (2), 2012 (2), 1999 (1)
    assert(rows(Facets.pathChildren(docs, path, Nil)
      .select(lit("d").as("d"), col("label"), col("cnt"))).map(t => (t._2, t._3)) ===
      List(("2010", 2L), ("2012", 2L), ("1999", 1L)))
    // children under [2010]: month 10 (2)
    assert(Facets.pathChildren(docs, path, Seq("2010"))
      .as[(String, Long)].collect().toList === List(("10", 2L)))
    // children under [2012, 1]: days 1 and 7
    assert(Facets.pathChildren(docs, path, Seq("2012", "1"))
      .as[(String, Long)].collect().toList === List(("1", 1L), ("7", 1L)))
  }

  // TestTaxonomyFacetAssociations.java:55-140: 110 docs, every 11th empty
  // (the empty-doc case used to hang the reference aggregators), the rest
  // carry int/a=2 + float/a=0.5, and every even one also int/b=3 +
  // float/b=0.2
  private lazy val assocDocs = (0 until 110).map { i =>
    val kvs =
      if (i % 11 == 0) Seq.empty[(String, Double)]
      else if (i % 2 == 0)
        Seq("int/a" -> 2.0, "float/a" -> 0.5, "int/b" -> 3.0, "float/b" -> 0.2)
      else Seq("int/a" -> 2.0, "float/a" -> 0.5)
    (i.toLong, kvs.map { case (p, v) => Assoc(p, v) })
  }.toDF("doc_id", "assoc")

  test("association facets: int + float sums (TestTaxonomyFacetAssociations)") {
    val out = Facets.sumAssociations(assocDocs, col("assoc"))
      .as[(String, Double)].collect().toMap
    // testIntSumAssociation: a (200), b (150)
    assert(out("int/a") === 200.0)
    assert(out("int/b") === 150.0)
    // testFloatSumAssociation: a 50f, b 10f (reference asserts +-1e-5;
    // its float32 doc-order accumulation prints 9.999995)
    assert(math.abs(out("float/a") - 50.0) < 1e-5)
    assert(math.abs(out("float/b") - 10.0) < 1e-5)
    // top-children order: value desc
    val ints = Facets.sumAssociations(assocDocs, col("assoc"),
      size(col("assoc")) > 0)
      .where(col("path").startsWith("int/"))
      .as[(String, Double)].collect().toList
    assert(ints === List(("int/a", 200.0), ("int/b", 150.0)))
  }

  test("association facets under drill-down (testIntSumAssociationDrillDown)") {
    // drill into int/b: only docs carrying b; a (100), b (150) - b first
    val hasB = exists(col("assoc"), kv => kv("path") === "int/b")
    val out = Facets.sumAssociations(assocDocs, col("assoc"), hasB)
      .where(col("path").startsWith("int/"))
      .as[(String, Double)].collect().toList
    assert(out === List(("int/b", 150.0), ("int/a", 100.0)))
  }
}
