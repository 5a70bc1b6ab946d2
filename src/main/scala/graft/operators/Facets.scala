package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The lucene/facet module's drill-down / drill-sideways / taxonomy
  * operators.
  *
  * Reference semantics:
  *  - DrillDownQuery (facet/DrillDownQuery.java:47): baseQuery AND, per
  *    drilled dimension, the OR of its drilled values; dimensions AND.
  *  - DrillSideways (facet/DrillSideways.java:30-48): for each DRILLED
  *    dimension D, facet counts are computed over the docs matching the
  *    base query plus every drill-down EXCEPT D's own (the "near misses"),
  *    so D's sibling values do not disappear after drilling into it; a
  *    non-drilled dimension counts over the full drill-down result. The
  *    reference allocates one FacetsCollector per drill-down plus one —
  *    here it is ONE scan (per-row per-dimension match flags exploded)
  *    and ONE (dim,label) aggregation: the multi-collector turns into a
  *    single shuffle whose width is dims × labels, independent of corpus
  *    size.
  *  - Taxonomy facet counts for hierarchical dims
  *    (facet/taxonomy/TaxonomyFacetCounts.java, TestTaxonomyFacetCounts
  *    .java:118-129): counts of the CHILDREN one level below a given
  *    path prefix, over the matching docs.
  *
  * Ordering note: the reference breaks count ties by taxonomy ordinal
  * (insertion order); this engine orders ties by label — deterministic
  * under any partitioning, which insertion order is not.
  */
object Facets {

  /** One drilled dimension: OR of `values` on the dimension's label
    * column. */
  final case class DrillDown(dim: String, values: Seq[String])

  /** DrillDownQuery filter: base AND (per-dim OR of values). */
  def drillDownFilter(facetCols: Map[String, Column], drills: Seq[DrillDown],
                      base: Column = lit(true)): Column =
    drills.foldLeft(base) { (acc, d) =>
      acc && d.values.map(v => facetCols(d.dim) === v).reduce(_ || _)
    }

  /** Drill-sideways counts for every dimension in `facetCols` (drilled or
    * not), over `docs` filtered by `base` and `drills`. Returns
    * (dim, label, cnt) with cnt desc, label asc per dim. */
  def drillSideways(docs: DataFrame, facetCols: Map[String, Column],
                    drills: Seq[DrillDown],
                    base: Column = lit(true)): DataFrame = {
    val dims = facetCols.keys.toSeq.sorted
    val drillByDim = drills.groupBy(_.dim)
    // per-dimension drill filter (true when the dim is not drilled)
    val dimFilter: Map[String, Column] = dims.map { d =>
      d -> drillByDim.get(d).map(ds =>
        ds.flatMap(_.values).map(v => facetCols(d) === v).reduce(_ || _))
        .getOrElse(lit(true))
    }.toMap
    // one scan: a (dim, label, ok) struct per dimension, ok = base AND
    // every OTHER dim's drill filter (plus its own when it's not drilled
    // -- which is `true`)
    val entries = dims.map { d =>
      val others = dims.filterNot(_ == d).map(dimFilter)
        .foldLeft(base)(_ && _)
      struct(lit(d).as("dim"), facetCols(d).cast("string").as("label"),
        others.as("ok"))
    }
    docs.select(explode(array(entries: _*)).as("e"))
      .where(col("e.ok") && col("e.label").isNotNull)
      .groupBy(col("e.dim").as("dim"), col("e.label").as("label"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("dim"), col("cnt").desc, col("label"))
  }

  /** Taxonomy child counts one level below `prefix` along the hierarchy
    * `path` (a column per level), over docs matching `cond`. Returns
    * (label, cnt). */
  /** Association facets (facet/taxonomy/TaxonomyFacetSumIntAssociations
    * .java:23-80, TaxonomyFacetSumFloatAssociations.java): each matching
    * doc carries (category, value) associations packed in a BinaryDocValues
    * field; the facet value of a category is the SUM of its associations
    * over the matching docs, children ordered value desc
    * (IntTaxonomyFacets.getTopChildren).
    *
    * Here the packed byte[] becomes an array<struct<path,value>> column:
    * one explode + one (path) hash aggregation — map-side partial sums,
    * shuffle width = category count, independent of corpus size.
    *
    * Documented substitution: the reference accumulates float32 in doc-id
    * order (its own test pins 0.2f x 50 = 9.999995, asserted only to
    * 1e-5); a distributed sum has no stable order, so values aggregate in
    * double — deterministic to the same 1e-5 the reference asserts.
    *
    * Tie order: value desc, then path asc (see ordinal note above). */
  def sumAssociations(docs: DataFrame, assoc: Column,
                      cond: Column = lit(true)): DataFrame =
    docs.where(cond)
      .select(explode(assoc).as("kv"))
      .groupBy(col("kv.path").as("path"))
      .agg(sum(col("kv.value")).as("total"))
      .orderBy(col("total").desc, col("path"))

  def pathChildren(docs: DataFrame, path: Seq[Column], prefix: Seq[String],
                   cond: Column = lit(true)): DataFrame = {
    require(prefix.length < path.length, "prefix exhausts the hierarchy")
    val f = prefix.zipWithIndex.foldLeft(cond) { case (acc, (v, i)) =>
      acc && path(i) === v
    }
    docs.where(f)
      .groupBy(path(prefix.length).cast("string").as("label"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("label"))
  }
}
