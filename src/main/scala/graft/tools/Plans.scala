package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Physical-plan audit: prints `explain("formatted")` for selected
  * driver-contract queries so plan regressions (missed pushdown, missed
  * broadcast, unexpected exchanges) are visible and reviewable.
  *
  * usage: runMain graft.tools.Plans [sfDir] [query ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("facet_field", "join_semi", "group_twopass", "ft_bm25_top20",
        "dedup_minhash", "ann_cosine", "significant_terms", "hybrid_rrf",
        "ann_int8", "graph_gather", "ft_delete_search", "geo_filt",
        "geo_nearest", "export_sorted", "classify_nb", "decontaminate",
        "sample_stratified", "percolate_memory",
        // session-4 additions: broadcast list join, partial-agg HLL,
        // no-sort early-terminated top-k, sargable polygon, scan-only
        // repetition stats
        "terms_query", "stats_cardinality", "ft_sorted_early",
        "geo_polygon", "quality_repetition",
        // round-3 additions: winnow-pair equi-join, phonetic-class
        // dictionary expansion, compound/synonym index recall
        "dedup_substring", "ft_phonetic_dm", "ft_compound_de",
        "ft_synonym_index", "ft_edismax_qf",
        // round-3 session-3: codegen'd regexp scan, flatMap analysis
        // chains (single scan + output-order exchange only)
        "scrub_pii", "analysis_shingle", "analysis_kstem",
        // round-4 session-7: selector-as-aggregate, per-shard cumsum
        // packing (no global window), zero-shuffle chunk explode,
        // bounded-page rescore, keyed child-agg block sort
        "sort_multival", "pack_sequences", "chunk_sliding",
        "ft_rescore_sort", "block_join_sort", "facet_subfacet",
        // round-4 session-8: histogram rank-selection (no per-bucket
        // lists), array-literal range-bucket scan, streaming XML
        // flatten in one mapPartitions, zero-shuffle transformer chain
        "analytics_stats", "analytics_rangefacet", "dih_xpath",
        "dih_transformers",
        // round 5: precedence-parsed nested bool, schema binding,
        // delta-import merged view (analytics_stats above now shows the
        // two-phase narrowed rank selection)
        "ft_flexible", "solr_schema", "dih_delta")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n==================== $n ====================")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
