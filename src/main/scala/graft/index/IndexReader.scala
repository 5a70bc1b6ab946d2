package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.search.BM25

/** Point-in-time view over a built index directory (DirectoryReader analog,
  * lucene/core/src/java/org/apache/lucene/index/DirectoryReader.java:62).
  * Term lookups prune by the `bucket` partition directory (our stand-in for
  * the BlockTree/FST term-dict seek) and push the `term` predicate into the
  * parquet scan.
  */
final class IndexReader(val spark: SparkSession, val dir: String,
                        val numBuckets: Int) {
  import spark.implicits._

  lazy val docmeta: Dataset[DocMeta] =
    spark.read.parquet(s"$dir/docmeta").as[DocMeta]

  lazy val collStats: CollStats =
    spark.read.parquet(s"$dir/collstats").as[CollStats].head()

  lazy val avgdl: Float =
    BM25.avgFieldLength(collStats.sumTotalTermFreq, collStats.maxDoc)

  lazy val normCache: Array[Float] = BM25.cache(avgdl)

  def termStatsDf: Dataset[TermStats] =
    spark.read.parquet(s"$dir/termstats").as[TermStats]

  /** Stats for an explicit term set (bucket-pruned scan; small collect —
    * this is the TermsEnum.seekExact + stats read of the reference,
    * search/IndexSearcher.java:836-847). */
  def termStats(terms: Seq[String]): Map[String, TermStats] = {
    if (terms.isEmpty) return Map.empty
    val buckets = terms.map(t => Buckets.of(t, numBuckets)).distinct
    termStatsDf
      .where($"bucket".isin(buckets: _*) && $"term".isin(terms: _*))
      .collect().map(ts => ts.term -> ts).toMap
  }

  /** Term-dictionary expansion for multi-term queries (prefix/wildcard/
    * fuzzy/range rewrite, reference search/MultiTermQuery.java). The
    * predicate runs over the term dictionary, NOT the postings. */
  def expandTerms(pred: org.apache.spark.sql.Column, limit: Int = 1024): Seq[TermStats] =
    termStatsDf.where(pred).orderBy($"term").limit(limit).collect().toSeq

  /** Compressed block rows for the given terms, bucket-pruned. */
  def blocks(terms: Seq[String]): Dataset[BlockRow] = {
    val buckets = terms.map(t => Buckets.of(t, numBuckets)).distinct
    spark.read.parquet(s"$dir/postings")
      .where($"bucket".isin(buckets: _*) && $"term".isin(terms: _*))
      .drop("wave")
      .select($"bucket", $"term", $"firstDoc", $"lastDoc", $"count",
        $"maxTf", $"maxPartial", $"docBytes", $"nrmBytes", $"posBytes")
      .as[BlockRow]
  }
}

object IndexReader {
  def apply(spark: SparkSession, dir: String,
            cfg: IndexConfig = IndexConfig()): IndexReader =
    new IndexReader(spark, dir, cfg.numBuckets)
}
