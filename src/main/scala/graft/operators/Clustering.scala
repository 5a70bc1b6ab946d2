package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFns

/** Search-results clustering — the Solr ClusteringComponent surface
  * (solr/contrib/clustering/src/java/org/apache/solr/handler/clustering/
  * ClusteringComponent.java:60, CarrotClusteringEngine.java:103): cluster
  * the current page of search results and label each cluster, returned
  * alongside the hits.
  *
  * Documented substitution: the reference delegates to the bundled carrot2
  * engines (Lingo / STC / ByKMeans); the carrot2 library is not in this
  * environment, so the shipped engine is the deterministic double-math
  * k-means already used by the IVF path (carrot2's bisecting-k-means shape,
  * `Ann.kmeansCentroids`: seeds = k lowest result ids, 2 Lloyd rounds,
  * cosine assignment) over the results' embedding vectors, with clusters
  * labeled by their members' most frequent analyzed terms (the
  * frequency-reduced form of carrot2's label induction). Everything is a
  * keyed aggregation over the RESULT PAGE (k rows), never the corpus — the
  * same bounded cost profile as the reference component.
  */
object Clustering {

  /** Cluster `results` (doc_id, text) by their embeddings.
    *
    * @param results the search-result page (doc_id, text)
    * @param emb     embeddings table (vec_id, embedding); vec_id == doc_id
    * @param k       cluster count (carrot2 engine hint)
    * @param nLabels top-N most frequent member terms used as the label
    * @return (cluster, size, labels) ordered size desc, cluster asc
    */
  def clusterResults(results: DataFrame, emb: DataFrame, k: Int,
                     nLabels: Int = 2): DataFrame = {
    val ids = results.select(col("doc_id"))
    val sub = emb.join(ids, emb("vec_id") === ids("doc_id"))
      .select(emb("vec_id"), emb("embedding"))
    val cents = Ann.kmeansCentroids(sub, k, iters = 2)
    val asg = Ann.ivfAssignTo(sub, cents) // (id, cid)

    val toks = results.select(col("doc_id"),
      explode(TextFns.tokensAll(col("text"))).as("term"))
    val termCounts = asg.join(toks, asg("id") === toks("doc_id"))
      .groupBy(col("cid"), col("term")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cid"))
          .orderBy(col("cnt").desc, col("term").asc)))
      .where(col("rn") <= nLabels)
    val labels = termCounts.groupBy(col("cid"))
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(rn, term))), x -> x.term)"),
        ",").as("labels"))

    asg.groupBy(col("cid")).agg(count(lit(1)).as("size"))
      .join(labels, "cid")
      .select(col("cid").as("cluster"), col("size"), col("labels"))
      .orderBy(col("size").desc, col("cluster"))
  }
}
