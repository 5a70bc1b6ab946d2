package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Three tiers:
  *
  *  - [[cosineTopK]]: brute-force top-k for one query — the correctness
  *    baseline; one broadcast + map + TakeOrderedAndProject, no shuffle of
  *    the embedding table.
  *  - [[knnJoin]]: brute-force k-NN join for a (small, broadcast) query
  *    set — window top-k per query; scales as |queries| x |corpus| map work.
  *  - [[ivfTopK]]: IVF-style bucketed search — vectors are assigned to
  *    their nearest centroid once (an O(C) map pass), queries probe only
  *    their own centroid's bucket. The 100TB path: assignment is a narrow
  *    map, the probe scans ~1/C of the corpus.
  *
  * Cosine is TextFns.cosine (double math, DuckDB-identical formula) so all
  * three are SQL-oracle checkable.
  */
object Ann {

  /** Brute-force cosine top-k for the embedding with id `queryId`,
    * excluding the query row itself: (rank, id, sim). */
  def cosineTopK(emb: DataFrame, queryId: Long, k: Int,
                 id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val q = emb.where(col(id) === queryId)
      .select(col(vec).as("qv"))
    val top = emb.crossJoin(broadcast(q))
      .where(col(id) =!= queryId)
      .select(col(id).as("id"), TextFns.cosine(col(vec), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("sim").desc, col("id").asc)))
      .select(col("rank"), col("id"), col("sim"))
  }

  /** Brute-force k-NN join: top-k neighbors for every query id < nQueries
    * (self excluded): (qid, rank, id, sim). */
  def knnJoin(emb: DataFrame, nQueries: Int, k: Int,
              id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val queries = emb.where(col(id) < nQueries)
      .select(col(id).as("qid"), col(vec).as("qv"))
    val scored = emb.crossJoin(broadcast(queries))
      .where(col(id) =!= col("qid"))
      .select(col("qid"), col(id).as("id"),
        TextFns.cosine(col(vec), col("qv")).as("sim"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("id").asc)))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("sim"))
  }

  /** IVF assignment: nearest (by cosine, ties -> lower centroid id) of the
    * first `nCentroids` vectors, used as fixed deterministic centroids
    * (stand-in for a k-means pass; the plumbing is identical). */
  def ivfAssign(emb: DataFrame, nCentroids: Int,
                id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val cents = emb.where(col(id) < nCentroids)
      .select(col(id).as("cid"), col(vec).as("cv"))
    emb.crossJoin(broadcast(cents))
      .select(col(id).as("id"), col("cid"),
        TextFns.cosine(col(vec), col("cv")).as("csim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("csim").desc, col("cid").asc)))
      .where(col("rn") === 1)
      .select(col("id"), col("cid"))
  }

  /** IVF-bucketed top-k for one query (nprobe=1): search only the bucket
    * of the query's own centroid. */
  def ivfTopK(emb: DataFrame, nCentroids: Int, queryId: Long, k: Int,
              id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val assign = ivfAssign(emb, nCentroids, id, vec)
    val qcid = assign.where(col("id") === queryId).select(col("cid").as("qcid"))
    val bucket = assign.join(broadcast(qcid), col("cid") === col("qcid"))
      .where(col("id") =!= queryId).select(col("id"))
    val q = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    val top = emb.join(bucket, emb(id) === bucket("id"))
      .crossJoin(broadcast(q))
      .select(bucket("id").as("nid"), TextFns.cosine(col(vec), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("nid").asc)
      .limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("sim").desc, col("nid").asc)))
      .select(col("rank"), col("nid").as("id"), col("sim"))
  }
}
