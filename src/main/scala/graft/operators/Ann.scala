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

  /** Matryoshka / truncated-dimension ANN (MRL, Kusupati et al. 2022 —
    * the dimension-reduced coarse search modern vector stores run):
    * cosine top-k over the FIRST `dims` components only. At 64→16 dims
    * this is 4× less vector IO and FLOPs per candidate with rank quality
    * traded for speed; same broadcast-query scan shape as [[cosineTopK]],
    * and column pruning means only the truncated prefix would be read
    * from a dimension-split storage layout. */
  def matryoshkaTopK(emb: DataFrame, queryId: Long, k: Int, dims: Int,
                     id: String = "vec_id",
                     vec: String = "embedding"): DataFrame = {
    val t = emb.select(col(id), slice(col(vec), 1, dims).as("tv"))
    val q = t.where(col(id) === queryId).select(col("tv").as("qv"))
    t.crossJoin(broadcast(q))
      .where(col(id) =!= queryId)
      .select(col(id).as("id"), TextFns.cosine(col("tv"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("sim").desc, col("id").asc)))
      .select(col("rank"), col("id"), col("sim"))
  }

  /** ANN over int8 scalar-quantized vectors (the 4x-smaller storage/IO
    * path a 100 TB embedding corpus needs; cf. FAISS SQ8 and Lucene 9's
    * scalar-quantized vector format): one pass finds the corpus max|x|,
    * vectors quantize symmetrically to [-127, 127] via
    * q = floor(x * 127/max|x| + 0.5), and cosine runs DIRECTLY on the
    * quantized ints — the scale cancels in cosine, so there is no
    * dequantization. 64-dim int8 dot products are exact in double math,
    * making results bit-reproducible; recall loss is quantization error
    * only. */
  /** Corpus max|x| — the int8 quantization scale. Compute ONCE per corpus
    * and persist beside the IVF centroids/assignments (a corpus stat,
    * like Lucene's per-segment quantile metadata); per-query recomputation
    * would re-scan the whole corpus for one double. */
  def corpusMaxAbs(emb: DataFrame, vec: String = "embedding"): Double =
    emb.select(max(aggregate(col(vec), lit(0.0),
      (a, x) => greatest(a, abs(x.cast("double")))))).head().getDouble(0)

  def int8CosineTopK(emb: DataFrame, queryId: Long, k: Int,
                     id: String = "vec_id", vec: String = "embedding",
                     maxAbs0: Option[Double] = None): DataFrame = {
    val maxAbs = maxAbs0.getOrElse(corpusMaxAbs(emb, vec))
    val sc = 127.0 / maxAbs
    val qz = emb.select(col(id),
      transform(col(vec), x => greatest(lit(-127.0),
        least(lit(127.0), floor(x.cast("double") * sc + 0.5)))).as("q8"))
    val q = qz.where(col(id) === queryId).select(col("q8").as("qv"))
    val top = qz.crossJoin(broadcast(q))
      .where(col(id) =!= queryId)
      .select(col(id).as("id"), TextFns.cosine(col("q8"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("sim").desc, col("id").asc)))
      .select(col("rank"), col("id"), col("sim"))
  }

  /** Two-stage retrieval (the coarse-scan + exact-rerank pattern of every
    * large-scale ANN deployment, FAISS IndexRefine posture): stage 1
    * scans the int8 scalar-quantized vectors (4x less memory traffic)
    * for the top `candidates`; stage 2 reranks ONLY those candidates at
    * full precision. At 100 TB the fp32 corpus is never scanned — the
    * candidate set broadcasts. */
  def int8RerankTopK(emb: DataFrame, queryId: Long, candidates: Int,
                     k: Int, id: String = "vec_id",
                     vec: String = "embedding",
                     maxAbs0: Option[Double] = None): DataFrame = {
    val coarse = int8CosineTopK(emb, queryId, candidates, id, vec, maxAbs0)
      .select(col("id").as("cid"))
    val q = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    emb.join(broadcast(coarse), col(id) === col("cid"))
      .crossJoin(broadcast(q))
      .select(col(id).as("id"),
        TextFns.cosine(col(vec), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
      .withColumn("rank",
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

  /** Assign every vector to its nearest centroid (cosine desc, ties ->
    * lower cid). Centroids are broadcast; the corpus is never shuffled. */
  def ivfAssignTo(emb: DataFrame, centroids: DataFrame,
                  id: String = "vec_id", vec: String = "embedding"): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .select(col(id).as("id"), col("cid"),
        TextFns.cosine(col(vec), col("cv")).as("csim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("csim").desc, col("cid").asc)))
      .where(col("rn") === 1)
      .select(col("id"), col("cid"))

  /** Deterministic Lloyd k-means in double math: seeds = the first `k`
    * vectors by id, then `iters` rounds of assign -> element-wise-mean.
    * Returns (cid, cv: array<double>). Deterministic given the data (no
    * RNG; ulp-level nondeterminism of parallel avg cannot flip an argmax
    * except on exact ties, which break by cid). At 100 TB pass
    * `sampleFraction`: the Lloyd rounds then iterate only a DETERMINISTIC
    * multiplicative-hash sample of the corpus (seedless, rerun-stable —
    * the same scan predicate sample_stratified uses) and only the final
    * broadcast assignment touches every vector. */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int = 2,
                      id: String = "vec_id",
                      vec: String = "embedding",
                      sampleFraction: Option[Double] = None): DataFrame = {
    val all = emb.select(col(id).as("id"),
      col(vec).cast("array<double>").as("v"))
    val e = sampleFraction match {
      case Some(f) if f < 1.0 =>
        val m = 1000000L
        all.where(pmod(col("id") * lit(2654435761L), lit(m)) <
          lit(math.round(f * m)))
      case _ => all
    }
    // seeds: the k lowest-id sampled vectors (== `id < k` when unsampled
    // over dense ids — the oracle's "first n vectors" derivation)
    var cents = e.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("v").as("cv"))
    var it = 0
    while (it < iters) {
      val asg = ivfAssignTo(e, cents, "id", "v")
      cents = e.join(asg, "id")
        .select(col("cid"), posexplode(col("v")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
          .as("cv"))
      it += 1
    }
    cents
  }

  /** IVF assignment with k-means centroids (2 Lloyd rounds). */
  def ivfAssign(emb: DataFrame, nCentroids: Int,
                id: String = "vec_id", vec: String = "embedding"): DataFrame =
    ivfAssignTo(emb, kmeansCentroids(emb, nCentroids, 2, id, vec), id, vec)

  /** IVF-bucketed top-k for one query: search only the buckets of the
    * query's `nprobe` nearest centroids. Pass a materialized `assign`
    * (from [[ivfAssign]], persisted) to reuse one assignment across many
    * queries — the serving posture; otherwise it is computed here. */
  def ivfTopK(emb: DataFrame, nCentroids: Int, queryId: Long, k: Int,
              nprobe: Int = 1,
              assign0: Option[DataFrame] = None,
              centroids0: Option[DataFrame] = None,
              id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val cents = centroids0.getOrElse(kmeansCentroids(emb, nCentroids, 2, id, vec))
    val assign = assign0.getOrElse(ivfAssignTo(emb, cents, id, vec))
    val q = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    val qcids = cents.crossJoin(broadcast(q))
      .select(col("cid"), TextFns.cosine(col("cv"), col("qv")).as("csim"))
      .orderBy(col("csim").desc, col("cid").asc).limit(nprobe)
      .select(col("cid").as("qcid"))
    val bucket = assign.join(broadcast(qcids), col("cid") === col("qcid"))
      .where(col("id") =!= queryId).select(col("id"))
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
