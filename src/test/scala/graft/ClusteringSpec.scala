package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Clustering

/** Search-results clustering (Clustering.clusterResults): deterministic
  * k-means over a result page's embeddings with top-term labels —
  * two well-separated embedding clouds must come back as two clusters
  * whose labels are their members' dominant terms. */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("two separated clouds -> two clusters with dominant-term labels") {
    // Cloud A (ids 1-3): axis-x vectors, texts about "apple fruit".
    // Cloud B (ids 11-13): axis-y vectors, texts about "rocket engine".
    val docs = Seq(
      (1L, "apple fruit sweet"), (2L, "apple fruit tree"),
      (3L, "apple fruit pie"),
      (11L, "rocket engine thrust"), (12L, "rocket engine fuel"),
      (13L, "rocket engine nozzle")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(0.95f, 0f, 0.05f)),
      (11L, Array(0f, 1f, 0f)), (12L, Array(0.1f, 0.9f, 0f)),
      (13L, Array(0f, 0.95f, 0.05f))
    ).toDF("vec_id", "embedding")

    val out = Clustering.clusterResults(docs, emb, k = 2, nLabels = 2)
      .as[(Long, Long, String)].collect()

    assert(out.length == 2)
    assert(out.forall(_._2 == 3L)) // two clusters of size 3
    val labels = out.map(_._3).toSet
    assert(labels == Set("apple,fruit", "engine,rocket"))
  }

  test("k > distinct points degenerates gracefully (empty clusters dropped)") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta")).toDF("doc_id", "text")
    val emb = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.clusterResults(docs, emb, k = 4, nLabels = 1)
      .as[(Long, Long, String)].collect()
    assert(out.map(_._2).sum == 2L) // every doc assigned exactly once
    assert(out.forall(r => r._3 == "alpha" || r._3 == "beta"))
  }
}
