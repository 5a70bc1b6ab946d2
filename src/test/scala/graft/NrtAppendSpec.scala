package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index._
import graft.search._
import graft.streaming.StreamOps

/** NRT-style streaming index append (SURVEY.md §2.10): micro-batches land
  * as delta sub-indexes via foreachBatch; a MultiIndexReader over
  * base+deltas must be float/rank-IDENTICAL to a from-scratch build over
  * the union (global df/avgdl, same docIds). */
class NrtAppendSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val BaseParts = 4
  private val PartsPerBatch = 2
  private def cfg(nParts: Int) = IndexConfig(numDocParts = nParts,
    numBuckets = 8, waves = 1, hotDfThreshold = 1000L, saltShift = 6,
    shufflePartitions = 8)

  test("streamed appends == from-scratch union build (scores and docIds)") {
    val all = CorpusGen.generate(spark, 600).toDF().cache()
    // deterministic 3-way split: base 0..299, batches of 150
    val ids = all.withColumn("rid",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("repo", "path", "commit")) - 1).cache()
    def part(lo: Int, hi: Int, offset: Int, k: Int): DataFrame =
      ids.where($"rid" >= lo && $"rid" < hi)
        .withColumn("docPart",
          lit(offset) + pmod(hash($"repo", $"path", $"commit"), lit(k)))
        .drop("rid")

    val base = part(0, 300, 0, BaseParts)
    val b1 = part(300, 450, BaseParts, PartsPerBatch)
    val b2 = part(450, 600, BaseParts + PartsPerBatch, PartsPerBatch)

    // ---- streamed: base build + 2 foreachBatch appends ----
    val dir = SparkSuite.tmpDir("graft-nrt")
    IndexBuilder.build(spark, base, dir, cfg(BaseParts))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[DocInput]
    val q = StreamOps.indexAppendSink(
        mem.toDS().toDF(), dir, cfg(BaseParts), PartsPerBatch, BaseParts)
      .start()
    // re-derive each batch's DocInput rows (drop the docPart column: the
    // sink recomputes the same offset + hash assignment)
    mem.addData(b1.drop("docPart").as[DocInput].collect().toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.drop("docPart").as[DocInput].collect().toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()

    val multi = MultiIndexReader.open(spark, dir, 8, cacheData = false)
    assert(multi.readers.length == 3, "base + 2 deltas")

    // ---- reference: one build over the union with the SAME docParts ----
    val fullDir = SparkSuite.tmpDir("graft-nrt-full")
    IndexBuilder.build(spark, base.union(b1).union(b2), fullDir,
      cfg(BaseParts + 2 * PartsPerBatch))
    val full = new IndexReader(spark, fullDir, 8, cacheData = false)

    assert(multi.collStats == full.collStats)
    val qy = BoolQ(Seq((Occur.Should, TermQ("import")),
      (Occur.Should, TermQ("spark")), (Occur.Should, TermQ("merge"))))
    val got = new JoinScorer(multi).topK(qy, 25).as[(Long, Float)].collect().toSeq
    val exp = new JoinScorer(full).topK(qy, 25).as[(Long, Float)].collect().toSeq
    assert(got == exp, "append view must equal the from-scratch build")

    // WAND over the union view agrees too
    val wGot = new WandScorer(multi).topK(Seq("import", "spark", "merge"), 25)
      .as[(Long, Float)].collect().toSeq
    assert(wGot == exp)
    ids.unpersist(); all.unpersist()
  }
}
