package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index._
import graft.search._

/** Round-2 scale fix: the WAND distributor's block->chunk fan-out must be
  * O(#blocks + #terms x #chunks), NOT O(#blocks x numDocParts). At 100 TB
  * numDocParts ~ 2e5, so per-docPart replication (the round-1 model) would
  * copy each rare-term block ~2e5 times; the bounded chunk grid caps the
  * copy count at ~2x parallelism regardless of numDocParts. */
class WandScaleSpec extends AnyFunSuite {
  import SparkSuite.spark
  import spark.implicits._

  test("disjointBlocks: random overlapping clusters decode to the same " +
    "ascending posting stream (tiered-merge overlap repair)") {
    import graft.codec.{Posting, PostingsCodec}
    import graft.index.BlockRow
    val rnd = new scala.util.Random(7)
    val cache = graft.search.BM25.cache(50f)
    def mk(postings: Seq[Posting]): Seq[BlockRow] =
      PostingsCodec.encode("t", postings.iterator, cache).map(b =>
        BlockRow(0, b.term, b.firstDoc, b.lastDoc, b.count, b.maxTf,
          b.sumTf, b.maxPartial, b.docBytes, b.nrmBytes, b.posBytes)).toSeq
    for (_ <- 1 to 50) {
      // 2-4 "sub-indexes" over interleaved docId ranges — exactly the
      // shape a tiered merge produces
      val nSub = 2 + rnd.nextInt(3)
      val all = scala.collection.mutable.Set[Long]()
      val subs = (0 until nSub).map { s =>
        val docs = (0 until 30 + rnd.nextInt(200))
          .map(_ => rnd.nextInt(100000).toLong * nSub + s)
        docs.distinct.sorted.map { d =>
          all += d
          val poss = Array(1, 5).take(1 + rnd.nextInt(2))
          Posting(d, poss.length, poss, (rnd.nextInt(256) - 128).toByte)
        }
      }
      val rows = subs.flatMap(mk).sortBy(_.firstDoc).toArray
      val fixed = WandScorer.disjointBlocks(rows, cache)
      // spans now pairwise disjoint
      fixed.sliding(2).foreach {
        case Array(a, b) => assert(a.lastDoc < b.firstDoc)
        case _ =>
      }
      // decoded stream = the exact original doc set, ascending
      val dec = fixed.flatMap(b => PostingsCodec.decodeDocs(
        graft.codec.PostingBlock(b.term, b.firstDoc, b.lastDoc, b.count,
          b.maxTf, b.sumTf, b.maxPartial, b.docBytes, b.nrmBytes,
          b.posBytes))._1)
      assert(dec.toSeq == dec.toSeq.sorted)
      assert(dec.toSet == all, "doc set must survive the repair")
      // bounds stay sound: every block's maxPartial dominates the max
      // partial of its own postings under the SAME cache
      fixed.foreach { b =>
        val ps = PostingsCodec.decode(graft.codec.PostingBlock(b.term,
          b.firstDoc, b.lastDoc, b.count, b.maxTf, b.sumTf, b.maxPartial,
          b.docBytes, b.nrmBytes, b.posBytes))
        ps.foreach { p =>
          val partial = p.tf.toFloat / (p.tf.toFloat + cache(p.norm & 0xFF))
          assert(partial <= b.maxPartial)
        }
      }
    }
  }

  test("chunk grid is bounded by parallelism, not numDocParts") {
    // 2e5 docParts (the SCALE.md cluster figure), 32-way parallelism
    val ppc = WandScorer.partsPerChunk(200000, 32)
    val chunks = (200000 + ppc - 1) / ppc
    assert(chunks <= 64, s"chunk count $chunks exceeds 2x parallelism")
    // a rare-term block spanning the WHOLE doc space fans out to <= chunks
    val span = WandScorer.chunksOf(0L, Ids.docId(199999, 5L), ppc).size
    assert(span <= 64, s"full-span block replicated $span times")
    // degenerate inputs stay sane
    assert(WandScorer.partsPerChunk(1, 32) == 1)
    assert(WandScorer.chunksOf(0L, 0L, WandScorer.partsPerChunk(1, 32)).size == 1)
  }

  test("numDocParts=4096 build: shuffled block rows O(#blocks), ranks correct") {
    val cfg = IndexConfig(numDocParts = 4096, numBuckets = 8, waves = 1,
      hotDfThreshold = 100, saltShift = 4, shufflePartitions = 8)
    val dir = SparkSuite.tmpDir("graft-wand4096")
    val corpus = CorpusGen.generate(spark, 300, seed = 7L, parts = 8)
    IndexBuilder.build(spark, corpus.toDF(), dir, cfg)
    val reader = IndexReader(spark, dir, cfg)
    assert(reader.numDocPartsHint > 1000 && reader.numDocPartsHint <= 4096)

    val terms = Seq("import", "spark", "println")
    val ppc = WandScorer.partsPerChunk(reader.numDocPartsHint,
      spark.sparkContext.defaultParallelism)
    val nBlocks = reader.blocks(terms).count()
    val replicated = reader.blocks(terms)
      .flatMap(b => WandScorer.chunksOf(b.firstDoc, b.lastDoc, ppc).map(_ => 1))
      .count()
    val chunkCap = 2L * spark.sparkContext.defaultParallelism
    assert(replicated <= nBlocks + terms.size * chunkCap,
      s"fan-out $replicated for $nBlocks blocks (cap ${nBlocks + terms.size * chunkCap})")
    // the round-1 model would have produced ~#blocks x spanParts rows here
    // ("import" spans nearly all 4096 live parts); sanity: we beat it by 10x+
    assert(replicated < nBlocks * 400,
      s"fan-out $replicated suggests per-docPart replication returned")

    // ranks still correct at this docPart granularity: WAND == join path
    val joiner = new JoinScorer(reader)
    val wand = new WandScorer(reader)
    for (ts <- Seq(Seq("import"), Seq("import", "spark"), terms)) {
      val exp = joiner.topK(BoolQ(ts.map(t => (Occur.Should, TermQ(t)))), 10)
        .as[(Long, Float)].collect().toSeq
      val got = wand.topK(ts, 10).as[(Long, Float)].collect().toSeq
      assert(got == exp, s"WAND != join for $ts")
    }
    val expA = joiner.topK(BoolQ(Seq(Occur.Must -> TermQ("import"),
      Occur.Must -> TermQ("spark"))), 10).as[(Long, Float)].collect().toSeq
    val gotA = wand.topK(Seq("import", "spark"), 10, conjunctive = true)
      .as[(Long, Float)].collect().toSeq
    assert(gotA == expA)
  }
}
