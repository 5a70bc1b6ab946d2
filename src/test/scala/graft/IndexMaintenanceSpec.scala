package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.scalatest.funsuite.AnyFunSuite

import graft.index._
import graft.search._

/** CheckIndex invariants + resumable-build semantics (north rule:
  * resumable from per-partition checkpoints, byte-identical results). */
class IndexMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val cfg = IndexConfig(numDocParts = 8, numBuckets = 8, waves = 2,
    hotDfThreshold = 400L, saltShift = 6, shufflePartitions = 8)

  private lazy val input = CorpusGen.generate(spark, 800).toDF()

  private def build(dir: String): IndexReader = {
    IndexBuilder.build(spark, input, dir, cfg)
    new IndexReader(spark, dir, cfg.numBuckets, cacheData = false)
  }

  private def topDocs(r: IndexReader): Seq[(Long, Float)] =
    new JoinScorer(r).topK(BoolQ(Seq(
      (Occur.Should, TermQ("import")), (Occur.Should, TermQ("spark")))), 20)
      .as[(Long, Float)].collect().toSeq

  test("CheckIndex: fresh build has zero violations on every invariant") {
    val dir = SparkSuite.tmpDir("graft-check")
    val r = build(dir)
    val res = CheckIndex.run(r, Some(input)).collect()
    assert(res.length == 7)
    res.foreach(c => assert(c.violations == 0L, s"check ${c.check}"))
  }

  test("resume: killed-after-stage build resumes and is result-identical") {
    val full = SparkSuite.tmpDir("graft-full")
    val rFull = build(full)
    val expect = topDocs(rFull)

    // simulate a crash after termstats: wave-0 postings committed, wave-1
    // not (its marker is missing) — resume must redo ONLY wave 1
    val part = SparkSuite.tmpDir("graft-part")
    IndexBuilder.build(spark, input, part, cfg)
    deleteRec(Paths.get(s"$part/postings/wave=1"))
    Files.deleteIfExists(IndexBuilder.markerPath(part, "postings_wave_1"))
    Files.deleteIfExists(IndexBuilder.markerPath(part, "done"))
    val segMtime = Files.getLastModifiedTime(
      Paths.get(s"$part/_lineage/segments.json"))

    val rResumed = build(part) // resume
    assert(Files.getLastModifiedTime(Paths.get(s"$part/_lineage/segments.json"))
      == segMtime, "resume must not redo completed stages")
    assert(topDocs(rResumed) == expect,
      "resumed build must be result-identical to an uninterrupted one")
    CheckIndex.run(rResumed, Some(input)).collect()
      .foreach(c => assert(c.violations == 0L, s"check ${c.check}"))
  }

  test("salting invariance: everything-salted == nothing-salted build") {
    // hotDfThreshold=1 salts EVERY term into docId-range chunks; a huge
    // threshold salts none. Query results (and CheckIndex) must be
    // identical — the firstDoc-order concatenation of chunks IS the
    // posting list (SURVEY.md §4.4).
    val salted = SparkSuite.tmpDir("graft-salt")
    val unsalted = SparkSuite.tmpDir("graft-nosalt")
    IndexBuilder.build(spark, input, salted, cfg.copy(hotDfThreshold = 1L))
    IndexBuilder.build(spark, input, unsalted,
      cfg.copy(hotDfThreshold = Long.MaxValue))
    val rs = new IndexReader(spark, salted, cfg.numBuckets, cacheData = false)
    val ru = new IndexReader(spark, unsalted, cfg.numBuckets, cacheData = false)
    assert(topDocs(rs) == topDocs(ru))
    val wandS = new WandScorer(rs).topK(Seq("import", "spark"), 20)
      .as[(Long, Float)].collect().toSeq
    val wandU = new WandScorer(ru).topK(Seq("import", "spark"), 20)
      .as[(Long, Float)].collect().toSeq
    assert(wandS == wandU && wandS == topDocs(rs))
    CheckIndex.run(rs, Some(input)).collect()
      .foreach(c => assert(c.violations == 0L, s"salted check ${c.check}"))
  }

  test("deletes: live-docs semantics pre-compaction; compact purges " +
    "tombstones and recomputes stats (merge analog)") {
    val dir = SparkSuite.tmpDir("graft-del")
    val r0 = build(dir)
    val q = BoolQ(Seq(
      (Occur.Should, TermQ("import")), (Occur.Should, TermQ("spark"))))
    val before = topDocs(r0)
    val delQ = BoolQ(Seq((Occur.Must, TermQ("println"))))
    val delIds = new JoinScorer(r0).scores(delQ).map(_._1).collect().toSet
    assert(delIds.nonEmpty && delIds.size < 800)
    val n = IndexBuilder.deleteByQuery(spark, dir, cfg, delQ)
    assert(n == delIds.size)

    val r1 = new IndexReader(spark, dir, cfg.numBuckets, cacheData = false)
    // stats keep counting deleted docs until compaction (reference
    // pre-merge semantics) -> surviving docs keep their exact scores
    assert(r1.collStats == r0.collStats)
    val after = topDocs(r1)
    assert(after.nonEmpty && after.forall(t => !delIds.contains(t._1)))
    val beforeMap = before.toMap
    after.foreach { case (id, s) =>
      beforeMap.get(id).foreach(bs => assert(bs == s)) }
    // WAND path agrees with the join path under deletes (tombstones are
    // skipped BEFORE the heap, so they cannot displace live hits)
    val wandTop = new WandScorer(r1).topK(Seq("import", "spark"), 20)
      .as[(Long, Float)].collect().toSeq
    assert(wandTop == after)
    // CheckIndex on the tombstoned (pre-compaction) reader exercises the
    // deletes_reference_live_segment invariant
    val preChecks = CheckIndex.run(r1).collect()
    assert(preChecks.exists(_.check == "deletes_reference_live_segment"))
    preChecks.foreach(c => assert(c.violations == 0L, s"pre-compact ${c.check}"))

    val cdir = SparkSuite.tmpDir("graft-compacted")
    IndexBuilder.compact(spark, dir, cdir, cfg)
    val rc = new IndexReader(spark, cdir, cfg.numBuckets, cacheData = false)
    assert(rc.deletedDocs.isEmpty)
    assert(rc.collStats.maxDoc == r0.collStats.maxDoc - delIds.size)
    assert(rc.termStats(Seq("println")).isEmpty,
      "compaction must purge the deleted docs' terms from the dictionary")
    // float-exact rank identity vs the independent oracle over survivors
    // (docIds preserved; stats recomputed over survivors only)
    val survivors = rc.docmeta
      .join(input.withColumnRenamed("lang", "lang2"),
        Seq("repo", "path", "commit"))
      .select($"docId", $"lang", $"content")
      .as[(Long, String, String)].collect()
      .map(t => NaiveOracle.Doc(t._1, t._2, t._3))
    assert(survivors.length == 800 - delIds.size)
    val oracle = new NaiveOracle.Index(survivors.toSeq)
    val got = new JoinScorer(rc).topK(q, 20).as[(Long, Float)].collect().toSeq
    assert(got == oracle.topK(q, 20))
    CheckIndex.run(rc).collect()
      .foreach(c => assert(c.violations == 0L, s"compacted check ${c.check}"))
  }

  test("live-docs contract holds in EVERY scorer: LM-Dirichlet, DFR, " +
    "Classic and DisMax exclude tombstones (round-2 advice)") {
    val dir = SparkSuite.tmpDir("graft-del-alt")
    val r0 = build(dir)
    val delQ = BoolQ(Seq((Occur.Must, TermQ("println"))))
    val delIds = new JoinScorer(r0).scores(delQ).map(_._1).collect().toSet
    assert(delIds.nonEmpty)
    IndexBuilder.deleteByQuery(spark, dir, cfg, delQ)
    val r = new IndexReader(spark, dir, cfg.numBuckets, cacheData = false)
    val terms = Seq("import", "println")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("docId").as[Long].collect().toSet
    val got = Map(
      "lmdirichlet" -> ids(new LMDirichletScorer(r).topK(terms, 100)),
      "dfr" -> ids(new SimilarityScorer(r,
        (df, ttf, maxDoc, _, avgdl) =>
          Similarities.dfrGL2(df, ttf, maxDoc, avgdl)).topK(terms, 100)),
      "classic" -> ids(new ClassicScorer(r).topK(terms, 100)),
      "dismax" -> ids(new JoinScorer(r).topKDisMax(terms, 100)))
    got.foreach { case (name, s) =>
      assert(s.nonEmpty, name)
      assert(s.intersect(delIds).isEmpty,
        s"$name returned tombstoned docs: ${s.intersect(delIds).take(5)}")
    }
  }

  test("atomic update: delete-by-key + add, realtime-get, compaction " +
    "rank-identical to oracle over the rewritten corpus") {
    import org.apache.spark.sql.functions.{col, hash, md5, pmod, regexp_replace, lit, not}
    val dir = SparkSuite.tmpDir("graft-upd")
    val r0 = build(dir)
    val n0 = r0.collStats.maxDoc

    // rewrite every 'println' doc under its unchanged (repo, path) key,
    // on FRESH docParts (new internal docIds, as updateDocument assigns)
    val updInput = input.where(col("content").contains("println"))
      .withColumn("content", regexp_replace(col("content"), "println", "printfz"))
      .withColumn("commit", md5(col("content")))
      .withColumn("docPart",
        (lit(cfg.numDocParts) +
          pmod(hash(col("repo"), col("path"), col("commit")),
            lit(cfg.numDocParts))).cast("int"))
    val nUpd = updInput.count()
    assert(nUpd > 0 && nUpd < 800)
    val cfgU = cfg.copy(numDocParts = cfg.numDocParts * 2)
    IndexBuilder.updateDocs(spark, dir, updInput, cfgU)

    val rU = MultiIndexReader.open(spark, dir, cfg.numBuckets, cacheData = false)
    // pre-merge stats count old tombstoned versions AND new versions
    assert(rU.collStats.maxDoc == n0 + nUpd)
    // old content is gone from results; new content matches
    assert(new JoinScorer(rU)
      .scores(BoolQ(Seq((Occur.Must, TermQ("println"))))).count() == 0)
    val hitsNew = new JoinScorer(rU)
      .scores(BoolQ(Seq((Occur.Must, TermQ("printfz"))))).count()
    assert(hitsNew == nUpd)
    // WAND agrees with the join path under update tombstones
    val q2 = BoolQ(Seq(
      (Occur.Should, TermQ("import")), (Occur.Should, TermQ("printfz"))))
    val joinTop = new JoinScorer(rU).topK(q2, 20).as[(Long, Float)].collect().toSeq
    val wandTop = new WandScorer(rU).topK(Seq("import", "printfz"), 20)
      .as[(Long, Float)].collect().toSeq
    assert(wandTop == joinTop)

    // realtime-get: updated key -> new commit on a NEW docId
    val u0 = updInput.select("repo", "path", "commit").head()
    val got = rU.realtimeGet(u0.getString(0), u0.getString(1)).collect()
    assert(got.length == 1)
    assert(got(0).getAs[String]("commit") == u0.getString(2))
    assert(got(0).getAs[Long]("docId") >= (cfg.numDocParts.toLong << 40))
    // non-updated key -> its original version
    val k0 = input.where(not(col("content").contains("println")))
      .select("repo", "path", "commit").head()
    val got2 = rU.realtimeGet(k0.getString(0), k0.getString(1)).collect()
    assert(got2.length == 1 && got2(0).getAs[String]("commit") == k0.getString(2))

    // compaction: one doc per key, stats over the rewritten corpus;
    // float-exact rank identity vs the independent in-memory oracle
    val cdir = SparkSuite.tmpDir("graft-updc")
    IndexBuilder.compact(spark, dir, cdir, cfgU)
    val rc = new IndexReader(spark, cdir, cfg.numBuckets, cacheData = false)
    assert(rc.deletedDocs.isEmpty && rc.collStats.maxDoc == n0)
    val rewritten = input.where(not(col("content").contains("println")))
      .unionByName(updInput.select(input.columns.map(col): _*))
    val docs = rc.docmeta
      .join(rewritten.withColumnRenamed("lang", "lang2"),
        Seq("repo", "path", "commit"))
      .select($"docId", $"lang", $"content")
      .as[(Long, String, String)].collect()
      .map(t => NaiveOracle.Doc(t._1, t._2, t._3))
    assert(docs.length == n0)
    val oracle = new NaiveOracle.Index(docs.toSeq)
    val gotTop = new JoinScorer(rc).topK(q2, 20).as[(Long, Float)].collect().toSeq
    assert(gotTop == oracle.topK(q2, 20))
    CheckIndex.run(rc).collect()
      .foreach(c => assert(c.violations == 0L, s"compacted check ${c.check}"))
  }

  test("collection scope: deleteByQuery reaches delta docs, CheckIndex " +
    "accepts delta tombstones in base deletes, splitShard carries deltas") {
    import org.apache.spark.sql.functions.{col, hash, lit, md5, pmod, regexp_replace}
    val dir = SparkSuite.tmpDir("graft-coll")
    build(dir)
    // delta: rewrite the println docs to printfz under fresh docParts
    val updInput = input.where(col("content").contains("println"))
      .withColumn("content", regexp_replace(col("content"), "println", "printfz"))
      .withColumn("commit", md5(col("content")))
      .withColumn("docPart",
        (lit(cfg.numDocParts) +
          pmod(hash(col("repo"), col("path"), col("commit")),
            lit(cfg.numDocParts))).cast("int"))
    val nUpd = updInput.count()
    val cfgU = cfg.copy(numDocParts = cfg.numDocParts * 2)
    IndexBuilder.updateDocs(spark, dir, updInput, cfgU)

    // CheckIndex on the BASE reader: updateDocs wrote tombstones for
    // delta-resident old versions into base deletes/ — the dangling-
    // tombstone check must resolve docIds across the whole collection
    val baseR = new IndexReader(spark, dir, cfg.numBuckets, cacheData = false)
    CheckIndex.run(baseR).collect().foreach(c =>
      assert(c.violations == 0L, s"base-reader check ${c.check}"))

    // deleteByQuery for a term that exists ONLY in the delta: the matched
    // docs live in delta_0, a base-only reader would find nothing
    val n = IndexBuilder.deleteByQuery(spark, dir, cfgU,
      BoolQ(Seq((Occur.Must, TermQ("printfz")))))
    assert(n == nUpd, s"deleteByQuery matched $n of $nUpd delta docs")
    val rAfter = MultiIndexReader.open(spark, dir, cfg.numBuckets,
      cacheData = false)
    assert(new JoinScorer(rAfter)
      .scores(BoolQ(Seq((Occur.Must, TermQ("printfz"))))).count() == 0)

    // splitShard: children must carry the delta docs AND the delta
    // tombstones (union == parent live view, nothing resurrected)
    val loDir = SparkSuite.tmpDir("graft-coll-lo")
    val hiDir = SparkSuite.tmpDir("graft-coll-hi")
    val mid = 4L << 40 // docPart 4 boundary: split inside the base range
    IndexBuilder.splitShard(spark, dir, loDir, hiDir, mid, cfgU)
    val rChildren = new MultiIndexReader(Seq(
      new IndexReader(spark, loDir, cfg.numBuckets, cacheData = false),
      new IndexReader(spark, hiDir, cfg.numBuckets, cacheData = false)))
    // all docs present across children (deltas included)...
    assert(rChildren.docmeta.count() == rAfter.docmeta.count())
    // ...and the deleted-in-delta docs stay deleted in the children
    assert(new JoinScorer(rChildren)
      .scores(BoolQ(Seq((Occur.Must, TermQ("printfz"))))).count() == 0)
    // live results identical to the parent collection view
    val q = BoolQ(Seq((Occur.Should, TermQ("import")),
      (Occur.Should, TermQ("spark"))))
    assert(new JoinScorer(rChildren).topK(q, 20).as[(Long, Float)]
      .collect().toSeq ==
      new JoinScorer(rAfter).topK(q, 20).as[(Long, Float)].collect().toSeq)
  }

  test("tiered compaction: merges only the overfull tier, cold segments " +
    "byte-identical, results unchanged (TieredMergePolicy analog)") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = SparkSuite.tmpDir("graft-tier")
    build(dir)
    val cfgT = cfg.copy(numDocParts = cfg.numDocParts + 12)
    // 12 small appends, one fresh docPart each (NRT micro-batches)
    (0 until 12).foreach { k =>
      val in = CorpusGen.generate(spark, 40, seed = 100L + k).toDF()
        .withColumn("docPart", lit(cfg.numDocParts + k))
      IndexBuilder.append(spark, in, dir, IndexBuilder.nextDeltaId(dir), cfgT)
    }
    assert(IndexBuilder.subIndexDirs(dir).size == 13)

    def fileHashes(roots: Seq[Path]): Map[String, String] = {
      def walk(p: Path): Seq[Path] =
        if (Files.isDirectory(p))
          Option(p.toFile.listFiles()).toSeq.flatten.map(_.toPath).flatMap(walk)
        else Seq(p)
      roots.flatMap(walk).map { f =>
        f.toString -> IndexBuilder.sha256Hex(
          java.util.Base64.getEncoder.encodeToString(Files.readAllBytes(f)))
      }.toMap
    }
    // sizes tie -> lexicographic dir order: delta_8 and delta_9 stay cold
    val coldRoots = Seq(Paths.get(dir, "segments"), Paths.get(dir, "postings"),
      Paths.get(dir, "delta_8"), Paths.get(dir, "delta_9"))
    val coldBefore = fileHashes(coldRoots)

    val q = BoolQ(Seq((Occur.Should, TermQ("import")),
      (Occur.Should, TermQ("spark"))))
    val rBefore = MultiIndexReader.open(spark, dir, cfg.numBuckets,
      cacheData = false)
    val before = new JoinScorer(rBefore).topK(q, 20)
      .as[(Long, Float)].collect().toSeq

    val merged = IndexBuilder.compactTiered(spark, dir, cfgT)
    assert(merged.isDefined, "12 same-tier deltas > segsPerTier=10 must merge")
    // 12 deltas -> merge the 10 smallest -> base + 2 cold + 1 merged
    val visible = IndexBuilder.subIndexDirs(dir)
    assert(visible.size == 4, visible.mkString(","))
    assert(visible.exists(_.endsWith("delta_8")) &&
      visible.exists(_.endsWith("delta_9")))
    // cold files untouched, byte for byte
    assert(fileHashes(coldRoots) == coldBefore)
    // merged sources physically gone
    assert(!Files.exists(Paths.get(dir, "delta_0")))
    // identical results (no deletes involved -> scores float-identical)
    val rAfter = MultiIndexReader.open(spark, dir, cfg.numBuckets,
      cacheData = false)
    assert(new JoinScorer(rAfter).topK(q, 20)
      .as[(Long, Float)].collect().toSeq == before)
    // WAND agrees — this exercises BOTH multi-reader WAND soundness
    // fixes: the per-sub maxPartial bound rescale (SearchReader
    // .boundScale) and the overlapping-block merge (WandScorer
    // .disjointBlocks) that tiered merges make necessary
    assert(new WandScorer(rAfter).topK(Seq("import", "spark"), 20)
      .as[(Long, Float)].collect().toSeq == before)
    CheckIndex.run(new IndexReader(spark, merged.get, cfg.numBuckets,
      cacheData = false)).collect()
      .foreach(c => assert(c.violations == 0L, s"merged check ${c.check}"))
    // steady state: nothing over threshold -> free no-op
    assert(IndexBuilder.compactTiered(spark, dir, cfgT).isEmpty)
    // id allocation skips the numbering hole left by the merge
    assert(IndexBuilder.nextDeltaId(dir) == 13L)
  }

  test("optimistic concurrency: matching expectCommit applies, stale or " +
    "unknown keys are rejected as conflicts") {
    import org.apache.spark.sql.functions.{col, hash, lit, md5, pmod, regexp_replace}
    val dir = SparkSuite.tmpDir("graft-ver")
    build(dir)
    val cfgU = cfg.copy(numDocParts = cfg.numDocParts * 3)
    def parted(df: org.apache.spark.sql.DataFrame, offset: Int) =
      df.withColumn("docPart", (lit(offset) +
        pmod(hash(col("repo"), col("path"), col("commit")),
          lit(cfg.numDocParts))).cast("int"))

    val g0 = input.where(col("content").contains("println"))
    val n = g0.count()
    // generation 1 carries the ORIGINAL commit as its expectation
    val g1 = parted(g0.withColumn("expectCommit", col("commit"))
      .withColumn("content", regexp_replace(col("content"), "println", "printva"))
      .withColumn("commit", md5(col("content"))), cfg.numDocParts).cache()
    assert(IndexBuilder.updateDocsVersioned(spark, dir, g1, cfgU) == (n, 0L))

    // replaying generation 1 is now STALE (live commit moved), and an
    // unknown key can never match
    val bogus = g1.limit(1).withColumn("path", lit("no/such/doc"))
    assert(IndexBuilder.updateDocsVersioned(spark, dir,
      g1.unionByName(bogus), cfgU) == (0L, n + 1))

    // generation 2 expects generation 1's commit -> applies
    val g2 = parted(g1.drop("expectCommit", "docPart")
      .withColumn("expectCommit", col("commit"))
      .withColumn("content", regexp_replace(col("content"), "printva", "printvb"))
      .withColumn("commit", md5(col("content"))), 2 * cfg.numDocParts)
    assert(IndexBuilder.updateDocsVersioned(spark, dir, g2, cfgU) == (n, 0L))

    val r = MultiIndexReader.open(spark, dir, cfg.numBuckets, cacheData = false)
    def hits(t: String): Long =
      new JoinScorer(r).scores(BoolQ(Seq((Occur.Must, TermQ(t))))).count()
    assert(hits("println") == 0 && hits("printva") == 0 && hits("printvb") == n)
    g1.unpersist()
  }

  test("reversed-token field: leading wildcard == exact-term match set; " +
    "content expansions never leak rev terms; CheckIndex clean") {
    val dir = SparkSuite.tmpDir("graft-rev")
    IndexBuilder.build(spark, input, dir, cfg.copy(reverseTokens = true))
    val r = new IndexReader(spark, dir, cfg.numBuckets, cacheData = false)
    assert(r.hasReverseField)
    val viaRev = new JoinScorer(r)
      .scores(BoolQ(Seq((Occur.Should, WildcardQ("*intln")))))
      .map(_._1).collect().toSet
    val exact = new JoinScorer(r)
      .scores(BoolQ(Seq((Occur.Must, TermQ("println")))))
      .map(_._1).collect().toSet
    assert(viaRev.nonEmpty && viaRev == exact)
    // a content prefix expansion must not pick up rev:/path: dictionary
    // entries (fieldGuard)
    val pfx = new JoinScorer(r)
      .scores(BoolQ(Seq((Occur.Should, PrefixQ("r")))))
      .map(_._1).collect()
    assert(pfx.nonEmpty)
    CheckIndex.run(r, Some(input)).collect()
      .foreach(c => assert(c.violations == 0L, s"rev check ${c.check}"))
  }

  test("write.lock: a concurrent writer fails fast; unlock clears a " +
    "stale crash lock; the lock releases after a successful mutation") {
    val dir = SparkSuite.tmpDir("graft-lock")
    build(dir)
    Files.createFile(Paths.get(dir, "write.lock"))
    val q = BoolQ(Seq((Occur.Must, TermQ("println"))))
    val e = intercept[IllegalStateException] {
      IndexBuilder.deleteByQuery(spark, dir, cfg, q)
    }
    assert(e.getMessage.contains("write.lock"))
    assert(IndexBuilder.unlock(dir))
    assert(IndexBuilder.deleteByQuery(spark, dir, cfg, q) > 0)
    assert(!Files.exists(Paths.get(dir, "write.lock")), "lock released")
  }

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f =>
        Files.deleteIfExists(f))
}
