package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.{Analyzer, StopSets}
import graft.codec.{PostingBlock, Posting, PostingsCodec, PrePosting, SmallFloat}
import graft.search.BM25

/** Batch inverted-index build: input table -> per-partition segments ->
  * docmeta/stats -> global term-partitioned compressed postings.
  *
  * Spark-first design (SURVEY.md §7): the per-doc invert is a single
  * `mapPartitions` pass (the DefaultIndexingChain analog); the global merge
  * is ONE sort-merge shuffle `repartition(hash(bucket, salt)) +
  * sortWithinPartitions(term, docId)` (the SegmentMerger k-way merge analog,
  * lucene/core/src/java/org/apache/lucene/index/SegmentMerger.java:74-140);
  * hot terms (df >= hotDfThreshold) are salted by docId-range chunk so one
  * Zipfian term ("import", "return") cannot pin a single task — chunks are
  * disjoint docId ranges, so concatenating their self-contained blocks in
  * firstDoc order IS the merged posting list (the docBase-concatenation
  * trick of codecs/FieldsConsumer.java:90-100).
  *
  * The build is resumable: every stage (and every postings wave) writes a
  * lineage JSON marker after its data commits; a re-run skips completed
  * stages. docIds derive from a fixed hash-partitioning + canonical sort,
  * never from runtime state, so resumed builds are byte-identical.
  */
object IndexBuilder {

  private val sha = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("SHA-256"))

  private val HexDigits = "0123456789abcdef".toCharArray

  def sha256Hex(s: String): String = {
    val d = sha.get().digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](64)
    var i = 0
    while (i < 32) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Path-field analysis: lowercase, split on any non-alphanumeric run
    * (path separators, dots, dashes). A keyword-ish chain — code-search
    * users match path SEGMENTS ("src", "scala", file stems). */
  def pathTokens(path: String): Array[String] =
    path.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Indexed-term key of a path token (reference per-field term spaces,
    * index/FieldInfos.java — here encoded by key prefix). */
  def pathTerm(token: String): String = "path:" + token

  /** Reversed-token term key (reference
    * solr/core/src/java/org/apache/solr/analysis/ReversedWildcardFilterFactory.java,
    * lucene/analysis/common/.../reverse/ReverseStringFilter.java): the
    * "rev:" field carries each content token reversed, so a leading
    * wildcard becomes a prefix scan of this dictionary. */
  def revTerm(token: String): String = "rev:" + token.reverse

  def fieldOfTerm(term: String): String =
    if (term.startsWith("path:")) "path" else "content"

  /** Merge one reduce-side run of same-(key, salt) pre-blocks into a
    * docId-ascending posting stream for the canonical re-encode. Map
    * partitions are file-chunk bin-packs over docId-sorted segments
    * files, so two partitions' spans are almost always disjoint: the fast
    * path concatenates in firstDoc order. If bin-packing ever interleaves
    * chunk ranges, the fallback decodes the run and merge-sorts by docId
    * (each pre-block is individually ascending, so TimSort sees
    * mostly-sorted input). Memory is bounded by one (key, salt) run —
    * the same bound the round-4 reduce buffer had, but compressed. */
  private[index] def mergeRuns(
      run: scala.collection.Seq[BlockRowK]): Iterator[Posting] = {
    val sorted = run.sortBy(_.firstDoc)
    var disjoint = true
    var i = 1
    while (disjoint && i < sorted.length) {
      if (sorted(i - 1).lastDoc >= sorted(i).firstDoc) disjoint = false
      i += 1
    }
    def dec(b: BlockRowK): Array[Posting] =
      PostingsCodec.decode(PostingBlock("", b.firstDoc, b.lastDoc, b.count,
        b.maxTf, b.sumTf, b.maxPartial, b.docBytes, b.nrmBytes, b.posBytes))
    if (disjoint) sorted.iterator.flatMap(b => dec(b).iterator)
    else sorted.toArray.flatMap(dec).sortBy(_.docId).iterator
  }

  /** Analyze one document into a SegmentDoc (terms grouped in-memory per
    * row — within-doc grouping needs no shuffle). `analyzer` selects the
    * chain: "standard" = per-row-lang StandardAnalyzer; "english" = the
    * EnglishAnalyzer chain (possessive strip + English stop set + Porter
    * stem, reference en/EnglishAnalyzer.java:101-116); "german" /
    * "spanish" / "italian" / "french" = that language's stop set + light
    * stemmer (reference de/GermanAnalyzer.java etc.). */
  /** The configured chain as a flat (terms, positions) function.
    * `noStops` drops stopword filtering — synonym rule compilation runs
    * the chain WITHOUT stops (the reference's SynonymMap.Builder analyzes
    * rule text with the index analyzer; rules are matched pre-StopFilter
    * in the canonical chain order). */
  def chainFlat(analyzer: String, lang: String, content: String,
                maxTokenLength: Int,
                noStops: Boolean = false): (Array[String], Array[Int]) = {
    @inline def stops(iso: String): Set[String] =
      if (noStops) Set.empty else StopSets.forLang(iso)
    analyzer match {
      case "standard" =>
        Analyzer.analyzeFlat(content, stops(lang), maxTokenLength)
      case "english" =>
        Analyzer.analyzeEnglishFlat(content, stops("en"), maxTokenLength)
      case "kstem" => // EnglishAnalyzer shape with KStemFilter (Solr
        // KStemFilterFactory) instead of PorterStemFilter
        Analyzer.analyzeEnglishFlat(content, stops("en"),
          maxTokenLength, stem = graft.analysis.KStem.stem)
      case "cjk" =>
        Analyzer.analyzeCjkFlat(content, Set.empty, maxTokenLength)
      case "thai" => // dictionary BreakIterator segmentation (th has no
        // word delimiters; reference th/ThaiAnalyzer.java:101)
        graft.analysis.Thai.analyzeFlat(content, stops("th"))
      case "smartcn" => // lexicon-DP Chinese word segmentation (reference
        // smartcn/SmartChineseAnalyzer.java chain)
        graft.analysis.SmartChinese.analyzeFlat(content,
          if (noStops) Set.empty else graft.analysis.SmartChinese.stopSet)
      case "japanese" => // lexicon-DP Japanese word segmentation over the
        // kuromoji FST surface lexicon (reference ja/JapaneseAnalyzer
        // chain minus the cost-table stages — see analysis/Japanese)
        graft.analysis.Japanese.analyzeFlat(content,
          if (noStops) Set.empty else graft.analysis.Japanese.stopSet)
      case other =>
        val (iso, stem) = graft.analysis.LightStemmers.byName(other)
        // fr/it chains run ElisionFilter before lowercase, like the
        // reference analyzers (no-op on apostrophe-free corpora); the ga
        // chain adds IrishLowerCaseFilter and the HYPHENATIONS {h,n,t}
        // stray-token stop set (ga/IrishAnalyzer.java:142-150)
        val pre: String => String = other match {
          case "french" => graft.analysis.MiscFilters.elision(_,
            graft.analysis.MiscFilters.FrenchArticles)
          case "italian" => graft.analysis.MiscFilters.elision(_,
            graft.analysis.MiscFilters.ItalianArticles)
          case "catalan" => graft.analysis.MiscFilters.elision(_,
            graft.analysis.MiscFilters.CatalanArticles)
          case "irish" => t => graft.analysis.MiscFilters.irishLowerCase(
            graft.analysis.MiscFilters.elision(t,
              graft.analysis.MiscFilters.IrishArticles))
          case _ => identity
        }
        val stopSet =
          if (other == "irish" && !noStops) stops(iso) ++ Set("h", "n", "t")
          else stops(iso)
        Analyzer.analyzeLightFlat(content, stopSet, stem,
          maxTokenLength, pre = pre)
    }
  }

  def invertDoc(docId: Long, docPart: Int, repo: String, path: String,
                commit: String, lang: String, content: String,
                maxTokenLength: Int, analyzer: String = "standard",
                reverseTokens: Boolean = false,
                synRules: Seq[Analyzer.SynRule] = Nil,
                compoundDict: Set[String] = Set.empty): SegmentDoc = {
    val (terms0, positions0) =
      chainFlat(analyzer, lang, content, maxTokenLength)
    // index-time synonym injection (posInc=0 overlaps); dl counts
    // DISTINCT positions so injected tokens don't inflate the norm
    val (terms1, positions1, dl1) =
      if (synRules.isEmpty) (terms0, positions0, terms0.length)
      else Analyzer.applySynonymsFlat(terms0, positions0, synRules)
    // compound decomposition injects subwords at the compound's position
    // under the same overlap contract
    val (terms, positions, dl) =
      if (compoundDict.isEmpty) (terms1, positions1, dl1)
      else {
        val (t, p, _) = graft.analysis.CompoundWords.applyFlat(
          terms1, positions1, compoundDict)
        (t, p, dl1)
      }
    // group by term via an index sort ordered by (term, position) — the
    // position tiebreak guarantees positions ascend within each term run
    // even when synonym/compound injection emits tokens out of position
    // order. Primitive int sort: the previous Integer[] boxing
    // allocated ~nTok objects per doc, pure GC churn at 2M docs/build.
    // nTok = emitted tokens INCLUDING synonym overlaps; dl = distinct
    // positions (the norm length) — they differ only under synonyms.
    val nTok = terms.length
    val idx = new Array[Int](nTok)
    var i = 0
    while (i < nTok) { idx(i) = i; i += 1 }
    sortIdxByTerm(idx, terms, positions, 0, nTok - 1)
    val postings = new scala.collection.mutable.ArrayBuffer[SegPosting](
      math.min(nTok, 64))
    i = 0
    while (i < nTok) {
      val t = terms(idx(i))
      var j = i + 1
      while (j < nTok && terms(idx(j)) == t) j += 1
      // pb = VInt(tf) ++ delta-VByte positions, sized exactly (two cheap
      // passes beat a growable buffer + copy-out in this hot loop)
      val tf = j - i
      var size = graft.codec.VByte.sizeVInt(tf)
      var prevPos = 0
      var k = i
      while (k < j) {
        val p = positions(idx(k))
        size += graft.codec.VByte.sizeVInt(p - prevPos); prevPos = p; k += 1
      }
      val pb = new Array[Byte](size)
      var off = graft.codec.VByte.putVInt(pb, 0, tf)
      prevPos = 0
      k = i
      while (k < j) {
        val p = positions(idx(k))
        off = graft.codec.VByte.putVInt(pb, off, p - prevPos); prevPos = p; k += 1
      }
      postings += SegPosting(t, pb)
      // rev field shares the content pb (same tf/positions; the doc's
      // content norm rides along at merge time), so the extra field is
      // pure posting volume, no re-encode
      if (reverseTokens) postings += SegPosting(revTerm(t), pb)
      i = j
    }
    // path field: its own term space ("path:"-prefixed), positions and
    // (pdl, pnorm) independent of the content field's
    val ptoks = pathTokens(path)
    val pdl = ptoks.length
    ptoks.zipWithIndex.groupBy(_._1).toSeq.sortBy(_._1).foreach {
      case (tok, occs) =>
        postings += SegPosting(pathTerm(tok), pbOf(occs.map(_._2)))
    }
    SegmentDoc(docId, docPart, repo, path, commit, lang, dl,
      SmallFloat.normByte(dl), pdl, SmallFloat.normByte(pdl),
      sha256Hex(content), postings.toArray)
  }

  /** SegPosting.pb of an ascending positions array: VInt(tf) ++ deltas. */
  private def pbOf(poss: Array[Int]): Array[Byte] = {
    val tf = poss.length
    var size = graft.codec.VByte.sizeVInt(tf)
    var prev = 0
    var k = 0
    while (k < tf) { size += graft.codec.VByte.sizeVInt(poss(k) - prev); prev = poss(k); k += 1 }
    val pb = new Array[Byte](size)
    var off = graft.codec.VByte.putVInt(pb, 0, tf)
    prev = 0
    k = 0
    while (k < tf) { off = graft.codec.VByte.putVInt(pb, off, poss(k) - prev); prev = poss(k); k += 1 }
    pb
  }

  /** In-place quicksort of `idx[lo..hi]` ordered by (terms(i), i). The
    * index tiebreak makes the comparator a total order, so the
    * (unstable) quicksort yields exactly the order the boxed stable sort
    * did. Insertion sort below 16 elements. */
  private def sortIdxByTerm(idx: Array[Int], terms: Array[String],
                            positions: Array[Int],
                            lo0: Int, hi0: Int): Unit = {
    // tiebreak by POSITION, not emission index: synonym/compound injection
    // can emit a term at an earlier position than a later original token
    // (e.g. usa->"united states of america" then an original "america"),
    // and the position-delta encoder below requires positions ascending
    // within each term run — an emission-index tiebreak would write a
    // negative delta whose VInt round-trips into an unsorted position
    // array that phrase/span matchers silently mis-handle.
    @inline def less(a: Int, b: Int): Boolean = {
      val c = terms(a).compareTo(terms(b))
      c < 0 || (c == 0 && (positions(a) < positions(b) ||
        (positions(a) == positions(b) && a < b)))
    }
    var stack = List((lo0, hi0))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.head
      stack = stack.tail
      if (hi - lo < 16) {
        var i = lo + 1
        while (i <= hi) {
          val v = idx(i)
          var j = i - 1
          while (j >= lo && less(v, idx(j))) { idx(j + 1) = idx(j); j -= 1 }
          idx(j + 1) = v
          i += 1
        }
      } else {
        // median-of-three pivot
        val mid = (lo + hi) >>> 1
        if (less(idx(mid), idx(lo))) { val t = idx(lo); idx(lo) = idx(mid); idx(mid) = t }
        if (less(idx(hi), idx(lo))) { val t = idx(lo); idx(lo) = idx(hi); idx(hi) = t }
        if (less(idx(hi), idx(mid))) { val t = idx(mid); idx(mid) = idx(hi); idx(hi) = t }
        val pivot = idx(mid)
        var i = lo
        var j = hi
        while (i <= j) {
          while (less(idx(i), pivot)) i += 1
          while (less(pivot, idx(j))) j -= 1
          if (i <= j) {
            val t = idx(i); idx(i) = idx(j); idx(j) = t
            i += 1; j -= 1
          }
        }
        if (lo < j) stack = (lo, j) :: stack
        if (i < hi) stack = (i, hi) :: stack
      }
    }
  }

  // ---- stage markers / lineage ----

  def markerPath(dir: String, stage: String): java.nio.file.Path =
    Paths.get(dir, "_lineage", s"$stage.json")

  def stageDone(dir: String, stage: String): Boolean =
    Files.exists(markerPath(dir, stage))

  /** Per-stage wall times of the most recent build in this JVM (driver
    * side; for scaling evidence — the per-stage 8-vs-32 ratios show
    * WHERE the machine ceiling bites). */
  private val stageTimes =
    new scala.collection.concurrent.TrieMap[String, Double]
  def lastStageTimes: Map[String, Double] = stageTimes.toMap
  def resetStageTimes(): Unit = stageTimes.clear()

  /** Wall-time a build stage; one line per stage on stderr (the
    * stage-level metrics the north rule's lineage markers carry). */
  private def timed[T](stage: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    val sec = (System.nanoTime() - t0) / 1e9
    stageTimes.put(stage, sec)
    System.err.println(f"[build] $stage%-16s $sec%6.2fs")
    r
  }

  def writeMarker(dir: String, stage: String, metrics: Map[String, Long]): Unit = {
    val p = markerPath(dir, stage)
    Files.createDirectories(p.getParent)
    val body = metrics.map { case (k, v) => s""""$k": $v""" }
      .mkString("{", ", ", s""", "stage": "$stage", "schemaVersion": 1}""")
    Files.writeString(p, body)
  }

  /** Full build. `input` must have columns repo, path, commit, lang,
    * content (extra columns ignored). If it also has an int `docPart`
    * column (values in [0, cfg.numDocParts)), that fixes the doc-side
    * partition; docId = (docPart << 40) | rank-within-docPart where rank
    * follows the canonical (repo, path, commit) sort — so a docPart that is
    * monotone in the caller's ordering yields internal docIds
    * order-isomorphic to it. Without the column, docPart =
    * pmod(hash(repo,path,commit), numDocParts) (Solr's murmur3 doc routing,
    * solr/solrj/.../CompositeIdRouter.java:55). Either way the assignment
    * is a pure function of the data — independent of runtime partitioning,
    * so a resumed build is byte-identical. Returns the index directory. */
  def build(spark: SparkSession, input: DataFrame, dir: String,
            cfg: IndexConfig = IndexConfig()): String = {
    import spark.implicits._

    // ---- stage 1: segments (invert; doc-partitioned forward index) ----
    val segPath = s"$dir/segments"
    if (!stageDone(dir, "segments")) timed("segments") {
      val maxTok = cfg.maxTokenLength
      val analyzerName = cfg.analyzer
      val revTok = cfg.reverseTokens
      val synRules = Analyzer.compileSynonyms(cfg.synonyms,
        chainFlat(cfg.analyzer, "en", _, cfg.maxTokenLength,
          noStops = true)._1)
      val compDict = graft.analysis.CompoundWords.compileDict(cfg.compoundDict)
      val nParts = cfg.numDocParts
      val parted = (
        if (input.columns.contains("docPart"))
          input.select($"docPart".cast("int"), $"repo", $"path", $"commit",
            $"lang", $"content")
        else input.select(
          pmod(hash($"repo", $"path", $"commit"), lit(nParts)).as("docPart"),
          $"repo", $"path", $"commit", $"lang", $"content"))
        .as[PartedDocInput]
      val segs = parted
        .repartition(cfg.numDocParts, $"docPart")
        .sortWithinPartitions($"docPart", $"repo", $"path", $"commit")
        .mapPartitions { it =>
          // one physical partition may hold several docPart groups (hash
          // collisions); the sort above groups them, so a group change
          // resets the within-group rank — no TaskContext dependence.
          var cur = Int.MinValue
          var idx = 0L
          it.map { d =>
            if (d.docPart < 0 || d.docPart >= nParts)
              throw new IllegalArgumentException(
                s"docPart ${d.docPart} outside [0, $nParts)")
            if (d.docPart != cur) { cur = d.docPart; idx = 0L }
            val sd = invertDoc(Ids.docId(cur, idx), cur, d.repo, d.path,
              d.commit, d.lang, d.content, maxTok, analyzerName, revTok,
              synRules, compDict)
            idx += 1
            sd
          }
        }
      val docsAcc = spark.sparkContext.longAccumulator("graft.docs")
      val tokAcc = spark.sparkContext.longAccumulator("graft.tokens")
      segs.map { s => docsAcc.add(1); tokAcc.add(s.dl); s }
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(segPath)
      writeMarker(dir, "segments",
        Map("docs" -> docsAcc.value, "tokens" -> tokAcc.value))
    }
    lazy val segments = spark.read.parquet(segPath).as[SegmentDoc]
    // No separate docmeta stage: readers get docmeta by column-pruned
    // parquet scans of segments/ (the postings column chunks are never
    // read), so the build skips a full rewrite of every stored field.

    // ---- stage 2: collection stats (one pruned int-column scan) ----
    // NOT taken from the segments accumulators: accumulator values can
    // double-count under task retries/speculation, and avgdl must be
    // EXACT for rank identity.
    if (!stageDone(dir, "collstats")) timed("collstats") {
      val row = segments.agg(count(lit(1)), coalesce(sum($"dl"), lit(0L)),
        coalesce(sum($"pdl"), lit(0L))).head()
      val cs = CollStats(row.getLong(0), row.getLong(1))
      Seq(cs).toDS().write.mode("overwrite").parquet(s"$dir/collstats")
      Seq(FieldStats("content", row.getLong(1)),
        FieldStats("path", row.getLong(2))).toDS()
        .write.mode("overwrite").parquet(s"$dir/fieldstats")
      writeMarker(dir, "collstats",
        Map("maxDoc" -> cs.maxDoc, "sumTotalTermFreq" -> cs.sumTotalTermFreq,
          "pathSumTtf" -> row.getLong(2)))
    }
    val collStats = spark.read.parquet(s"$dir/collstats").as[CollStats].head()
    val pathSumTtf = spark.read.parquet(s"$dir/fieldstats").as[FieldStats]
      .collect().find(_.field == "path").map(_.sumTtf).getOrElse(0L)

    // ---- hot terms for salting: sampled df estimate ----
    // A term is hot when df >= hotDfThreshold; a deterministic doc sample
    // sized so a threshold-df term is expected >= 500 times finds the hot
    // set without exploding every posting (hot/not-hot affects only block
    // layout and skew, never results — IndexMaintenanceSpec proves both
    // extremes identical). Sample seed is fixed, the sampled frame is the
    // committed segments parquet, so resumes see the same hot set.
    // LAZY: the sampled scan + driver collect runs only when a postings
    // wave actually needs the hot set — an idempotent re-delivery of an
    // already-completed build (every wave marker present) skips it
    // entirely instead of re-scanning segments on every resume
    lazy val hotTerms: Set[String] = timed("hotterms") {
      val hs =
        if (cfg.hotDfThreshold > collStats.maxDoc) Set.empty[String]
        else {
          val f = math.min(1.0, 500.0 / cfg.hotDfThreshold)
          val sampled = if (f >= 1.0) segments else segments.sample(f, 42L)
          val minC = math.max(1L, math.ceil(cfg.hotDfThreshold * f).toLong)
          sampled.select(explode($"postings.term").as("term"))
            .groupBy($"term").agg(count(lit(1)).as("c"))
            .where($"c" >= minC)
            .select("term").as[String].collect().toSet
        }
      if (!stageDone(dir, "hotterms"))
        writeMarker(dir, "hotterms", Map("count" -> hs.size.toLong))
      hs
    }

    // ---- stage 4: global merge -> compressed blocks, per wave ----
    // per-field norm caches: the WAND bound (maxPartial) must be computed
    // with the same float ops AND the same field avgdl the query path uses
    val avgdl = BM25.avgFieldLength(collStats.sumTotalTermFreq, collStats.maxDoc)
    val cacheB = spark.sparkContext.broadcast(BM25.cache(avgdl))
    val pathCacheB = spark.sparkContext.broadcast(
      BM25.cache(BM25.avgFieldLength(pathSumTtf, collStats.maxDoc)))
    var w = 0
    while (w < cfg.waves) {
      val stage = s"postings_wave_$w"
      if (!stageDone(dir, stage)) timed(stage) {
        val shift = cfg.saltShift
        val waves = cfg.waves
        val postAcc = spark.sparkContext.longAccumulator("graft.postings")
        val blockAcc = spark.sparkContext.longAccumulator("graft.blocks")
        // waves own CONTIGUOUS docPart ranges: block docId-spans must stay
        // disjoint across waves (same invariant as salt chunks)
        val partsPerWave = (cfg.numDocParts + waves - 1) / waves
        // Shuffle key = (termKey, salt): hashing keys spreads the merge
        // over ALL shuffle partitions at any parallelism, and salt still
        // splits hot terms into disjoint docId-range chunks. The row is
        // (key: Long, docId, pb, norm) — NO term string: the 63-bit
        // TermKeys key (field bit included) replaces the var-length term
        // bytes, cutting both the exchanged bytes and, more importantly,
        // the sort cost — (key, docId) sorts on Spark's 8-byte radix
        // prefix, where term strings fell back to byte-wise comparisons
        // on every shared prefix ("path:", common stems). Term text is
        // recovered ONLY in the dictionary stage (from the segments'
        // vocabulary) and at read time (from the query's own terms) —
        // the Lucene posture: postings files are keyed by term ord, the
        // .tim dictionary owns the bytes. Key locality for reads comes
        // from the within-partition (key, docId) sort: every file is
        // key-sorted, so parquet row-group min/max stats prune term
        // lookups (the BlockTree-seek analog). salt is a pure
        // PARTITIONING expression (hot set tiny by construction:
        // |hot| <= sumTtf/hotDfThreshold) — it steers the hash exchange
        // but is NOT materialized into the shuffled row; the encoder
        // re-derives it from (key, docId). tf rides inside pb (its VInt
        // prefix).
        val hotKeys: Set[Long] = hotTerms.map(TermKeys.of)
        val hotKeySeq = hotKeys.toSeq
        val hotB = spark.sparkContext.broadcast(hotKeys)
        // ---- map side: LOCAL (key, docId) sort + pre-block encode ----
        // Rounds 1-4 shuffled one Tungsten row PER POSTING: ~48 B of row
        // framing (null bits, fixed slots, var-length offsets) around a
        // ~4 B payload — 1558 B/doc on the wire. Now each map partition
        // sorts locally (sortWithinPartitions = spillable
        // UnsafeExternalSorter, NO exchange) and VByte-encodes 128-posting
        // PRE-BLOCKS, so the exchange carries the compressed postings
        // payload itself: row count drops ~100x for frequent terms and the
        // bytes are the codec's, not the row format's. maxPartial is NOT
        // computed here (cache = null): the reduce side re-derives it
        // during the canonical re-encode, so no float work is wasted on
        // blocks that get re-blocked anyway.
        val preBlocks = segments
          .where($"docPart" >= w * partsPerWave &&
            $"docPart" < (w + 1) * partsPerWave)
          .select($"docId", explode($"postings").as("p"), $"norm", $"pnorm")
          .select(TermKeys.column($"p.term").as("key"), $"docId",
            $"p.pb".as("pb"),
            // each posting carries ITS field's norm byte
            when($"p.term".startsWith("path:"), $"pnorm").otherwise($"norm")
              .as("norm"))
          .sortWithinPartitions($"key", $"docId")
          .as[(Long, Long, Array[Byte], Byte)]
          .mapPartitions { it0 =>
            // Group consecutive same-(key, salt) runs. A run must break at
            // salt boundaries: salt chunks of a hot term land in different
            // shuffle partitions, and pre-block docId-spans must stay
            // inside ONE salt chunk so the exchange (hashed on the salt of
            // firstDoc) routes the whole block correctly. salt is monotone
            // in docId for one key, so the (key, docId) sort already
            // groups it; the encoder recomputes it per row.
            val hot = hotB.value
            new Iterator[BlockRowK] {
              private val buf = it0.buffered
              private var pending: Iterator[BlockRowK] = Iterator.empty
              private def refill(): Unit = {
                while (!pending.hasNext && buf.hasNext) {
                  val key = buf.head._1
                  val isHot = hot.contains(key)
                  val salt = if (isHot) buf.head._2 >> shift else 0L
                  val run =
                    new scala.collection.mutable.ArrayBuffer[PrePosting]()
                  while (buf.hasNext && buf.head._1 == key &&
                      (!isHot || (buf.head._2 >> shift) == salt)) {
                    val (_, docId, pb, norm) = buf.next()
                    run += PrePosting(docId, norm, pb)
                  }
                  postAcc.add(run.length)
                  pending = PostingsCodec
                    .encodePre("", run.iterator, null)
                    .map(b => BlockRowK(key, b.firstDoc, b.lastDoc, b.count,
                      b.maxTf, b.sumTf, b.maxPartial, b.docBytes, b.nrmBytes,
                      b.posBytes))
                }
              }
              def hasNext: Boolean = { refill(); pending.hasNext }
              def next(): BlockRowK = { refill(); pending.next() }
            }
          }
        // ---- ONE exchange, now carrying compressed pre-blocks ----
        // Hot keys hash on the salt of firstDoc (valid: a pre-block never
        // spans a salt boundary, see above). Reduce groups consecutive
        // same-(key, salt) runs and re-encodes them into the CANONICAL
        // 128-posting block stream — byte-identical to the round-4 output,
        // so every reader/WAND/CheckIndex invariant is untouched. Map
        // partitions are file-chunk bin-packs, so two partitions' doc
        // ranges USUALLY don't interleave (segments files are docId-
        // sorted): the merge concatenates when spans are disjoint in
        // firstDoc order and falls back to a decode-merge-sort otherwise.
        val preSaltCol =
          if (hotKeySeq.isEmpty) lit(0L)
          else when($"key".isin(hotKeySeq: _*), shiftright($"firstDoc", shift))
            .otherwise(0L)
        val blocks = preBlocks
          .repartition(cfg.shufflePartitions, $"key", preSaltCol)
          .sortWithinPartitions($"key", $"firstDoc")
          .mapPartitions { it0 =>
            val hot = hotB.value
            val cache = cacheB.value
            val pathCache = pathCacheB.value
            new Iterator[BlockRowK] {
              private val buf = it0.buffered
              private var pending: Iterator[BlockRowK] = Iterator.empty
              private def refill(): Unit = {
                while (!pending.hasNext && buf.hasNext) {
                  val key = buf.head.key
                  val isHot = hot.contains(key)
                  val salt = if (isHot) buf.head.firstDoc >> shift else 0L
                  val fieldCache =
                    if (TermKeys.isPath(key)) pathCache else cache
                  val run =
                    new scala.collection.mutable.ArrayBuffer[BlockRowK]()
                  while (buf.hasNext && buf.head.key == key &&
                      (!isHot || (buf.head.firstDoc >> shift) == salt)) {
                    run += buf.next()
                  }
                  pending = PostingsCodec
                    .encode("", IndexBuilder.mergeRuns(run), fieldCache)
                    .map { b =>
                      blockAcc.add(1)
                      BlockRowK(key, b.firstDoc, b.lastDoc, b.count,
                        b.maxTf, b.sumTf, b.maxPartial, b.docBytes,
                        b.nrmBytes, b.posBytes)
                    }
                }
              }
              def hasNext: Boolean = { refill(); pending.hasNext }
              def next(): BlockRowK = { refill(); pending.next() }
            }
          }
        // zstd over snappy: ~20% fewer bytes through the (bandwidth-
        // bound) storage/shuffle path for a CPU cost that the scaling
        // bench shows is the better trade at high core counts
        blocks.write.mode("overwrite").option("compression", "zstd")
          .parquet(s"$dir/postings/wave=$w")
        writeMarker(dir, stage,
          Map("postings" -> postAcc.value, "blocks" -> blockAcc.value))
      }
      w += 1
    }

    // ---- stage 5: term dictionary ----
    // Stats re-aggregated from block METADATA keyed by term key
    // (~postings/128 input rows — never a second full posting shuffle);
    // term STRINGS come from the segments' vocabulary (a column-pruned
    // scan of just postings.term with map-side-combined distinct), joined
    // back on the key. This is also where the 62-bit key space is
    // audited: any two distinct terms sharing a key ABORT the build
    // before the `done` marker — a collision would have interleaved two
    // posting lists in the merge, so the index must never be served.
    // (CheckIndex additionally cross-checks the dictionary against fully
    // DECODED postings, so stored block metadata can't drift unnoticed.)
    if (!stageDone(dir, "termstats")) timed("termstats") {
      val nb = cfg.numBuckets
      val keyAgg = spark.read.parquet(s"$dir/postings")
        .groupBy($"key")
        .agg(sum($"count").as("df"), sum($"sumTf").as("ttf"),
          max($"maxTf").as("maxTf"))
      // Term strings come from the pruned postings.term column. Shape
      // matters here: distinct() FIRST (HashAggregate with var-length
      // grouping key and NO aggregation buffers — stays on the fast
      // unsafe hash-map path, dedup happens map-side), THEN the
      // vocab-sized key agg whose min/max(term) buffers force the slower
      // ObjectHashAggregate — measured 2x faster than folding the
      // min/max into the 10^8-row pass. min != max per key <=> two
      // distinct terms share a 62-bit key. Cached so the clash probe and
      // the dictionary join are two actions over one pass.
      val vocab = segments.select(explode($"postings.term").as("term"))
        .distinct()
        .groupBy(TermKeys.column($"term").as("key"))
        .agg(min($"term").as("term"), max($"term").as("termHi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val clash = vocab.where($"term" =!= $"termHi")
        .select($"term", $"termHi").limit(1).collect()
      if (clash.nonEmpty)
        throw new IllegalStateException(
          s"term-key collision: '${clash(0).getString(0)}' and " +
            s"'${clash(0).getString(1)}' share one 62-bit key — the merged " +
            "postings are poisoned; refusing to commit the index")
      vocab.select($"key", $"term").join(keyAgg, Seq("key"))
        .select($"term", $"df", $"ttf", $"maxTf")
        .as[(String, Long, Long, Int)]
        .map { case (t, df, ttf, mtf) =>
          TermStats(t, Buckets.of(t, nb), df, ttf, mtf) }
        // co-locate each bucket into one task before the partitionBy
        // write: without this every agg task writes a sliver of every
        // bucket directory (tasks x buckets tiny files — file-create
        // overhead was ~8% of the whole build and scaled at 0.94x);
        // with it the stage emits exactly numBuckets files. The
        // within-bucket TERM SORT makes each file's parquet row-group
        // min/max stats monotone in term, so prefix/range dictionary
        // expansions (PrefixQ/RangeQ/rev: leading wildcards) prune to
        // the matching row groups instead of scanning the whole
        // dictionary — the difference between O(matches) and O(vocab)
        // IO at a 10^8-term dictionary.
        .repartition($"bucket")
        .sortWithinPartitions($"term")
        .as[TermStats]
        .write.mode("overwrite").option("compression", "zstd")
        .partitionBy("bucket").parquet(s"$dir/termstats")
      vocab.unpersist()
      writeMarker(dir, "termstats", Map())
    }

    if (!stageDone(dir, "done")) writeMarker(dir, "done", Map())
    dir
  }

  /** Append a delta batch as its own SUB-INDEX directory (the NRT
    * soft-commit analog: each micro-batch becomes a new immutable segment
    * set, made visible by re-opening a [[MultiIndexReader]] — reference
    * DirectoryReader.open(IndexWriter), index/DirectoryReader.java:85).
    *
    * `input` must carry a `docPart` column DISJOINT from the base index's
    * and every earlier delta's (callers offset by partsSoFar); that keeps
    * docIds globally unique so the union reader needs no remapping —
    * docBase concatenation again (codecs/FieldsConsumer.java:90-100).
    * Stage markers inside the delta dir make re-delivery of the same
    * batch idempotent (exactly-once sink semantics under foreachBatch
    * retries). */
  def append(spark: SparkSession, input: DataFrame, baseDir: String,
             batchId: Long, cfg: IndexConfig): String = {
    val dir = s"$baseDir/delta_$batchId"
    build(spark, input, dir, cfg)
    dir
  }

  /** Single-writer lock (reference IndexWriter write.lock,
    * index/IndexWriter.java + store/NativeFSLockFactory.java — here a
    * plain atomic-create marker, which is what a driver-coordinated
    * batch pipeline needs): every MUTATING entry point (delete / update
    * / versioned update) runs under it; a second concurrent writer fails
    * fast instead of interleaving tombstone and delta commits. A crash
    * can leave a stale lock — clear it with [[unlock]] (the
    * IndexWriter.unlock analog) once no writer is running. */
  def withWriteLock[T](dir: String)(f: => T): T = {
    val lock = Paths.get(dir, "write.lock")
    try Files.createFile(lock)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"index $dir is locked by another writer (write.lock present); " +
            "if no writer is running this is a stale crash lock — clear " +
            "it with IndexBuilder.unlock(dir)")
    }
    try f finally Files.deleteIfExists(lock)
  }

  /** Remove a stale write.lock (IndexWriter.unlock analog). */
  def unlock(dir: String): Boolean =
    Files.deleteIfExists(Paths.get(dir, "write.lock"))

  /** Tombstone deletes (reference IndexWriter.deleteDocuments +
    * per-segment live-docs, index/IndexWriter.java / LiveDocsFormat):
    * append the docIds to `dir/deletes`; readers opened afterwards
    * anti-join them out of every result. Statistics intentionally keep
    * counting deleted docs until [[compact]] purges them — exactly the
    * reference's pre-merge semantics. Returns the number written. */
  def deleteDocs(spark: SparkSession, dir: String, docIds: DataFrame): Long =
    withWriteLock(dir) { deleteDocsLocked(spark, dir, docIds) }

  private def deleteDocsLocked(spark: SparkSession, dir: String,
                               docIds: DataFrame): Long = {
    import org.apache.spark.sql.functions.col
    // Materialize BEFORE the append: for delete-by-query the input plan
    // scans this index's own deletes dir, and Spark's recache-by-path
    // would re-evaluate the lazy plan against the post-write state (the
    // just-written tombstones anti-join themselves out and the returned
    // count under-reports) — same defense as updateDocsVersioned.
    val ids = docIds.select(col("docId").cast("long").as("docId"))
      .localCheckpoint(true)
    val n = ids.count()
    ids.write.mode("append").parquet(s"$dir/deletes")
    n
  }

  /** Delete-by-query (IndexWriter.deleteDocuments(Query)): every doc the
    * boolean query matches gets a tombstone. The reader must be a fresh
    * open over `dir` (the caller's serving reader keeps its point-in-time
    * view). */
  def deleteByQuery(spark: SparkSession, dir: String, cfg: IndexConfig,
                    q: graft.search.BoolQ): Long = withWriteLock(dir) {
    import spark.implicits._
    // whole-collection scope (Solr deleteByQuery): base PLUS every
    // committed delta sub-index — a bare IndexReader(dir) would silently
    // skip docs living in appended deltas
    val r = MultiIndexReader.open(spark, dir, cfg.numBuckets,
      cacheData = false)
    val matched = new graft.search.JoinScorer(r).scores(q)
      .map(_._1).toDF("docId")
    deleteDocsLocked(spark, dir, matched)
  }

  /** Atomic update (IndexWriter.updateDocument(Term, doc),
    * index/IndexWriter.java — Solr's atomic-update path resolves to the
    * same delete-by-term + add): tombstone every existing doc whose
    * unique key (repo, path) appears in `input`, then commit the new
    * versions as a delta sub-index. Old versions leave results at the
    * next reader open but keep counting in statistics until [[compact]]
    * merges them away — reference pre-merge semantics. `input` rows must
    * use FRESH docParts (disjoint from every committed sub-index), since
    * new versions get new internal docIds exactly as in Lucene. Returns
    * the delta dir. */
  def updateDocs(spark: SparkSession, baseDir: String, input: DataFrame,
                 cfg: IndexConfig): String =
    withWriteLock(baseDir) { updateDocsLocked(spark, baseDir, input, cfg) }

  private def updateDocsLocked(spark: SparkSession, baseDir: String,
                               input: DataFrame, cfg: IndexConfig): String = {
    import org.apache.spark.sql.functions.col
    val r = MultiIndexReader.open(spark, baseDir, cfg.numBuckets,
      cacheData = false)
    val old = r.docmeta.toDF()
      .join(input.select(col("repo"), col("path")).distinct(),
        Seq("repo", "path"), "left_semi")
      .select(col("docId"))
    deleteDocsLocked(spark, baseDir, old)
    // max-id+1, not count: tiered compaction leaves numbering holes
    append(spark, input, baseDir, nextDeltaId(baseDir), cfg)
  }

  /** Optimistic-concurrency update (Solr _version_ semantics,
    * solr/update/processor/DistributedUpdateProcessor.java optimistic
    * locking — our content hash plays the _version_ role): each `input`
    * row carries `expectCommit`, the commit the caller believes is the
    * LIVE version of its (repo, path) key. Rows whose expectation matches
    * are applied atomically via [[updateDocs]]; stale rows (live version
    * moved, or doc deleted/absent) are REJECTED, exactly as Solr returns
    * HTTP 409. Returns (applied, conflicted). */
  def updateDocsVersioned(spark: SparkSession, baseDir: String,
                          input: DataFrame, cfg: IndexConfig): (Long, Long) =
      withWriteLock(baseDir) {
    import org.apache.spark.sql.functions.{col, max => fmax, struct}
    val r = MultiIndexReader.open(spark, baseDir, cfg.numBuckets,
      cacheData = false)
    val dm = r.docmeta.toDF()
    val liveRows = r.deletedDocs match {
      case None => dm
      case Some(d) => dm.join(d, Seq("docId"), "left_anti")
    }
    // newest live version per key (max docId wins, as in realtimeGet)
    val live = liveRows.groupBy(col("repo"), col("path"))
      .agg(fmax(struct(col("docId"), col("commit"))).as("v"))
      .select(col("repo"), col("path"), col("v.commit").as("liveCommit"))
    val joined = input.join(live, Seq("repo", "path"), "left")
    // localCheckpoint SEVERS the plan's dependency on the index files:
    // updateDocs is about to write new tombstones to baseDir/deletes, and
    // Spark's recache-by-path would otherwise re-evaluate this lazy plan
    // against the post-delete state (every expectation then looks stale
    // and the delta silently builds empty).
    val ok = joined.where(col("expectCommit") === col("liveCommit"))
      .drop("expectCommit", "liveCommit")
      .localCheckpoint(true)
    val nOk = ok.count()
    val nConflict = joined.count() - nOk
    if (nOk > 0) updateDocsLocked(spark, baseDir, ok, cfg)
    (nOk, nConflict)
  }

  /** Compact a base index + its appended deltas into one fresh index at
    * `outDir`, PURGING tombstoned docs (the TieredMergePolicy merge
    * analog, index/TieredMergePolicy.java — here a single full merge,
    * which is what a batch pipeline wants: deltas accumulate between
    * compactions, one shuffle folds them). docIds are preserved, so
    * callers' references stay valid; collection/term statistics are
    * recomputed over the SURVIVING docs only (post-merge reference
    * semantics — scores shift exactly as Lucene's do after a merge with
    * deletes). Implementation: union the already-inverted segment rows
    * (no re-analysis), anti-join tombstones, then run the standard
    * stats/merge stages over the combined forward index. */
  def compact(spark: SparkSession, baseDir: String, outDir: String,
              cfg: IndexConfig): String = {
    import org.apache.spark.sql.functions.col
    val dirs = subIndexDirs(baseDir)
    val segs = dirs.map(d => spark.read.parquet(s"$d/segments"))
      .reduce(_ unionByName _)
    val dels = dirs
      .filter(d => Files.exists(Paths.get(d, "deletes")))
      .map(d => spark.read.parquet(s"$d/deletes").select(col("docId")))
    val live =
      if (dels.isEmpty) segs
      else segs.join(dels.reduce(_ union _), Seq("docId"), "left_anti")
    live.write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$outDir/segments")
    writeMarker(outDir, "segments", Map())
    // stage 1 is committed above, so build() runs only stats + merge
    build(spark, spark.emptyDataFrame, outDir, cfg)
  }

  /** Shard split (SolrCloud SPLITSHARD — solr/core/src/java/org/apache/
    * solr/handler/admin/CollectionsHandler.java SPLITSHARD +
    * lucene/misc/.../IndexSplitter posture): split one index into two
    * independently searchable children at a docId boundary. Like the
    * reference, the children's postings are REBUILT per sub-range — here
    * by filtering the per-doc segment rows (a columnar scan, the cheap
    * part) and re-running only the stats + merge stages per child; docIds
    * are preserved, so a MultiIndexReader over both children is
    * float/rank-identical to the parent (global stats come from the union
    * — the same mechanism the NRT append view uses). Pending deletes
    * follow their docs into the matching child. */
  def splitShard(spark: SparkSession, baseDir: String,
                 outLo: String, outHi: String, midDocId: Long,
                 cfg: IndexConfig): (String, String) = {
    import org.apache.spark.sql.functions.col
    // whole-collection scope like compact(): union base + delta
    // sub-indexes so appended docs and their tombstones follow the split
    // (a bare baseDir read would silently drop every delta doc from both
    // children and could resurrect delta-tombstoned docs)
    val allDirs = subIndexDirs(baseDir)
    val segs = allDirs.map(d => spark.read.parquet(s"$d/segments"))
      .reduce(_ union _)
    val delDirs = allDirs.filter(d => Files.exists(Paths.get(d, "deletes")))
    val dels =
      if (delDirs.isEmpty) None
      else Some(delDirs.map(d => spark.read.parquet(s"$d/deletes"))
        .reduce(_ union _).distinct())
    Seq(outLo -> (col("docId") < midDocId),
        outHi -> (col("docId") >= midDocId)).foreach { case (out, pred) =>
      segs.where(pred).write.mode("overwrite")
        .option("compression", "zstd").parquet(s"$out/segments")
      writeMarker(out, "segments", Map())
      dels.foreach(_.where(pred).write.mode("overwrite")
        .parquet(s"$out/deletes"))
      build(spark, spark.emptyDataFrame, out, cfg)
    }
    (outLo, outHi)
  }

  /** MultiPassIndexSplitter part assignment (reference misc/.../index/
    * MultiPassIndexSplitter.java:70-100): the doc's ordinal j in docID
    * order maps to a part — seq: part i covers ordinals
    * [i*partLen, (i+1)*partLen) with the LAST part absorbing the
    * remainder (partLen = maxDoc / numParts); round-robin (seq=false):
    * part = j % numParts (the reference keeps doc j in part i when
    * (j + numParts - i) % numParts == 0). Tombstoned docs keep their
    * ordinal slot upstream of this call but survive in no part (the
    * reference's FakeDeleteLeafIndexReader re-applies the original
    * liveDocs on every undeleteAll).
    *
    * The global ordinal is computed scale-safe: sort the (docId) column
    * and zipWithIndex per partition with partition offsets — a narrow
    * single-column sort, never a one-task window. */
  def multiPassAssign(docIds: org.apache.spark.sql.DataFrame, numParts: Int,
                      seq: Boolean): org.apache.spark.sql.DataFrame = {
    require(numParts >= 2, "Invalid number of outputs.")
    val spark = docIds.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod, floor, least}
    val ords = docIds.select(col("docId").cast("long")).distinct()
      .orderBy("docId").as[Long].rdd
      .zipWithIndex().toDF("docId", "j")
    val maxDoc = ords.count()
    require(maxDoc >= 2, "Not enough documents for splitting")
    val partLen = maxDoc / numParts
    val part =
      if (seq) {
        // ordinal / partLen, capped so the remainder stays in the last
        // part; partLen 0 (fewer docs than parts) degenerates to the
        // reference behavior of everything landing in the last part
        if (partLen == 0L) lit((numParts - 1).toLong)
        else least(floor(col("j") / lit(partLen)), lit(numParts - 1L))
          .cast("long")
      } else pmod(col("j"), lit(numParts.toLong))
    ords.select(col("docId"), part.as("part"))
  }

  /** MultiPassIndexSplitter: materialize the N-way split as N child
    * indexes (same per-doc filtered copy + child rebuild as splitShard,
    * whole-collection scope incl. deltas; tombstones follow their docs
    * via a semi-join). The source is read once per part, matching the
    * reference's N-pass posture. */
  def multiPassSplit(spark: SparkSession, baseDir: String,
                     outDirs: Seq[String], seq: Boolean,
                     cfg: IndexConfig): Seq[String] = {
    import org.apache.spark.sql.functions.col
    val allDirs = subIndexDirs(baseDir)
    val segs = allDirs.map(d => spark.read.parquet(s"$d/segments"))
      .reduce(_ union _)
    val delDirs = allDirs.filter(d => Files.exists(Paths.get(d, "deletes")))
    val dels =
      if (delDirs.isEmpty) None
      else Some(delDirs.map(d => spark.read.parquet(s"$d/deletes"))
        .reduce(_ union _).distinct())
    val asg = multiPassAssign(segs.select("docId"), outDirs.length, seq)
      .cache()
    outDirs.zipWithIndex.foreach { case (out, i) =>
      val partDocs = asg.where(col("part") === i.toLong).select("docId")
      segs.join(partDocs, "docId", "left_semi").write.mode("overwrite")
        .option("compression", "zstd").parquet(s"$out/segments")
      writeMarker(out, "segments", Map())
      dels.foreach(_.join(partDocs, "docId", "left_semi")
        .write.mode("overwrite").parquet(s"$out/deletes"))
      build(spark, spark.emptyDataFrame, out, cfg)
    }
    asg.unpersist()
    outDirs
  }

  /** Sub-index directories of `baseDir` in append order. */
  def subIndexDirs(baseDir: String): Seq[String] = {
    val all = Option(new java.io.File(baseDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("delta_"))
      .sortBy(f => f.getName.stripPrefix("delta_").toLong)
    // Tiered-compaction visibility pivot: a merged delta that has
    // COMMITTED (its "done" marker exists) hides the source deltas it
    // replaced (replaces.txt, one dir name per line). The done marker is
    // the single atomic switch: before it the sources serve and the
    // half-built merge is invisible; after it the merge serves and the
    // sources are dead files awaiting cleanup — no crash point shows
    // duplicate or missing docs. Hidden dirs still contribute their OWN
    // replaces lists (a crash may leave a replaced-but-not-yet-deleted
    // dir that itself replaced others).
    val replaced: Set[String] = all.flatMap { f =>
      val rj = f.toPath.resolve("replaces.txt")
      if (Files.exists(rj) && stageDone(f.getAbsolutePath, "done"))
        Files.readAllLines(rj).toArray(Array.empty[String]).toSeq
          .map(_.trim).filter(_.nonEmpty)
      else Nil
    }.toSet
    val deltas = all.filterNot(f => replaced.contains(f.getName))
      .map(_.getAbsolutePath)
    baseDir +: deltas
  }

  /** Next free delta id: max over ALL delta_* names on disk (including
    * replaced-but-not-yet-cleaned ones) + 1 — a size-based id would
    * collide after a tiered compaction leaves holes in the numbering. */
  def nextDeltaId(baseDir: String): Long = {
    val ids = Option(new java.io.File(baseDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("delta_"))
      .map(_.getName.stripPrefix("delta_").toLong)
    if (ids.isEmpty) 0L else ids.max + 1L
  }

  /** Tiered incremental compaction (reference
    * index/TieredMergePolicy.java:75-86: segsPerTier / maxMergeAtOnce /
    * floorSegmentBytes, sizes tiered on a log scale): merge ONLY when
    * some tier holds more than `segsPerTier` delta sub-indexes, and then
    * only that tier's smallest `maxMergeAtOnce` members — the base index
    * and every other delta stay byte-untouched (cold). The merged result
    * commits as a new delta whose replaces.txt + done marker atomically
    * hide the sources (see [[subIndexDirs]]); tombstones covering merged
    * docs are purged from the merged data exactly like [[compact]] (the
    * tombstone FILES stay — they no-op once their docs are gone and a
    * full compact clears them). Returns the merged dir, or None when no
    * tier exceeds the threshold (the common steady-state call is free:
    * one directory listing + one tiny collstats read per delta). */
  def compactTiered(spark: SparkSession, baseDir: String, cfg: IndexConfig,
                    segsPerTier: Int = 10, maxMergeAtOnce: Int = 10,
                    floorDocs: Long = 4096L): Option[String] =
    withWriteLock(baseDir) {
      import spark.implicits._
      val deltas = subIndexDirs(baseDir).drop(1) // base is always cold
      val group: Option[Seq[String]] =
        if (deltas.size <= segsPerTier) None
        else {
          // sizes come from the collstats lineage MARKER (a driver-side
          // file read, the segments_N posture) — a Spark job per delta
          // would make the steady-state no-op call cost 1 job per
          // sub-index
          val MaxDoc = """"maxDoc":\s*(\d+)""".r.unanchored
          val sized = deltas.map { d =>
            d -> (Files.readString(markerPath(d, "collstats")) match {
              case MaxDoc(n) => n.toLong
              case _ => spark.read.parquet(s"$d/collstats").as[CollStats]
                .head().maxDoc
            })
          }
          val byTier = sized.groupBy { case (_, n) =>
            math.floor(math.log10(math.max(n, floorDocs).toDouble)).toInt
          }
          byTier.toSeq.sortBy(_._1).collectFirst {
            case (_, members) if members.size > segsPerTier =>
              members.sortBy { case (d, n) => (n, d) }
                .take(maxMergeAtOnce).map(_._1)
          }
        }
      group.map { srcs =>
        val out = s"$baseDir/delta_${nextDeltaId(baseDir)}"
        val segs = srcs.map(d => spark.read.parquet(s"$d/segments"))
          .reduce(_ unionByName _)
        // tombstones from EVERY sub-index apply (deleteDocs writes to the
        // base dir, but a delta dir may carry its own)
        val dels = subIndexDirs(baseDir)
          .filter(d => Files.exists(Paths.get(d, "deletes")))
          .map(d => spark.read.parquet(s"$d/deletes")
            .select(org.apache.spark.sql.functions.col("docId")))
        val live =
          if (dels.isEmpty) segs
          else segs.join(dels.reduce(_ union _), Seq("docId"), "left_anti")
        live.write.mode("overwrite").option("compression", "zstd")
          .parquet(s"$out/segments")
        writeMarker(out, "segments", Map())
        // replaces.txt BEFORE build(): build's final "done" marker is the
        // atomic visibility switch for both the merge and the hiding
        Files.writeString(Paths.get(out, "replaces.txt"),
          srcs.map(d => Paths.get(d).getFileName.toString).mkString("\n"))
        build(spark, spark.emptyDataFrame, out, cfg)
        // sources are invisible now — cleanup is safe and best-effort
        // (a crash here just leaves dead files for the next call)
        srcs.foreach(d => deleteRecursively(Paths.get(d)))
        out
      }
    }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Option(p.toFile.listFiles()).toSeq.flatten
        .foreach(f => deleteRecursively(f.toPath))
    Files.deleteIfExists(p)
  }

}
