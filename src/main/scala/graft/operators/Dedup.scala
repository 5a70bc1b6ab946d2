package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Document deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash and exact n-gram Jaccard. All are pure
  * DataFrame-API compositions (joins + window + hash aggregations) — each
  * stage is one well-understood shuffle, so the plans scale by partition
  * count alone: shingle explode is map-side, candidate generation is a
  * self-equi-join on (band, signature) — never an all-pairs product.
  *
  * Hashing is md5-derived (TextFns.md5Bits60/48) so an external ANSI-SQL
  * oracle can reproduce every value exactly; the LSH permutation constants
  * live in [[Dedup.MinHashParams]] and are embedded verbatim into the
  * oracle SQL by SparkEntry.
  */
object Dedup {

  /** Mersenne prime 2^31-1: universal-hash modulus. a*(h%P)+b stays
    * below 2^62 — exact in 64-bit on both Spark and the SQL oracle. */
  final val P: Long = 2147483647L

  /** Deterministic LCG-generated permutation params (a_i, b_i), i<k.
    * Same constants are embedded in the SQL oracle. */
  def minhashParams(k: Int, seed: Long = 0x5DEECE66DL): Seq[(Int, Long, Long)] = {
    var s = seed
    def next(bound: Long): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L
      val v = (s >>> 17) % bound
      v
    }
    (0 until k).map(i => (i, 1L + next(P - 1), next(P)))
  }

  final val NumPerms = 16
  final val NumBands = 4 // 4 rows per band
  final val MinHashParams: Seq[(Int, Long, Long)] = minhashParams(NumPerms)

  /** Exact duplicate groups by full-text equality: one row per distinct
    * text, keeper = min doc id (the canonical representative). */
  def exact(docs: DataFrame, id: String = "doc_id",
            text: String = "text"): DataFrame =
    docs.groupBy(col(text))
      .agg(min(col(id)).as("keeper"), count(lit(1)).as("group_size"))
      .select(col("keeper"), col("group_size"))

  /** TextProfileSignature (reference solr/core/src/java/org/apache/solr/
    * update/processor/TextProfileSignature.java, from Nutch — the fuzzy
    * dedup signature of SignatureUpdateProcessorFactory): per doc, count
    * lowercase alphanumeric tokens LONGER than minTokenLen, quantize
    * counts down to multiples of QUANT = round(maxFreq·quantRate)
    * (floored at 2 when maxFreq>1, else 1), drop tokens quantized below
    * QUANT, and md5 the "term cnt" lines sorted by count desc. One
    * deviation, documented: count ties sort by term asc — the reference's
    * comparator orders ties by HashMap iteration order
    * (TextProfileSignature.java:158-163), which is not reproducible;
    * a deterministic tie-break makes the signature stable across engines
    * and runs. Shape: explode + two keyed aggs — no all-pairs work; docs
    * sharing a signature are near-duplicates (collapse on it). */
  def textProfileSignature(docs: DataFrame, quantRate: Double = 0.01,
                           minTokenLen: Int = 2, id: String = "doc_id",
                           text: String = "text"): DataFrame = {
    val tok = docs.select(col(id).as("id"),
      explode(filter(TextFns.tokensAll(col(text)),
        t => length(t) > minTokenLen)).as("term"))
    val cnt = tok.groupBy("id", "term").agg(count(lit(1)).as("cnt"))
    val mx = cnt.groupBy("id").agg(max("cnt").as("maxFreq"))
    val rawQuant = round(col("maxFreq") * quantRate).cast("long")
    val quant = when(rawQuant < 2,
      when(col("maxFreq") > 1, lit(2L)).otherwise(lit(1L)))
      .otherwise(rawQuant)
    val q = cnt.join(mx, "id")
      .withColumn("quant", quant)
      .withColumn("qcnt", (col("cnt") / col("quant")).cast("long") * col("quant"))
      .where(col("qcnt") >= col("quant"))
    q.groupBy("id")
      .agg(md5(array_join(transform(
        array_sort(collect_list(struct(negate(col("qcnt")).as("nq"),
          col("term"), col("qcnt")))),
        s => concat(s.getField("term"), lit(" "), s.getField("qcnt"))),
        "\n")).as("sig"))
  }

  /** (id, shingle) distinct pairs: word k-shingles of the lowercased
    * token stream (stopwords kept — dedup is language-neutral).
    * Per-doc dedup happens BEFORE the explode (array_distinct on the
    * in-row shingle array), so distinctness costs zero shuffle — a
    * doc's shingles all live in its own row. */
  def docShingles(docs: DataFrame, k: Int, id: String = "doc_id",
                  text: String = "text"): DataFrame =
    docs.select(col(id).as("id"),
      explode(array_distinct(
        TextFns.shingles(TextFns.tokensAll(col(text)), k))).as("shingle"))

  /** EXACT Jaccard >= threshold pairs via prefix filtering (the
    * SSJoin/PPJoin candidate bound): under a global shingle order
    * (ascending corpus df, rarest first), J(A,B) >= t implies
    * |A∩B| >= ceil(t·max(|A|,|B|)), and two sets with |A∩B| >= α must
    * share an element within their (n-α+1)-prefixes — so candidates are
    * pairs sharing a PREFIX shingle only, never the full inverted-index
    * self-join. Verification computes exact Jaccard on the collected
    * shingle sets per candidate (per-pair array_intersect, no
    * re-expansion). Same output as the naive shared-shingle join
    * (t:NgramJaccardSpec pins the equivalence, incl. a corpus-hot
    * shingle case); join width is bounded by
    * prefix-bucket sizes — and prefixes hold each doc's RAREST shingles,
    * so corpus-hot shingles stay out of the join. */
  def ngramJaccard(docs: DataFrame, k: Int, threshold: Double,
                   id: String = "doc_id", text: String = "text"): DataFrame = {
    val sh = docShingles(docs, k, id, text).cache()
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val byId = Window.partitionBy(col("id"))
    val ranked = sh.join(dfreq, "shingle")
      .withColumn("n", count(lit(1)).over(byId))
      .withColumn("rn", row_number().over(
        byId.orderBy(col("df"), col("shingle"))))
    val prefix = ranked
      .where(col("rn") <= col("n") - ceil(col("n") * lit(threshold)) + 1)
      .select(col("id"), col("shingle"))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    val sets = sh.groupBy(col("id"))
      .agg(collect_set(col("shingle")).as("ss"), count(lit(1)).as("n"))
    cand
      .join(sets.select(col("id").as("a"), col("ss").as("sa"),
        col("n").as("na")), "a")
      .join(sets.select(col("id").as("b"), col("ss").as("sb"),
        col("n").as("nb")), "b")
      .withColumn("inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Per-doc minhash signatures: (id, perm, mh). */
  def minhashes(sh: DataFrame): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val perms = MinHashParams.toDF("perm", "pa", "pb")
    sh.withColumn("h", TextFns.md5Bits60(col("shingle")) % P)
      .crossJoin(broadcast(perms))
      .groupBy(col("id"), col("perm"))
      .agg(min((col("pa") * col("h") + col("pb")) % P).as("mh"))
  }

  /** MinHash + banded LSH near-dup pairs, exact-Jaccard verified:
    * candidates = pairs agreeing on >=1 of NumBands band signatures;
    * output = candidates with true shingle-Jaccard >= threshold.
    * This is the scale path: work is proportional to matching bucket
    * sizes, never to |docs|^2. */
  def minhashLsh(docs: DataFrame, k: Int, threshold: Double,
                 id: String = "doc_id", text: String = "text"): DataFrame = {
    val rowsPerBand = NumPerms / NumBands
    val sh = docShingles(docs, k, id, text).cache()
    val mh = minhashes(sh)
    val bands = mh
      .withColumn("band", (col("perm") / rowsPerBand).cast("int"))
      .groupBy(col("id"), col("band"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("perm"), col("mh")))),
        s => s.getField("mh").cast("string")), ",").as("sig"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("p"), col("a") === col("p.id"))
      .join(sh.as("q"), col("b") === col("q.id") &&
        col("p.shingle") === col("q.shingle"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n", "nb"), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Connected components over near-dup pairs -> dedup clusters (the
    * "keep one representative per duplicate group" step a training-data
    * pipeline runs after pair generation; canonical id = component-min).
    *
    * Iterative min-label propagation (the MapReduce CC family of Kiveris
    * et al., "Connected Components in MapReduce and Beyond"): each round
    * every node adopts the minimum label in its closed neighborhood —
    * one shuffle per round, rounds = O(component diameter). No driver-
    * side graph state, so the edge list can be arbitrarily large;
    * near-dup clusters are shallow (stars/cliques), so 2-3 rounds
    * converge. Lineage is truncated per round (localCheckpoint) to keep
    * the plan bounded. Returns (cluster, member). */
  def clusters(pairs: DataFrame, a: String = "a", b: String = "b",
               maxRounds: Int = 20): DataFrame = {
    val edges = pairs.select(col(a).as("u"), col(b).as("v"))
      .union(pairs.select(col(b).as("u"), col(a).as("v")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("lab", col("id"))
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val nbrMin = edges.join(labels.withColumnRenamed("id", "v"), "v")
        .groupBy(col("u").as("id")).agg(min("lab").as("nlab"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab"))
        .localCheckpoint(true)
      converged = next.join(labels.withColumnRenamed("lab", "old"), "id")
        .where(col("lab") =!= col("old")).isEmpty
      labels = next
      round += 1
    }
    // an unconverged result is silently WRONG (labels mid-propagation);
    // refuse it rather than return it — callers raise maxRounds for
    // pathologically deep components
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxRounds rounds " +
        "(component diameter exceeds maxRounds)")
    labels.select(col("lab").as("cluster"), col("id").as("member"))
  }

  final val SimHashBits = 48 // md5-derived; <2^48 keeps all sums exact
  final val SimHashBandBits = 12
  final val SimHashBands = SimHashBits / SimHashBandBits

  /** Per-doc 48-bit SimHash over tf-weighted token hashes:
    * bit j = [ sum_t tf(t) * (2*bit_j(md5_48(t)) - 1) >= 0 ]. */
  def simhashes(docs: DataFrame, id: String = "doc_id",
                text: String = "text"): DataFrame = {
    val tf = docs
      .select(col(id).as("id"),
        explode(TextFns.tokensAll(col(text))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("h", TextFns.md5Bits48(col("term")))
    tf.select(col("id"), col("tf"), col("h"),
        explode(sequence(lit(0), lit(SimHashBits - 1))).as("j"))
      .withColumn("w",
        when(expr("shiftright(h, j) & 1") === 1, col("tf")).otherwise(-col("tf")))
      .groupBy(col("id"), col("j")).agg(sum(col("w")).as("s"))
      .groupBy(col("id"))
      .agg(sum(when(col("s") >= 0, expr("shiftleft(cast(1 as bigint), j)")).otherwise(0L))
        .as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist (< SimHashBands):
    * banding is EXACT here — by pigeonhole any pair within maxDist < bands
    * agrees on some full band, so candidates are a superset and the final
    * bit_count filter makes the result identical to the all-pairs scan. */
  def simhashPairs(docs: DataFrame, maxDist: Int, id: String = "doc_id",
                   text: String = "text"): DataFrame = {
    require(maxDist < SimHashBands, "pigeonhole needs maxDist < bands")
    val sims = simhashes(docs, id, text).cache()
    val bands = sims.select(col("id"), col("simhash"),
        explode(sequence(lit(0), lit(SimHashBands - 1))).as("band"))
      .withColumn("bv", expr(s"shiftright(simhash, band * $SimHashBandBits) & ${(1 << SimHashBandBits) - 1}"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("x.simhash").as("ha"),
        col("y.id").as("b"), col("y.simhash").as("hb"))
      .distinct()
    cand.withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .where(col("hamming") <= maxDist)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Embedding-cosine near-dup pairs, IVF-cluster-bucketed: vectors are
    * first assigned to their nearest centroid ([[Ann.ivfAssign]]); pair
    * generation is a self-equi-join on the cluster id, so the quadratic
    * blow-up is bounded per cluster (choose nCentroids ~ sqrt(N) at scale)
    * instead of |corpus|^2. Output: (a, b, sim) with a < b in the same
    * cluster and cosine >= threshold. */
  def embCosinePairs(emb: DataFrame, nCentroids: Int, threshold: Double,
                     id: String = "vec_id",
                     vec: String = "embedding",
                     assign0: Option[DataFrame] = None): DataFrame = {
    val assign = assign0.getOrElse(Ann.ivfAssign(emb, nCentroids, id, vec))
    // precompute each vector's norm ONCE: cosine(a,b) = dot/(nrmA*nrmB)
    // is value-identical to dot/(sqrt(aa)*sqrt(bb)) in double, and cuts
    // per-pair work from 3 dot products to 1 — the dominant cost when a
    // cluster yields O(m^2) pairs.
    val withC = emb.join(assign, emb(id) === assign("id"))
      .select(assign("id"), col("cid"), col(vec).as("v"),
        sqrt(TextFns.dot(col(vec), col(vec))).as("nrm"))
    withC.as("x").join(withC.as("y"),
        col("x.cid") === col("y.cid") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        (TextFns.dot(col("x.v"), col("y.v")) /
          (col("x.nrm") * col("y.nrm"))).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Substring-level dedup via winnowing fingerprints (Schleimer/
    * Wilkerson/Aiken SIGMOD 2003 — the suffix-array-free route to "these
    * two docs share a long literal run"). Two documents that share any
    * token run of length >= w+k-1 are GUARANTEED to share a selected
    * fingerprint, so the candidate join on the selected-hash value has
    * the same scale posture as MinHash LSH banding: an equi-join on a
    * bucket key, never an all-pairs product. Output per (a, b) pair
    * (a < b): `shared_fps` = distinct co-selected fingerprints, and
    * `est_min_overlap` = shared_fps + k - 1 — a lower bound on the
    * shared token mass when the shared grams are one contiguous run
    * (each extra shared k-gram extends a run by >= 1 token).
    *
    * `maxDf` drops fingerprints selected in more than that many docs
    * before pairing (boilerplate guard — a license-header gram shared by
    * 10^6 docs would otherwise emit 10^12 pairs). Dropped mass only
    * lowers shared_fps, never invents a pair. The default is FINITE on
    * purpose: with the bucket-expand below, one unguarded hot fingerprint
    * would collect_list its whole bucket into a single task and emit an
    * O(df^2) expansion; 1000 caps any bucket at ~500k pairs. Pass
    * Int.MaxValue to opt out explicitly. */
  def substringPairs(docs: DataFrame, k: Int = 3, w: Int = 4,
                     minShared: Int = 1, maxDf: Int = 1000,
                     id: String = "doc_id",
                     text: String = "text"): DataFrame = {
    val sel0 = TextAnalysis.winnowSelected(docs, k, w, id, text)
    val sel =
      if (maxDf == Int.MaxValue) sel0
      else {
        val hot = sel0.groupBy("wmin").agg(count(lit(1)).as("df"))
          .where(col("df") > maxDf).select("wmin")
        sel0.join(hot, Seq("wmin"), "left_anti")
      }
    // bucket-and-expand instead of a self-join: ONE shuffle of the
    // fingerprints (the join would hash-partition BOTH sides and run the
    // winnowing selection twice), then i<j pair expansion inside each
    // fingerprint bucket — the same candidate set, with bucket width
    // bounded by the maxDf guard above exactly like an LSH band join
    val spark = docs.sparkSession
    import spark.implicits._
    sel.groupBy("wmin")
      .agg(collect_list(col("id")).as("ids"))
      .select("ids").as[Seq[Long]]
      .flatMap { ids =>
        val sorted = ids.sorted
        for {
          i <- sorted.indices.iterator
          j <- (i + 1) until sorted.length
          if sorted(i) != sorted(j) // a doc can select one wmin twice
        } yield (sorted(i), sorted(j))
      }
      .toDF("a", "b")
      .groupBy("a", "b")
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
      .withColumn("est_min_overlap", col("shared_fps") + lit(k - 1))
  }
}
