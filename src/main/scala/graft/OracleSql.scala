package graft

import graft.codec.SmallFloat
import graft.operators.Dedup
import graft.operators.TextAnalysis

/** ANSI-SQL (DuckDB-dialect) oracle fragments for SparkEntry.oracleSql.
  *
  * The oracle re-derives every engine output from the raw parquet tables:
  * tokenization is `regexp_extract_all('[a-z0-9]+')` — equivalent to our
  * UAX#29 chain on this corpus (plain ASCII words; the tokenizer's own
  * golden-vector tests cover the general contract) — and all
  * engine-specific constants (stop sets, SmallFloat norm quantization
  * ranges, MinHash permutation params) are generated HERE from the same
  * Scala constants the engine uses, so the two sides cannot drift.
  */
object OracleSql {

  final val TokRe = "[a-z0-9]+"

  /** (lang, stopword) VALUES rows for the 5 corpus languages, from the
    * exact sets the engine analyzer uses. */
  lazy val stopValues: String =
    TextAnalysis.Candidates.flatMap { case (l, s) =>
      s.toSeq.sorted.map(w => s"('$l','${w.replace("'", "''")}')")
    }.mkString(", ")

  /** Raw (pre-stop-filter) tokens with Lucene positions; pos = raw token
    * index (dropped stopwords still advance the position counter —
    * FilteringTokenFilter semantics). */
  def tokAllCteOver(tbl: String): String =
    s"""tokall AS (
       |  SELECT doc_id, lang,
       |         unnest(regexp_extract_all(text, '$TokRe')) AS term,
       |         unnest(range(len(regexp_extract_all(text, '$TokRe')))) AS pos
       |  FROM $tbl)""".stripMargin

  val tokAllCte: String = tokAllCteOver("documents")

  /** Analyzed tokens: raw tokens minus the doc's own language stop set.
    * `tbl` must expose (doc_id, text, lang) — a CTE name works, letting
    * update/delete oracles tokenize a rewritten corpus. */
  def tokensCteOver(tbl: String): String =
    s"""${tokAllCteOver(tbl)},
       |stop(slang, sterm) AS (VALUES $stopValues),
       |tokens AS (
       |  SELECT t.doc_id, t.lang, t.term, t.pos FROM tokall t
       |  LEFT JOIN stop s ON s.slang = t.lang AND s.sterm = t.term
       |  WHERE s.sterm IS NULL)""".stripMargin

  lazy val tokensCte: String = tokensCteOver("documents")

  /** SmallFloat-quantized decoded field length: VALUES (lo, hi, qdl) with
    * qdl = NORM_TABLE[floatToByte315(1/sqrt(dl))] for dl in [lo, hi].
    * Derived by scanning the engine's own quantizer. */
  lazy val normRangesValues: String = {
    // (lo, hi, qdl, cnorm): qdl = BM25's decoded length (1/f^2), cnorm =
    // the raw byte315 decode f (ClassicSimilarity's norm factor), both
    // exact float->double widenings of the engine's own tables.
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Double)]()
    val maxDl = 3000000L // far above any test doc; open-ended last range
    def qOf(dl: Long): (Double, Double) = {
      val b = SmallFloat.normByte(dl.toInt)
      (SmallFloat.Bm25NormTable(b & 0xFF).toDouble,
        SmallFloat.byte315ToFloat(b).toDouble)
    }
    var lo = 0L
    var cur = qOf(0)
    var dl = 1L
    while (dl <= maxDl) {
      val q = qOf(dl)
      if (q != cur) { rows += ((lo, dl - 1, cur._1, cur._2)); lo = dl; cur = q }
      dl += 1
    }
    rows += ((lo, 1000000000L, cur._1, cur._2))
    rows.map { case (l, h, q, c) => s"($l, $h, $q, $c)" }.mkString(", ")
  }

  lazy val normCte: String =
    s"nrm(lo, hi, qdl, cnorm) AS (VALUES $normRangesValues)"

  /** Per-doc analyzed field length + collection stats. maxDoc counts ALL
    * docs (even all-stopword ones), as the engine's segment count does. */
  def dlCsCteOver(tbl: String): String =
    s"""dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
       |      FROM tokens GROUP BY doc_id),
       |cs AS (SELECT (SELECT count(*) FROM $tbl) AS n,
       |              (SELECT count(*) FROM tokens) AS sumdl)""".stripMargin

  lazy val dlCsCte: String = dlCsCteOver("documents")

  /** BM25 per-(doc, clause-term) score CTE over query terms given as
    * `q(qterm) AS (VALUES ('a'),('b'))`; emits sc(doc_id, qterm, s).
    * Formula mirrors BM25Similarity.java:64-97,207-238 in double
    * precision (used for RANK comparison only; float-exactness is proven
    * in the ScalaTest rank-identity suite). */
  lazy val bm25ClauseCte: String =
    s"""tf AS (SELECT t.doc_id, q.qterm, CAST(count(*) AS BIGINT) AS tf
       |      FROM tokens t JOIN q ON q.qterm = t.term GROUP BY 1, 2),
       |dfq AS (SELECT qterm, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT tf.doc_id, tf.qterm,
       |         ln(1 + (cs.n - dfq.df + 0.5) / (dfq.df + 0.5)) * 2.2 * tf.tf /
       |         (tf.tf + 1.2 * (0.25 + 0.75 * nrm.qdl /
       |            (CAST(cs.sumdl AS DOUBLE) / cs.n))) AS s
       |       FROM tf, dfq, dl, nrm, cs
       |       WHERE dfq.qterm = tf.qterm AND dl.doc_id = tf.doc_id
       |         AND dl.dl BETWEEN nrm.lo AND nrm.hi)""".stripMargin

  /** All the CTEs a BM25 ranking oracle needs, given the query VALUES. */
  def bm25With(qValues: String): String =
    s"""WITH $tokensCte,
       |$dlCsCte,
       |$normCte,
       |q(qterm) AS (VALUES $qValues),
       |$bm25ClauseCte""".stripMargin

  private def sqlCos(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** IVF k-means CTE chain mirroring Ann.kmeansCentroids (seeds = first
    * `n` vectors, 2 Lloyd rounds of assign -> element-wise mean, double
    * math, ties -> lower cid) ending in `asg(id, cid)` and
    * `cents(cid, cv)`. `dim` = embedding dimensionality. */
  def ivfKmeansCtes(n: Int, dim: Int): String = {
    def asgCte(name: String, cents: String): String =
      s"""$name AS (SELECT id, cid FROM (
         |  SELECT e.vec_id AS id, c.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${sqlCos("e.v", "c.cv")} DESC, c.cid) AS rn
         |  FROM e, $cents c) WHERE rn = 1)""".stripMargin
    def meanCte(prev: String, cm: String, cents: String): String =
      s"""$cm AS (SELECT a.cid, t.i AS pos, avg(e2.v[t.i]) AS m
         |  FROM $prev a JOIN e e2 ON e2.vec_id = a.id
         |  CROSS JOIN UNNEST(generate_series(1, $dim)) AS t(i)
         |  GROUP BY a.cid, t.i),
         |$cents AS (SELECT cid, list(m ORDER BY pos) AS cv FROM $cm GROUP BY cid)""".stripMargin
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < $n),
       |${asgCte("asg0", "cent0")},
       |${meanCte("asg0", "cm0", "cent1")},
       |${asgCte("asg1", "cent1")},
       |${meanCte("asg1", "cm1", "cents")},
       |${asgCte("asg", "cents")}""".stripMargin
  }

  /** ivfKmeansCtes over a FILTERED embedding subset (search-results
    * clustering): `eFilter` is SQL limiting e's vec_ids; seeds = the k
    * LOWEST ids in the subset (mirrors Ann.kmeansCentroids'
    * orderBy(id).limit(k) on sparse result ids). */
  def kmeansSubsetCtes(eFilter: String, k: Int, dim: Int): String = {
    def asgCte(name: String, cents: String): String =
      s"""$name AS (SELECT id, cid FROM (
         |  SELECT e.vec_id AS id, c.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${sqlCos("e.v", "c.cv")} DESC, c.cid) AS rn
         |  FROM e, $cents c) WHERE rn = 1)""".stripMargin
    def meanCte(prev: String, cm: String, cents: String): String =
      s"""$cm AS (SELECT a.cid, t.i AS pos, avg(e2.v[t.i]) AS m
         |  FROM $prev a JOIN e e2 ON e2.vec_id = a.id
         |  CROSS JOIN UNNEST(generate_series(1, $dim)) AS t(i)
         |  GROUP BY a.cid, t.i),
         |$cents AS (SELECT cid, list(m ORDER BY pos) AS cv FROM $cm GROUP BY cid)""".stripMargin
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |      WHERE $eFilter),
       |cent0 AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT $k),
       |${asgCte("asg0", "cent0")},
       |${meanCte("asg0", "cm0", "cent1")},
       |${asgCte("asg1", "cent1")},
       |${meanCte("asg1", "cm1", "cents")},
       |${asgCte("asg", "cents")}""".stripMargin
  }

  /** Deterministic LatLonType points over customer — mirrors
    * SparkEntry.geoCustomers op for op (long mod, one double divide). */
  val geoPtsCte: String =
    """pts AS (SELECT c_custkey, c_mktsegment,
      |  (c_custkey * 7919 % 18000) / CAST(100.0 AS DOUBLE) - 90.0 AS lat,
      |  (c_custkey * 104729 % 36000) / CAST(100.0 AS DOUBLE) - 180.0 AS lon
      |FROM customer)""".stripMargin

  /** Half-plane conjunction for a convex polygon — generated from the
    * SAME vertex constants the engine uses (Geo.EuropePoly), mirroring
    * Geo.convexPolygonFilter's cross-product operation order. */
  def polygonPred(verts: Seq[(Double, Double)],
                  latCol: String, lonCol: String): String =
    verts.indices.map { i =>
      val (x1, y1) = verts(i)
      val (x2, y2) = verts((i + 1) % verts.length)
      s"((${x2 - x1}) * ($latCol - (${y1})) - (${y2 - y1}) * ($lonCol - (${x1})) >= 0)"
    }.mkString(" AND ")

  /** Haversine km from (lat, lon) columns to a constant point, mirroring
    * Geo.haversineKm's exact operation order and association. */
  def geoDistKm(clat: Double, clon: Double): String =
    s"""(2 * CAST(6371.0087714 AS DOUBLE) * asin(sqrt(
       |  sin(radians($clat - lat)/2) * sin(radians($clat - lat)/2) +
       |  cos(radians(lat)) * cos(radians($clat)) *
       |  sin(radians($clon - lon)/2) * sin(radians($clon - lon)/2))))""".stripMargin

  /** MinHash permutation params as VALUES — the engine's own constants. */
  lazy val minhashPermValues: String =
    Dedup.MinHashParams.map { case (i, a, b) => s"($i, $a, $b)" }.mkString(", ")

  /** 3-word shingles per doc (distinct), language-neutral (no stop filter):
    * sh(id, shingle). */
  lazy val shinglesCte: String =
    s"""$tokAllCte,
       |sh AS (
       |  SELECT DISTINCT a.doc_id AS id,
       |         a.term || ' ' || b.term || ' ' || c.term AS shingle
       |  FROM tokall a
       |  JOIN tokall b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  JOIN tokall c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2)""".stripMargin
}
