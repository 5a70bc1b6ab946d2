package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.{Analyzer, StopSets}

/** Index-free per-document query evaluation — the MemoryIndex shape
  * (reference lucene/memory/src/java/org/apache/lucene/index/memory/
  * MemoryIndex.java: the single-document index Lucene uses for
  * percolation / monitoring; the ES percolator is built on it).
  *
  * One document is analyzed into a term -> positions map and every saved
  * query is evaluated directly against it — no corpus index involved.
  * The evaluation is a pure function of one row, so the same operator
  * runs unchanged over a batch DataFrame or a readStream micro-batch
  * (alerting on a live document feed); matching is embarrassingly
  * parallel and scales with the document stream, while the saved-query
  * set is a broadcast-sized task constant.
  *
  * Supported query surface (match-only, no scoring): term / prefix /
  * wildcard / regexp / fuzzy / term-range / exact + sloppy phrase /
  * MatchAll / boost(transparent) and arbitrarily nested boolean clauses
  * with Must / Should / MustNot / Filter and minShouldMatch — the same
  * effective-msm rule as the scored path (JoinScorer). Span queries are
  * deliberately out: percolation is a routing predicate, not a proximity
  * scorer.
  */
object Percolator {

  /** term -> sorted positions of one analyzed document. */
  type DocIndex = Map[String, Vector[Int]]

  def docIndex(text: String, lang: String): DocIndex =
    Analyzer.analyze(text, StopSets.forLang(lang))
      .groupBy(_.term)
      .map { case (t, tp) => t -> tp.map(_.position).toVector }

  /** Multi-valued field with positionIncrementGap (reference
    * index/DefaultIndexingChain.java:577-583: `if (invertState.length>0)
    * position += analyzer.getPositionIncrementGap(field)` before each
    * subsequent value; Solr text fields default the gap to 100 via
    * schema positionIncrementGap="100"). The gap makes phrase/span
    * queries unable to match across value boundaries — copyField /
    * multiValued semantics. */
  def docIndexMulti(values: Seq[String], lang: String,
                    positionIncrementGap: Int = 100): DocIndex = {
    val stops = StopSets.forLang(lang)
    var base = 0
    var emitted = false
    val acc = scala.collection.mutable.HashMap.empty[String, Vector[Int]]
    values.foreach { v =>
      // stop-filter with gaps: kept tokens keep their RAW positions, and
      // the end counter includes TRAILING stopwords (TokenStream.end()'s
      // posInc advances invertState.position past them, so the next
      // value starts after raw-length + gap)
      val all = Analyzer.analyze(v, Set.empty)
      // the gap applies to EVERY instance once any tokens were indexed
      // (invertState.length > 0) — an empty middle value still pays it
      if (emitted) base += positionIncrementGap
      if (all.nonEmpty) {
        all.foreach { t =>
          if (!stops(t.term))
            acc(t.term) = acc.getOrElse(t.term, Vector.empty) :+ (base + t.position)
        }
        base += all.map(_.position).max + 1
        emitted = true
      }
    }
    acc.toMap
  }

  private def globRegex(pat: String): String =
    "(?s)" + pat.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()<>+-=!?^$|".contains(c) => "\\" + c
      case c => c.toString
    }

  def matches(ix: DocIndex, q: Query): Boolean = q match {
    case TermQ(t) => ix.contains(t)
    case BoostQ(inner, _) => matches(ix, inner)
    case MatchAllQ => true
    case PrefixQ(p) => ix.keysIterator.exists(_.startsWith(p))
    case WildcardQ(pat) =>
      val re = globRegex(pat).r.pattern
      ix.keysIterator.exists(t => re.matcher(t).matches())
    case RegexpQ(pat) =>
      val re = ("(?s)" + pat).r.pattern
      ix.keysIterator.exists(t => re.matcher(t).matches())
    case FuzzyQ(t, maxEdits) =>
      ix.keysIterator.exists(k =>
        math.abs(k.length - t.length) <= maxEdits &&
          org.apache.commons.text.similarity.LevenshteinDistance
            .getDefaultInstance.apply(k, t) <= maxEdits)
    case RangeQ(lo, hi, incLo, incHi) =>
      ix.keysIterator.exists(t =>
        (if (incLo) t >= lo else t > lo) &&
          (if (incHi) t <= hi else t < hi))
    case PhraseQ(ts, rel) =>
      val posLists = ts.map(ix.getOrElse(_, Vector.empty))
      posLists.head.exists(p0 =>
        posLists.indices.forall(i => posLists(i).contains(p0 + rel(i))))
    case MultiPhraseQ(ss, rel) =>
      // per-slot union of the alternatives' positions (MemoryIndex's view
      // of MultiPhraseQuery's UnionPostingsEnum)
      val posLists = ss.map(_.flatMap(t => ix.getOrElse(t, Vector.empty)))
      posLists.head.exists(p0 =>
        posLists.indices.forall(i =>
          posLists(i).contains(p0 - rel(0) + rel(i))))
    case SloppyPhraseQ(ts, rel, slop) =>
      // existence via the same reference walk the scored path uses
      val byTerm = ts.map(t => ix.getOrElse(t, Vector.empty).toArray).toArray
      byTerm.forall(_.nonEmpty) && {
        val rptSlots = ts.zipWithIndex.groupBy(_._1).valuesIterator
          .filter(_.length > 1).map(_.map(_._2).toArray).toArray
        SloppyMatch.freq(byTerm, rel.toArray, slop, rptSlots) > 0f
      }
    case b: BoolQ => matchesBool(ix, b)
    case other =>
      throw new IllegalArgumentException(
        s"percolation does not support ${other.getClass.getSimpleName}")
  }

  def matchesBool(ix: DocIndex, q: BoolQ): Boolean = {
    var mustSeen = 0
    var shouldSeen = 0
    var nMust = 0
    var nShould = 0
    var vetoed = false
    q.clauses.foreach { case (occ, sub) =>
      val m = matches(ix, sub)
      occ match {
        case Occur.Must | Occur.Filter => nMust += 1; if (m) mustSeen += 1
        case Occur.Should => nShould += 1; if (m) shouldSeen += 1
        case Occur.MustNot => if (m) vetoed = true
      }
    }
    // Same effective-msm rule as the scored path (JoinScorer.scores).
    val effMsm =
      if (q.minShouldMatch > 0) q.minShouldMatch
      else if (nMust == 0 && nShould > 0) 1
      else 0
    // a query with no positive clause matches NOTHING (Lucene's pure-
    // negative semantics — the scored path has no candidates to score)
    val hasPositive = nMust > 0 || nShould > 0
    hasPositive && !vetoed && mustSeen == nMust && shouldSeen >= effMsm
  }

  /** Percolate a document relation (batch or streaming) against the
    * saved-query set: one output row (query_id, doc_id) per match. */
  def percolate(docs: DataFrame, saved: Seq[(String, BoolQ)],
                idCol: String = "doc_id", textCol: String = "text",
                langCol: String = "lang"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val savedQ = saved // stable reference captured by the task closure
    docs.select(col(idCol).cast("long"), col(textCol), col(langCol))
      .as[(Long, String, String)]
      .flatMap { case (id, text, lang) =>
        val ix = docIndex(text, lang)
        savedQ.iterator
          .collect { case (qid, q) if matchesBool(ix, q) => (qid, id) }
          .toSeq
      }.toDF("query_id", "doc_id")
  }
}
