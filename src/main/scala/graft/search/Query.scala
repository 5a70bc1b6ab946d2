package graft.search

import graft.analysis.{Analyzer, StopSets}

/** Clause occurrence (reference: lucene/core/src/java/org/apache/lucene/search/BooleanClause.java).
  * Filter matches without scoring (the FILTER occur / fq analog). */
sealed trait Occur
object Occur {
  case object Must extends Occur
  case object Should extends Occur
  case object MustNot extends Occur
  case object Filter extends Occur
}

/** Query AST (the primitive-query subset of SURVEY.md §2.4). Multi-term
  * queries (prefix/wildcard/fuzzy) rewrite against the term dictionary into
  * disjunctions before scoring (reference search/MultiTermQuery.java). */
sealed trait Query
final case class TermQ(term: String) extends Query
/** Exact phrase; `rel` holds each term's relative position (gaps where
  * stopwords were removed at parse time, reference PhraseQuery analyzed
  * positions). */
final case class PhraseQ(terms: Seq[String], rel: Seq[Int]) extends Query
/** Multi-phrase (reference search/MultiPhraseQuery.java): a phrase where
  * each position slot accepts ANY of several alternative terms (the query
  * shape index-time synonyms or prefix-expanded phrase terms produce).
  * Statistics are blended: idf = sum over every member term across all
  * slots (the UnionPostingsEnum posture); freq = count of start positions
  * where each slot has SOME alternative at its rel offset. */
final case class MultiPhraseQ(slots: Seq[Seq[String]],
                              rel: Seq[Int]) extends Query
final case class PrefixQ(prefix: String) extends Query
final case class WildcardQ(pattern: String) extends Query
final case class FuzzyQ(term: String, maxEdits: Int = 2) extends Query
/** Term range over the term dictionary (reference
  * search/TermRangeQuery.java with its includeLower/includeUpper flags;
  * rewrites to a constant-score set like the other multi-term queries).
  * Defaults to [lo, hi) — the engine's historical bound shape; the XML
  * builders pass both flags (reference RangeFilterBuilder.java:41-42
  * defaults BOTH inclusive). */
final case class RangeQ(lo: String, hi: String,
                        incLo: Boolean = true,
                        incHi: Boolean = false) extends Query
/** Regexp over the term dictionary (reference search/RegexpQuery.java;
  * rewrites to a constant-score term set like the other multi-term
  * queries). Pattern is anchored (must match the whole term). */
final case class RegexpQ(pattern: String) extends Query
/** Sloppy phrase (reference search/SloppyPhraseScorer.java): n terms, any
  * slop. Matching and freq follow the reference's pq-walk exactly (see
  * [[SloppyMatch]]): a match is a minimized window of one occurrence per
  * slot with (max - min) adjusted spread <= slop; phrase freq accumulates
  * 1/(1+matchLength) per encountered match, repeats resolved by the
  * repeat-group collision rules. */
final case class SloppyPhraseQ(terms: Seq[String], rel: Seq[Int],
                               slop: Int) extends Query
/** Query-time boost (reference Query.setBoost; BM25 folds it into the
  * weight: weightValue = idf * boost * (k1+1), BM25Similarity.java:289-293). */
final case class BoostQ(q: Query, boost: Float) extends Query
/** Span-first (reference search/spans/SpanFirstQuery.java, i.e.
  * SpanPositionRangeQuery with start 0): matches docs where `term` has an
  * occurrence at position < `end`; freq = count of such occurrences. */
final case class SpanFirstQ(term: String, end: Int) extends Query
/** Span position range (reference search/spans/SpanPositionRangeQuery
  * .java:36-58 acceptPosition: span kept when spanStart >= `start` AND
  * spanEnd <= `end`; a single-term span is [pos, pos+1), so positions in
  * [start, end) survive). SpanFirstQ is the start=0 special case. */
final case class SpanPositionRangeQ(term: String, start: Int, end: Int) extends Query
/** Payload-gated term span (reference search/spans/SpanPayloadCheckQuery
  * .java:52-73 acceptPosition: collect the span's payloads and compare
  * them against `payloads` IN ORDER — sizes must match and each candidate
  * must equal its counterpart). The engine's payload channel is the
  * position-derived one ft_payload reads (payload(pos) = 2.0 for
  * pos < 20 else 1.0, a TokenOffsetPayloadTokenFilter-style product of
  * the analysis chain), so payloads are Floats here. freq = accepted
  * occurrences, scored with the term's statistics. */
final case class SpanPayloadCheckQ(term: String,
                                   payloads: Seq[Float]) extends Query
/** Payload-gated span-near (reference search/spans/
  * SpanNearPayloadCheckQuery.java:47-76 acceptPosition: count candidate
  * payloads that equal ANY expected payload; accept when the count
  * reaches payloads.size — the unordered variant of the check, applied
  * to every ordered span-near match). */
final case class SpanNearPayloadCheckQ(terms: Seq[String], slop: Int,
                                       payloads: Seq[Float]) extends Query
/** Span-near (reference lucene/core/.../search/spans/SpanNearQuery.java):
  * terms within a window of width <= terms.length + slop; `inOrder = true`
  * additionally requires query order (NearSpansOrdered), false allows any
  * order (NearSpansUnordered). */
final case class SpanNearQ(terms: Seq[String], slop: Int,
                           inOrder: Boolean = true) extends Query
/** Span disjunction (reference search/spans/SpanOrQuery.java over term
  * spans): matches docs containing ANY clause term; freq = total
  * occurrences across clauses, scored once with the summed idf (the
  * blended-statistics synonym semantics). */
final case class SpanOrQ(terms: Seq[String]) extends Query
/** Span difference (reference search/spans/SpanNotQuery.java with
  * pre/post windows): occurrences of `include` survive unless an
  * occurrence of `exclude` lies within [pos-pre, pos+post]; freq = count
  * of surviving occurrences, scored with include's idf. */
final case class SpanNotQ(include: String, exclude: String,
                          pre: Int = 0, post: Int = 0) extends Query
/** Span-near whose legs may be MULTI-TERM patterns (reference
  * search/spans/SpanMultiTermQueryWrapper.java:50 wrapped in a
  * SpanNearQuery): each leg rewrites against the term dictionary
  * (TooManyClauses-guarded) into a span-OR of its matches — a leg's
  * occurrence set is the union of its expanded terms' positions. Legs may
  * be TermQ / PrefixQ / WildcardQ / RegexpQ / FuzzyQ. Scored with the
  * blended (summed-idf) statistics of every matched term, the SpanOr
  * posture. */
final case class SpanNearMultiQ(legs: Seq[Query], slop: Int,
                                inOrder: Boolean = true) extends Query
/** Span-within (reference search/spans/SpanWithinQuery.java, new in 5.2):
  * occurrences of `little` that lie inside some ordered `big` span
  * (big = span-near over `big` terms with slop `slop`). freq = count of
  * such occurrences; scored with little's statistics (the little side
  * drives SpanWithinQuery's iteration). */
final case class SpanWithinQ(little: String, big: Seq[String],
                             slop: Int) extends Query
/** Span-containing (reference search/spans/SpanContainingQuery.java):
  * ordered `big` spans that contain at least one occurrence of `little`;
  * freq = count of such spans, scored with the big terms' summed idf
  * (the big side drives SpanContainingQuery). */
final case class SpanContainingQ(little: String, big: Seq[String],
                                 slop: Int) extends Query
case object MatchAllQ extends Query
/** Token-automaton query (reference lucene/sandbox/.../search/
  * TermAutomatonQuery.java:70): states 0..numStates-1 (0 initial),
  * term-labelled transitions plus ANY arcs matching any single token.
  * Accepts docs where some automaton path consumes consecutive token
  * positions — expresses what MultiPhraseQ cannot: per-slot alternatives
  * of DIFFERENT lengths ("sea biscuit" | "seabiscuit"). `finish()`
  * rewrites ANY arcs to the whole alphabet and determinizes
  * (TermAutomatonQuery.java:146-210); matching/freq follow
  * TermAutomatonScorer.countMatches (see [[TermAutomatonDfa]]);
  * statistics blend every distinct term's idf (TermAutomatonWeight). */
final case class TermAutomatonQ(numStates: Int, accept: Set[Int],
                                transitions: Seq[(Int, Int, String)],
                                anyTransitions: Seq[(Int, Int)] = Nil)
  extends Query
final case class BoolQ(clauses: Seq[(Occur, Query)],
                       minShouldMatch: Int = 0) extends Query

/** Surround-query-parser subset (reference lucene/queryparser/src/java/
  * org/apache/lucene/queryparser/surround/parser/QueryParser.jj — the
  * distance-operator grammar): an infix chain `t1 3W t2 3W t3` where the
  * digit is the maximum span distance, `W` = ordered (NearSpansOrdered),
  * `N` = any order. Distance N maps to span slop = N - 1 (window width
  * <= nTerms + slop). All distance ops in one chain must agree — the
  * reference nests DistanceQuery pairwise; a uniform chain is the flat
  * equivalent, and mixed chains are refused rather than approximated. */
object SurroundParser {
  private val Op = "(\\d+)([wWnN])".r

  def parse(s: String): Query = {
    val toks = s.trim.split("\\s+").toSeq
    if (toks.length < 3 || toks.length % 2 == 0)
      throw new IllegalArgumentException(
        s"surround distance chain expected (term NW term ...): $s")
    val terms = Seq.newBuilder[String]
    var dist = -1
    var ordered = true
    toks.zipWithIndex.foreach { case (t, i) =>
      if (i % 2 == 0) terms += Analyzer.lowerCase(t)
      else t match {
        case Op(d, o) =>
          val dd = d.toInt
          val oo = o == "w" || o == "W"
          if (dist >= 0 && (dd != dist || oo != ordered))
            throw new IllegalArgumentException(
              s"mixed distance operators in one chain: $s")
          dist = dd; ordered = oo
        case other =>
          throw new IllegalArgumentException(s"bad distance op: $other")
      }
    }
    SpanNearQ(terms.result(), slop = dist - 1, inOrder = ordered)
  }
}

object QueryParser {

  /** Classic-QueryParser subset (reference grammar
    * lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/QueryParser.jj:64-169):
    * whitespace-separated clauses; `+t` MUST, `-t` MUST_NOT, `"a b"` phrase,
    * `pre*` prefix, `a?b*` wildcard, `t~` / `t~1` fuzzy, `AND`/`OR`/`NOT`
    * connectives; default operator OR (SHOULD). Terms are analyzed with the
    * same chain as indexing (lowercase + stopwords for `lang`).
    */
  /** `synonyms`: query-time synonym expansion (reference
    * synonym/SynonymFilter.java applied at query time — a term clause
    * with synonyms becomes a span-OR scored with blended statistics).
    * `foldAscii`: ASCII-fold query terms (reference
    * miscellaneous/ASCIIFoldingFilter.java) so `café` matches `cafe`. */
  def parse(q: String, lang: String = "en",
            synonyms: Map[String, Seq[String]] = Map.empty,
            foldAscii: Boolean = false): BoolQ = {
    val stop = StopSets.forLang(lang)
    val raw = tokenizeQuery(q)
    val clauses = scala.collection.mutable.ArrayBuffer[(Occur, Query)]()
    var pendingOccur: Option[Occur] = None
    var mustNext = false // after AND
    var i = 0
    while (i < raw.length) {
      val tok = raw(i)
      tok match {
        case "AND" | "&&" =>
          // promote previous clause to MUST, next too
          if (clauses.nonEmpty && clauses.last._1 == Occur.Should)
            clauses(clauses.length - 1) = (Occur.Must, clauses.last._2)
          mustNext = true
        case "OR" | "||" => mustNext = false
        case "NOT" | "!" => pendingOccur = Some(Occur.MustNot)
        case t =>
          val (occur0, body0) =
            if (t.startsWith("+")) (Occur.Must, t.substring(1))
            else if (t.startsWith("-")) (Occur.MustNot, t.substring(1))
            else (if (mustNext) Occur.Must else Occur.Should, t)
          val occur = pendingOccur.getOrElse(occur0)
          pendingOccur = None
          mustNext = false
          parseClause(body0, stop, synonyms, foldAscii)
            .foreach(qq => clauses += ((occur, qq)))
      }
      i += 1
    }
    BoolQ(clauses.toSeq)
  }

  private def tokenizeQuery(q: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = q.length
    while (i < n) {
      while (i < n && q(i).isWhitespace) i += 1
      if (i < n) {
        val start = i
        if (q(i) == '"' || (i + 1 < n && (q(i) == '+' || q(i) == '-') && q(i + 1) == '"')) {
          val qi = q.indexOf('"', if (q(i) == '"') i + 1 else i + 2)
          i = if (qi < 0) n else qi + 1
          // trailing ~slop / ^boost stays part of the phrase token
          while (i < n && !q(i).isWhitespace) i += 1
        } else {
          while (i < n && !q(i).isWhitespace) i += 1
        }
        out += q.substring(start, i)
      }
    }
    out.result()
  }

  /** The classic clause lowering, shared with the flexible
    * StandardParser (whose leaf-token grammar is the same). */
  private[search] def lowerClause(body0: String,
                                  stop: Set[String]): Option[Query] =
    parseClause(body0, stop)

  private def parseClause(body0: String, stop: Set[String],
                          synonyms: Map[String, Seq[String]] = Map.empty,
                          foldAscii: Boolean = false): Option[Query] = {
    if (body0.isEmpty) return None
    if (body0 == "*:*") return Some(MatchAllQ)
    def fold(s: String): String = if (foldAscii) Analyzer.foldToAscii(s) else s
    // ^boost suffix applies to any clause kind (classic grammar Clause^f)
    val caretAt = body0.lastIndexOf('^')
    val boost: Option[Float] =
      if (caretAt > 0) body0.substring(caretAt + 1).toFloatOption else None
    val body = if (boost.isDefined) body0.substring(0, caretAt) else body0
    def boosted(q: Query): Query =
      boost.filter(_ != 1f).map(BoostQ(q, _)).getOrElse(q)
    // fielded clause `field:rest` (classic grammar QueryParser.jj:107):
    // `path` is the extra indexed keyword field; `content` is the default
    if (body.startsWith("path:")) {
      val rest = body.substring(5)
      if (rest.isEmpty) return None
      val lc = rest.toLowerCase(java.util.Locale.ROOT)
      if (lc.endsWith("*") && !lc.dropRight(1).exists(c => c == '*' || c == '?'))
        return Some(boosted(PrefixQ("path:" + lc.dropRight(1))))
      if (lc.exists(c => c == '*' || c == '?'))
        return Some(boosted(WildcardQ("path:" + lc)))
      val toks = graft.index.IndexBuilder.pathTokens(rest)
      if (toks.isEmpty) return None
      return Some(boosted(
        if (toks.length == 1) TermQ("path:" + toks.head)
        // multi-segment path ("src/main") = exact phrase over segments
        else PhraseQ(toks.map("path:" + _).toSeq, toks.indices.toSeq)))
    }
    if (body.startsWith("content:")) // forward synonyms/folding so an
      // explicitly-fielded default-field term analyzes like an unfielded one
      return parseClause(body.substring(8), stop, synonyms, foldAscii).map(boosted)
    if (body.startsWith("\"")) {
      val close = body.lastIndexOf('"')
      val inner = body.substring(1, if (close > 0) close else body.length)
      val slop = if (close > 0 && close + 1 < body.length &&
          body(close + 1) == '~')
        body.substring(close + 2).toIntOption.getOrElse(0)
      else 0
      val terms = Analyzer.analyze(fold(inner), stop)
      if (terms.isEmpty) return None
      val base = terms.head.position
      val (ts, rel) = (terms.map(_.term), terms.map(_.position - base))
      return Some(boosted(
        if (slop > 0) SloppyPhraseQ(ts, rel, slop)
        else PhraseQ(ts, rel)))
    }
    if (body.length > 2 && body.startsWith("/") && body.endsWith("/"))
      return Some(boosted(RegexpQ(body.substring(1, body.length - 1))))
    val fuzzyAt = body.lastIndexOf('~')
    if (fuzzyAt > 0) {
      val term = Analyzer.lowerCase(fold(body.substring(0, fuzzyAt)))
      val edits = body.substring(fuzzyAt + 1) match {
        case "" => 2
        case s => s.toIntOption.getOrElse(2).min(2)
      }
      return Some(boosted(FuzzyQ(term, edits)))
    }
    if (body.endsWith("*") && !body.dropRight(1).exists(c => c == '*' || c == '?'))
      // AnalyzingQueryParser semantics (queryparser/analyzing/
      // AnalyzingQueryParser.java:63): multi-term text runs through the
      // chain's folding too, so café* finds the folded index term cafe
      return Some(boosted(PrefixQ(Analyzer.lowerCase(fold(body.dropRight(1))))))
    if (body.exists(c => c == '*' || c == '?'))
      return Some(boosted(WildcardQ(Analyzer.lowerCase(fold(body)))))
    // plain term: run through analysis; stopword-only -> no clause.
    // Synonym expansion (query-time): term + synonyms as a span-OR
    // scored with blended statistics.
    val terms = Analyzer.analyze(fold(body), stop)
    terms.headOption.map { tp =>
      val syns = synonyms.getOrElse(tp.term, Nil)
      boosted(
        if (syns.isEmpty) TermQ(tp.term)
        else SpanOrQ(tp.term +: syns.map(s => Analyzer.lowerCase(fold(s)))))
    }
  }
}
