package graft.search

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Element, Node, NodeList}

/** The XML query parser (reference lucene/queryparser/src/java/org/apache/
  * lucene/queryparser/xml/CoreParser.java + builders/): parses the
  * reference's XML query syntax into this engine's Query AST.
  *
  * Element coverage (builders/ package):
  *   TermQuery, TermsQuery, BooleanQuery/Clause (occurs=must/mustnot/
  *   should/filter, boost attr), MatchAllDocsQuery, RangeQuery /
  *   RangeFilter (inclusive bounds), ConstantScoreQuery / FilteredQuery /
  *   CachedFilter (filters lower to Occur.Filter clauses; caching is the
  *   engine's concern, not the query's), TermsFilter, BooleanFilter,
  *   UserInputQuery (classic QueryParser text), DisjunctionMaxQuery
  *   (tieBreaker attr -> DisMax node, evaluated by JoinScorer.topKDisMax),
  *   SpanTerm, SpanOr, SpanOrTerms, SpanNear (slop/inOrder), SpanFirst
  *   (end), SpanNot (Include/Exclude), BoostingTermQuery.
  *
  * Lowering notes, mirroring the engine's span algebra (term-leg spans):
  * a SpanOrTerms / SpanOr-of-terms leg inside SpanNear becomes a
  * dictionary-expanded RegexpQ alternation leg of SpanNearMultiQ — the
  * same union-of-positions semantics as the reference's nested SpanOr.
  * Deeper span nesting (SpanNear inside SpanOr) and LikeThisQuery /
  * FuzzyLikeThisQuery / DuplicateFilter / NumericRange (engine ops with
  * their own entry points) are rejected with a clear error rather than
  * approximated. */
object XmlQuery {

  /** DisjunctionMaxQuery can't lower to the pure Query AST (max-combine);
    * callers evaluate it with JoinScorer.topKDisMax. */
  sealed trait Parsed
  final case class Lowered(q: Query) extends Parsed
  final case class DisMax(disjuncts: Seq[Parsed], tieBreaker: Float) extends Parsed

  def parse(xml: String): Parsed = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    build(doc.getDocumentElement)
  }

  /** Parse requiring a pure Query (throws if the root is a DisMax). */
  def parseQuery(xml: String): Query = parse(xml) match {
    case Lowered(q) => q
    case _: DisMax => throw new IllegalArgumentException(
      "DisjunctionMaxQuery is evaluated via JoinScorer.topKDisMax, not the Query AST")
  }

  private def children(e: Element): Seq[Element] = {
    val nl: NodeList = e.getChildNodes
    (0 until nl.getLength).map(nl.item).collect {
      case el: Element => el
    }
  }
  private def text(e: Element): String = e.getTextContent.trim
  private def attr(e: Element, name: String, dflt: String): String = {
    val v = e.getAttribute(name)
    if (v == null || v.isEmpty) dflt else v
  }
  private def boostOf(e: Element): Float = attr(e, "boost", "1.0").toFloat
  private def withBoost(q: Query, e: Element): Query = {
    val b = boostOf(e)
    if (b == 1.0f) q else BoostQ(q, b)
  }
  /** Whitespace+lowercase tokenization of element text (the reference
    * analyzes TermsQuery/SpanOrTerms text through the field analyzer). */
  private def terms(e: Element): Seq[String] =
    text(e).toLowerCase(java.util.Locale.ROOT)
      .split("\\W+").filter(_.nonEmpty).toSeq

  private def build(e: Element): Parsed = e.getTagName match {
    case "DisjunctionMaxQuery" =>
      DisMax(children(e).map(build), attr(e, "tieBreaker", "0.0").toFloat)
    case _ => Lowered(buildQuery(e))
  }

  private def buildQuery(e: Element): Query = e.getTagName match {
    case "TermQuery" => withBoost(TermQ(text(e).toLowerCase(java.util.Locale.ROOT)), e)
    case "TermsQuery" => withBoost(
      BoolQ(terms(e).map(t => (Occur.Should: Occur, TermQ(t)))), e)
    case "MatchAllDocsQuery" => MatchAllQ
    case "BooleanQuery" | "BooleanFilter" =>
      val clauses = children(e).collect {
        case c if c.getTagName == "Clause" =>
          val occur: Occur = attr(c, "occurs", "should") match {
            case "must" => Occur.Must
            case "mustnot" | "mustNot" => Occur.MustNot
            case "filter" => Occur.Filter
            case _ => Occur.Should
          }
          val sub = children(c).headOption.getOrElse(
            throw new IllegalArgumentException("Clause without child query"))
          (occur, buildQuery(sub))
      }
      withBoost(BoolQ(clauses), e)
    case "RangeQuery" | "RangeFilter" =>
      // the engine's RangeQ walks the term dictionary; non-content fields
      // live under a "field:" key prefix
      val fieldPrefix = attr(e, "fieldName", "contents") match {
        case "contents" | "" => ""
        case f => f + ":"
      }
      // reference RangeFilterBuilder.java:41-42: includeLower /
      // includeUpper default TRUE (both bounds inclusive)
      RangeQ(fieldPrefix + attr(e, "lowerTerm", ""),
        fieldPrefix + attr(e, "upperTerm", "￿"),
        incLo = attr(e, "includeLower", "true").toBoolean,
        incHi = attr(e, "includeUpper", "true").toBoolean)
    case "ConstantScoreQuery" | "CachedFilter" =>
      // one filter child; constant-scored set == a Filter-only BoolQ plus
      // MatchAll scoring (ConstantScoreQueryBuilder.java wraps the filter)
      val inner = buildQuery(children(e).headOption.getOrElse(
        throw new IllegalArgumentException(s"${e.getTagName} without child")))
      withBoost(BoolQ(Seq((Occur.Filter, inner), (Occur.Must, MatchAllQ))), e)
    case "FilteredQuery" =>
      // <Query> scored, <Filter> as a non-scoring conjunct
      val q = children(e).find(_.getTagName == "Query")
        .flatMap(c => children(c).headOption).map(buildQuery)
        .getOrElse(throw new IllegalArgumentException("FilteredQuery without Query"))
      val f = children(e).find(_.getTagName == "Filter")
        .flatMap(c => children(c).headOption).map(buildQuery)
        .getOrElse(throw new IllegalArgumentException("FilteredQuery without Filter"))
      withBoost(BoolQ(Seq((Occur.Must, q), (Occur.Filter, f))), e)
    case "TermsFilter" =>
      BoolQ(terms(e).map(t => (Occur.Should: Occur, TermQ(t))))
    case "UserQuery" => // UserInputQueryBuilder registers as <UserQuery>
      withBoost(QueryParser.parse(text(e)), e)
    case "SpanTerm" | "BoostingTermQuery" =>
      // standalone span term scores as the term (payload boost aside)
      withBoost(TermQ(text(e).toLowerCase(java.util.Locale.ROOT)), e)
    case "SpanOr" | "SpanOrTerms" =>
      SpanOrQ(spanLegTerms(e))
    case "SpanNear" =>
      val slop = attr(e, "slop", "0").toInt
      val inOrder = attr(e, "inOrder", "true").toBoolean
      val legs = children(e).map(spanLeg)
      if (legs.forall(_.isInstanceOf[TermQ]))
        SpanNearQ(legs.map(_.asInstanceOf[TermQ].term), slop, inOrder)
      else SpanNearMultiQ(legs, slop, inOrder)
    case "SpanFirst" =>
      val end = attr(e, "end", "1").toInt
      children(e).headOption.map(spanLeg) match {
        case Some(TermQ(t)) => SpanFirstQ(t, end)
        case _ => throw new IllegalArgumentException(
          "SpanFirst supports a single-term child in this engine")
      }
    case "SpanNot" =>
      def sole(tag: String): Query = children(e).find(_.getTagName == tag)
        .flatMap(c => children(c).headOption).map(spanLeg)
        .getOrElse(throw new IllegalArgumentException(s"SpanNot without $tag"))
      (sole("Include"), sole("Exclude")) match {
        case (TermQ(inc), TermQ(exc)) => SpanNotQ(inc, exc)
        case _ => throw new IllegalArgumentException(
          "SpanNot supports term Include/Exclude in this engine")
      }
    case other => throw new IllegalArgumentException(
      s"unsupported XML query element <$other>")
  }

  /** A span leg: SpanTerm -> TermQ; SpanOrTerms / SpanOr-of-terms -> a
    * dictionary-expanded alternation (RegexpQ), the engine's union-of-
    * positions leg; BoostingTermQuery -> its term. */
  private def spanLeg(e: Element): Query = e.getTagName match {
    case "SpanTerm" | "BoostingTermQuery" =>
      TermQ(text(e).toLowerCase(java.util.Locale.ROOT))
    case "SpanOr" | "SpanOrTerms" =>
      val ts = spanLegTerms(e)
      if (ts.length == 1) TermQ(ts.head)
      // parenthesized: the engine anchors the pattern as "^" + p + "$"
      else RegexpQ(ts.map(java.util.regex.Pattern.quote).mkString("(", "|", ")"))
    case other => throw new IllegalArgumentException(
      s"span nesting deeper than term legs is not supported (<$other>)")
  }

  private def spanLegTerms(e: Element): Seq[String] = e.getTagName match {
    case "SpanOrTerms" => terms(e)
    case "SpanOr" => children(e).flatMap {
      case c if c.getTagName == "SpanTerm" =>
        Seq(text(c).toLowerCase(java.util.Locale.ROOT))
      case c if c.getTagName == "SpanOrTerms" => terms(c)
      case c => throw new IllegalArgumentException(
        s"SpanOr over non-term spans is not supported (<${c.getTagName}>)")
    }
    case _ => Seq(text(e).toLowerCase(java.util.Locale.ROOT))
  }
}
