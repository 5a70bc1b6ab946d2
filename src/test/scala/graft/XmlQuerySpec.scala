package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search._
import graft.search.Occur._

/** The reference's own XML test queries (queryparser/src/test/.../xml/
  * *.xml, driven by TestParser.java), asserted against the expected
  * lowered Query trees. */
class XmlQuerySpec extends AnyFunSuite {

  test("TermQuery.xml") {
    assert(XmlQuery.parseQuery(
      """<TermQuery fieldName="contents">sumitomo</TermQuery>""") === TermQ("sumitomo"))
  }

  test("TermsQuery.xml analyzes into should-terms") {
    assert(XmlQuery.parseQuery(
      """<TermsQuery fieldName="contents">sumitomo bank</TermsQuery>""") ===
      BoolQ(Seq((Should, TermQ("sumitomo")), (Should, TermQ("bank")))))
  }

  test("BooleanQuery.xml with occurs attributes") {
    val xml =
      """<BooleanQuery fieldName="contents">
        |  <Clause occurs="should"><TermQuery>merger</TermQuery></Clause>
        |  <Clause occurs="mustnot"><TermQuery>sumitomo</TermQuery></Clause>
        |  <Clause occurs="must"><TermQuery>bank</TermQuery></Clause>
        |</BooleanQuery>""".stripMargin
    assert(XmlQuery.parseQuery(xml) === BoolQ(Seq(
      (Should, TermQ("merger")), (MustNot, TermQ("sumitomo")), (Must, TermQ("bank")))))
  }

  test("NestedBooleanQuery.xml: child clauses only (the getElementsByTagName bug)") {
    val xml =
      """<BooleanQuery fieldName="contents">
        |  <Clause occurs="should">
        |    <BooleanQuery fieldName="contents">
        |      <Clause occurs="must"><TermQuery>doesnotexist</TermQuery></Clause>
        |    </BooleanQuery>
        |  </Clause>
        |  <Clause occurs="should"><TermQuery>bank</TermQuery></Clause>
        |</BooleanQuery>""".stripMargin
    assert(XmlQuery.parseQuery(xml) === BoolQ(Seq(
      (Should, BoolQ(Seq((Must, TermQ("doesnotexist"))))),
      (Should, TermQ("bank")))))
  }

  test("MatchAllDocsQuery.xml with a range filter clause") {
    val xml =
      """<BooleanQuery>
        |  <Clause occurs="must"><MatchAllDocsQuery/></Clause>
        |  <Clause occurs="filter">
        |    <RangeQuery fieldName="date" lowerTerm="19870409" upperTerm="19870412"/>
        |  </Clause>
        |</BooleanQuery>""".stripMargin
    assert(XmlQuery.parseQuery(xml) === BoolQ(Seq(
      (Must, MatchAllQ),
      (Filter, RangeQ("date:19870409", "date:19870412", incLo = true, incHi = true)))))
  }

  test("UserQuery lowers through the classic QueryParser") {
    val q = XmlQuery.parseQuery("""<UserQuery>"bank of england"</UserQuery>""")
    assert(q.isInstanceOf[PhraseQ] || q.isInstanceOf[BoolQ], q.toString)
  }

  test("ConstantScoreQuery.xml: filter set + MatchAll scoring") {
    val q = XmlQuery.parseQuery(
      """<ConstantScoreQuery>
        |  <RangeQuery fieldName="date" lowerTerm="19870409" upperTerm="19870412"/>
        |</ConstantScoreQuery>""".stripMargin)
    assert(q === BoolQ(Seq(
      (Filter, RangeQ("date:19870409", "date:19870412", incLo = true, incHi = true)), (Must, MatchAllQ))))
  }

  test("FilteredQuery / RangeFilter / TermsFilter / BooleanFilter lower to Filter clauses") {
    val xml =
      """<FilteredQuery>
        |  <Query><TermQuery>bank</TermQuery></Query>
        |  <Filter>
        |    <BooleanFilter>
        |      <Clause occurs="should">
        |        <RangeFilter fieldName="date" lowerTerm="19870409" upperTerm="19870412"/>
        |      </Clause>
        |      <Clause occurs="mustNot">
        |        <TermsFilter fieldName="contents">Emcore</TermsFilter>
        |      </Clause>
        |    </BooleanFilter>
        |  </Filter>
        |</FilteredQuery>""".stripMargin
    assert(XmlQuery.parseQuery(xml) === BoolQ(Seq(
      (Must, TermQ("bank")),
      (Filter, BoolQ(Seq(
        (Should, RangeQ("date:19870409", "date:19870412", incLo = true, incHi = true)),
        (MustNot, BoolQ(Seq((Should, TermQ("emcore")))))))))))
  }

  test("DisjunctionMaxQuery.xml: tieBreaker and nesting preserved") {
    val p = XmlQuery.parse(
      """<DisjunctionMaxQuery>
        |  <TermQuery fieldName="a">merger</TermQuery>
        |  <DisjunctionMaxQuery tieBreaker="1.2">
        |    <TermQuery fieldName="b">verger</TermQuery>
        |  </DisjunctionMaxQuery>
        |</DisjunctionMaxQuery>""".stripMargin)
    p match {
      case XmlQuery.DisMax(ds, tie) =>
        assert(tie === 0.0f && ds.length === 2)
        assert(ds.head === XmlQuery.Lowered(TermQ("merger")))
        ds(1) match {
          case XmlQuery.DisMax(inner, t2) =>
            assert(t2 === 1.2f && inner === Seq(XmlQuery.Lowered(TermQ("verger"))))
          case other => fail(other.toString)
        }
      case other => fail(other.toString)
    }
  }

  test("SpanQuery elements: near/or/first/not over term legs") {
    assert(XmlQuery.parseQuery(
      """<SpanNear slop="8" inOrder="false">
        |  <SpanTerm>social</SpanTerm><SpanTerm>services</SpanTerm>
        |</SpanNear>""".stripMargin) ===
      SpanNearQ(Seq("social", "services"), 8, inOrder = false))
    assert(XmlQuery.parseQuery("<SpanOrTerms>miner miners</SpanOrTerms>") ===
      SpanOrQ(Seq("miner", "miners")))
    assert(XmlQuery.parseQuery(
      """<SpanFirst end="10"><SpanTerm>fire</SpanTerm></SpanFirst>""") ===
      SpanFirstQ("fire", 10))
    assert(XmlQuery.parseQuery(
      """<SpanNot>
        |  <Include><SpanTerm>social</SpanTerm></Include>
        |  <Exclude><SpanTerm>public</SpanTerm></Exclude>
        |</SpanNot>""".stripMargin) === SpanNotQ("social", "public"))
    // an or-terms leg inside a near becomes a dictionary-expanded leg
    val near = XmlQuery.parseQuery(
      """<SpanNear slop="6" inOrder="false">
        |  <SpanTerm>mine</SpanTerm>
        |  <SpanOrTerms>worker workers</SpanOrTerms>
        |</SpanNear>""".stripMargin)
    near match {
      case SpanNearMultiQ(Seq(TermQ("mine"), RegexpQ(p)), 6, false) =>
        assert(p.contains("worker") && p.startsWith("(") && p.endsWith(")"))
      case other => fail(other.toString)
    }
  }

  test("boost attributes wrap in BoostQ; unsupported elements are refused") {
    assert(XmlQuery.parseQuery(
      """<TermQuery boost="2.5">bank</TermQuery>""") === BoostQ(TermQ("bank"), 2.5f))
    intercept[IllegalArgumentException] {
      XmlQuery.parseQuery("<LikeThisQuery>some text</LikeThisQuery>")
    }
    intercept[IllegalArgumentException] { // span nesting beyond term legs
      XmlQuery.parseQuery(
        """<SpanOr><SpanNear slop="2" inOrder="true">
          |<SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanNear></SpanOr>""".stripMargin)
    }
  }
}
