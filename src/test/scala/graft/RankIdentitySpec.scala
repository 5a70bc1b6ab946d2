package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index._
import graft.search._

/** End-to-end rank-identity: engine (join path AND WAND path) vs the naive
  * oracle on the FIXTURES.md §5 reference query set — exact (docId, float
  * score bits) sequence equality, the sandbox stand-in for comparing
  * against IndexSearcher.search(topK). */
class RankIdentitySpec extends AnyFunSuite {
  import SparkSuite.spark
  import spark.implicits._

  private val cfg = IndexConfig(numDocParts = 8, numBuckets = 8, waves = 2,
    hotDfThreshold = 300, saltShift = 6, shufflePartitions = 8)

  private lazy val dir: String = {
    val d = SparkSuite.tmpDir("graft-index")
    val corpus = CorpusGen.generate(spark, 800, seed = 42L, parts = 8)
    IndexBuilder.build(spark, corpus.toDF(), d, cfg)
    d
  }
  private lazy val reader = IndexReader(spark, dir, cfg)
  private lazy val joiner = new JoinScorer(reader)
  private lazy val wand = new WandScorer(reader)

  /** Oracle over the same docs with the engine's docIds. */
  private lazy val oracle: NaiveOracle.Index = {
    val docs = reader.docmeta
      .join(CorpusGen.generate(spark, 800, seed = 42L, parts = 8).toDF()
        .withColumnRenamed("lang", "lang2"),
        Seq("repo", "path", "commit"))
      .select($"docId", $"lang", $"content")
      .as[(Long, String, String)].collect()
      .map(t => NaiveOracle.Doc(t._1, t._2, t._3))
    assert(docs.length == 800)
    new NaiveOracle.Index(docs.toSeq)
  }

  private def engineTopK(q: BoolQ, k: Int = 10): Seq[(Long, Float)] =
    joiner.topK(q, k).as[(Long, Float)].collect().toSeq

  private def checkQuery(q: BoolQ, k: Int = 10): Unit = {
    val exp = oracle.topK(q, k)
    val got = engineTopK(q, k)
    assert(got == exp, s"\nquery: $q\nexpected: $exp\ngot: $got")
  }

  test("index builds with salted hot terms") {
    val hot = reader.termStatsDf.where($"df" >= cfg.hotDfThreshold)
      .select("term").as[String].collect().toSet
    assert(hot.contains("import") && hot.contains("return"))
  }

  test("q1: single hot term (salted path)") {
    checkQuery(BoolQ(Seq(Occur.Should -> TermQ("import"))))
  }

  test("q2: single rare term") {
    val rare = oracle.allTerms.find(t => oracle.df(t) == 1).get
    checkQuery(BoolQ(Seq(Occur.Should -> TermQ(rare))))
  }

  test("q3: OR of two mixed-frequency terms (float sum, clause order)") {
    checkQuery(BoolQ(Seq(Occur.Should -> TermQ("import"),
      Occur.Should -> TermQ("spark"))))
  }

  test("q4: AND of two terms (conjunction)") {
    checkQuery(BoolQ(Seq(Occur.Must -> TermQ("import"),
      Occur.Must -> TermQ("println"))))
  }

  test("q5: AND + NOT (required + prohibited)") {
    checkQuery(BoolQ(Seq(Occur.Must -> TermQ("import"),
      Occur.MustNot -> TermQ("void"))))
  }

  test("q6: OR with minShouldMatch=2 of 3") {
    checkQuery(BoolQ(Seq(Occur.Should -> TermQ("spark"),
      Occur.Should -> TermQ("println"), Occur.Should -> TermQ("merge")),
      minShouldMatch = 2))
  }

  test("q7: exact phrase (positions)") {
    val q = QueryParser.parse("\"import spark\"")
    assert(q.clauses.head._2.isInstanceOf[PhraseQ])
    checkQuery(q)
  }

  test("q7b: boosted OR (weight = idf*boost*(k1+1), float order)") {
    checkQuery(BoolQ(Seq(Occur.Should -> BoostQ(TermQ("spark"), 2.5f),
      Occur.Should -> TermQ("merge"))))
  }

  test("q7c: sloppy phrase (reference pq-walk freq)") {
    val q = QueryParser.parse("\"import spark\"~2")
    assert(q.clauses.head._2.isInstanceOf[SloppyPhraseQ])
    checkQuery(q)
  }

  test("q7c2: 3-term sloppy phrase (n-term walk)") {
    checkQuery(BoolQ(Seq(Occur.Must ->
      SloppyPhraseQ(Seq("import", "spark", "merge"), Seq(0, 1, 2), 3))))
  }

  test("q7c3: sloppy phrase with a repeated term (repeat groups)") {
    checkQuery(BoolQ(Seq(Occur.Must ->
      SloppyPhraseQ(Seq("import", "spark", "import"), Seq(0, 1, 2), 4))))
  }

  test("q7h: nested boolean clauses (BooleanQuery in BooleanQuery)") {
    // MUST( SHOULD(import, println), merge ) — SimpleParser's tree shape
    checkQuery(BoolQ(Seq(
      Occur.Must -> BoolQ(Seq(Occur.Should -> TermQ("import"),
        Occur.Should -> TermQ("println"))),
      Occur.Must -> TermQ("merge"))))
    // negation wrapper: SHOULD(spark), (MUST_NOT(void) SHOULD(MatchAll))
    checkQuery(BoolQ(Seq(
      Occur.Must -> TermQ("spark"),
      Occur.Must -> BoolQ(Seq(Occur.MustNot -> TermQ("void"),
        Occur.Should -> MatchAllQ)))))
    // boosted nested subquery scales the inner sum
    checkQuery(BoolQ(Seq(
      Occur.Should -> BoostQ(BoolQ(Seq(Occur.Should -> TermQ("import"),
        Occur.Should -> TermQ("merge"))), 2.5f),
      Occur.Should -> TermQ("spark"))))
  }

  test("q7i: SimpleParser end-to-end rank identity") {
    val q = graft.search.SimpleParser
      .parse("import+(merge|println) -void").asInstanceOf[BoolQ]
    checkQuery(q)
  }

  test("q7d: regexp + range multi-term rewrites (const score)") {
    checkQuery(BoolQ(Seq(Occur.Should -> RegexpQ("im.*t"),
      Occur.Should -> RangeQ("print", "publir"))))
  }

  test("q7e: boosted const-score rewrite scores boost, not 1") {
    // boost changes the rank ORDER vs the scored term clause — a dropped
    // boost (round-1 bug) collapses back to 1f and reorders
    checkQuery(BoolQ(Seq(Occur.Should -> BoostQ(PrefixQ("id1"), 3f),
      Occur.Should -> TermQ("spark"))), 20)
    checkQuery(BoolQ(Seq(Occur.Should -> BoostQ(MatchAllQ, 0.5f),
      Occur.Should -> TermQ("merge"))), 20)
  }

  test("q7f: multi-phrase (per-slot alternatives, blended stats)") {
    val q = BoolQ(Seq(Occur.Should -> MultiPhraseQ(
      Seq(Seq("import", "return"), Seq("val", "def")), Seq(0, 1))))
    assert(oracle.topK(q, 10).nonEmpty, "fixture must have matches")
    checkQuery(q)
    // a slot mixing present + absent alternatives still scores correctly
    checkQuery(BoolQ(Seq(Occur.Should -> MultiPhraseQ(
      Seq(Seq("import", "zzznope"), Seq("val")), Seq(0, 1)))))
  }

  test("q7g: span-within and span-containing") {
    val qw = BoolQ(Seq(Occur.Must ->
      SpanWithinQ("val", Seq("import", "return"), 8)))
    val qc = BoolQ(Seq(Occur.Must ->
      SpanContainingQ("val", Seq("import", "return"), 8)))
    assert(oracle.topK(qw, 10).nonEmpty, "fixture must have matches")
    checkQuery(qw)
    checkQuery(qc)
  }


  test("multi-term rewrite beyond maxClauseCount raises TooManyClauses") {
    // the corpus has ~1000 idNNN terms + numbers; a tiny limit must throw
    intercept[graft.index.SearchReader.TooManyClauses] {
      reader.expandTerms($"term".startsWith("id"), limit = 5)
    }
    // and the default path still expands small sets fine
    assert(reader.expandTerms($"term".startsWith("id17")).nonEmpty)
  }

  test("fuzzy expansion: length-banded pre-filter matches plain levenshtein") {
    val banded = reader.fuzzyTerms("sprk", 2).map(_.term).toSet
    val brute = oracle.allTerms.filter(t => NaiveOracle.lev(t, "sprk") <= 2).toSet
    assert(banded == brute)
  }

  test("q8: absent term -> empty") {
    assert(engineTopK(BoolQ(Seq(Occur.Should -> TermQ("zzzznotthere")))).isEmpty)
  }

  test("q9: 100% stopword query -> empty after analysis") {
    val q = QueryParser.parse("the a an of")
    assert(q.clauses.isEmpty)
    assert(engineTopK(q).isEmpty)
  }

  test("q10: near-tie docs break toward lower docId (HitQueue.java:76-81)") {
    // identical-content pairs exist by CorpusGen design; a broad query must
    // produce equal scores broken by docId asc
    val got = engineTopK(BoolQ(Seq(Occur.Should -> TermQ("import"))), 50)
    got.sliding(2).foreach {
      case Seq((d1, s1), (d2, s2)) =>
        assert(s1 > s2 || (s1 == s2 && d1 < d2))
      case _ =>
    }
    val ties = got.groupBy(_._2).filter(_._2.length > 1)
    assert(ties.nonEmpty, "corpus should contain score ties")
  }

  test("prefix / wildcard / fuzzy rewrite to constant-score sets") {
    checkQuery(BoolQ(Seq(Occur.Should -> PrefixQ("id1"))), 20)
    checkQuery(BoolQ(Seq(Occur.Should -> WildcardQ("id?7*"))), 20)
    checkQuery(BoolQ(Seq(Occur.Should -> FuzzyQ("sprk", 2))), 20)
  }

  test("searchAfter paging == oracle") {
    val q = BoolQ(Seq(Occur.Should -> TermQ("import")))
    val page1 = engineTopK(q, 10)
    val (d0, s0) = page1.last
    val exp = oracle.searchAfter(q, 10, s0, d0)
    val got = joiner.searchAfter(q, 10, s0, d0).as[(Long, Float)].collect().toSeq
    assert(got == exp)
    // no overlap between pages
    assert(page1.map(_._1).toSet.intersect(got.map(_._1).toSet).isEmpty)
  }

  test("reRank combined page == oracle (head re-sorted, tail keeps main order)") {
    val main = BoolQ(Seq(Occur.Should -> TermQ("import"),
      Occur.Should -> TermQ("spark")))
    val second = BoolQ(Seq(Occur.Should -> TermQ("merge")))
    val (rrDocs, len, w) = (8, 14, 3.0)
    // naive re-derivation of ReRankQParserPlugin's collector: top
    // max(rrDocs, len) by (score desc, docId), first rrDocs rescored
    // main + w*second and re-sorted, the rest appended in main order
    val ms = oracle.scores(main).toSeq
      .sortBy { case (d, s) => (-s, d) }.take(math.max(rrDocs, len))
    val ss = oracle.scores(second)
    val head = ms.take(rrDocs)
      .map { case (d, s) => (d, s.toDouble + w * ss.getOrElse(d, 0f).toDouble) }
      .sortBy { case (d, c) => (-c, d) }.map(_._1)
    val exp = (head ++ ms.drop(rrDocs).map(_._1)).take(len)
      .zipWithIndex.map { case (d, i) => ((i + 1).toLong, d) }
    val got = joiner.reRank(main, second, rrDocs, w, len)
      .select($"rank", $"docId").orderBy($"rank")
      .as[(Long, Long)].collect().toSeq
    assert(got == exp)
    // the tail is main-ordered, not score-ordered: rescoring must have
    // actually permuted the head for the combined-page case to be tested
    assert(head != ms.take(rrDocs).map(_._1), "rerank permuted nothing")
  }

  test("WAND path == join path == oracle (OR)") {
    for (terms <- Seq(Seq("import"), Seq("import", "spark"),
      Seq("spark", "println", "merge"), Seq("id001", "import", "dataset"))) {
      val exp = oracle.topK(BoolQ(terms.map(t => (Occur.Should, TermQ(t)))), 10)
      val got = wand.topK(terms, 10).as[(Long, Float)].collect().toSeq
      assert(got == exp, s"\nWAND OR $terms\nexpected: $exp\ngot: $got")
    }
  }

  test("fuzzy expansion respects field boundaries (no content<->path leakage)") {
    // a path-field fuzzy query must expand ONLY into path: dictionary
    // terms — levenshtein can cross the field prefix (content "pathlib"
    // is 1 edit from "path:lib"), so the guard is explicit
    val pathExp = reader.fuzzyTerms("path:src", 2)
    assert(pathExp.nonEmpty)
    assert(pathExp.forall(_.term.startsWith("path:")),
      pathExp.filterNot(_.term.startsWith("path:")).map(_.term).take(5))
    // content fuzzy never returns path:/rev: dictionary entries
    val contentExp = reader.fuzzyTerms("import", 2)
    assert(contentExp.nonEmpty)
    assert(contentExp.forall(t =>
      !t.term.startsWith("path:") && !t.term.startsWith("rev:")))
  }

  test("WAND path == oracle with DUPLICATE clauses (each occurrence scores)") {
    // duplicate SHOULD clauses each contribute a clause frame (Lucene
    // BooleanQuery keeps duplicates); a term->single-index map dropped
    // the extra cursors and returned EMPTY for +foo +foo
    val exp2 = oracle.topK(BoolQ(Seq(
      (Occur.Should, TermQ("import")), (Occur.Should, TermQ("import")))), 10)
    val got2 = wand.topK(Seq("import", "import"), 10)
      .as[(Long, Float)].collect().toSeq
    assert(got2 == exp2, s"\nOR dup\nexpected: $exp2\ngot: $got2")
    val expA = oracle.topK(BoolQ(Seq(
      (Occur.Must, TermQ("spark")), (Occur.Must, TermQ("spark")))), 10)
    val gotA = wand.topK(Seq("spark", "spark"), 10, conjunctive = true)
      .as[(Long, Float)].collect().toSeq
    assert(gotA.nonEmpty, "conjunctive duplicate returned empty")
    assert(gotA == expA, s"\nAND dup\nexpected: $expA\ngot: $gotA")
    val expM = oracle.topK(BoolQ(Seq(
      (Occur.Should, TermQ("merge")), (Occur.Should, TermQ("merge")),
      (Occur.Should, TermQ("spark"))), minShouldMatch = 2), 10)
    val gotM = wand.topK(Seq("merge", "merge", "spark"), 10,
      minShouldMatch = 2).as[(Long, Float)].collect().toSeq
    assert(gotM == expM, s"\nmsm dup\nexpected: $expM\ngot: $gotM")
  }

  test("WAND path == oracle (AND)") {
    for (terms <- Seq(Seq("import", "println"), Seq("import", "return", "spark"))) {
      val exp = oracle.topK(BoolQ(terms.map(t => (Occur.Must, TermQ(t)))), 10)
      val got = wand.topK(terms, 10, conjunctive = true)
        .as[(Long, Float)].collect().toSeq
      assert(got == exp, s"\nWAND AND $terms\nexpected: $exp\ngot: $got")
    }
  }

  test("randomized boolean-query sweep == oracle (terms, phrases, " +
    "prefixes, boosts, msm; WAND agrees on pure disjunctions)") {
    val rng = new scala.util.Random(20260817L)
    val pool = Vector("import", "return", "spark", "println", "merge",
      "dataset", "data", "set", "void", "val", "def", "id001", "id007",
      "absentzzz")
    def term(): String = pool(rng.nextInt(pool.length))
    def leaf(): Query = rng.nextInt(10) match {
      case 0 => PhraseQ(Seq(term(), term()), Seq(0, 1))
      case 1 => PrefixQ(Seq("im", "pri", "id0", "da")(rng.nextInt(4)))
      case 2 => BoostQ(TermQ(term()), 1f + rng.nextInt(3).toFloat / 2f)
      case 3 => // n-term sloppy phrase, repeats allowed (pq-walk semantics)
        val k = 2 + rng.nextInt(3)
        SloppyPhraseQ(Seq.fill(k)(term()), 0 until k, 1 + rng.nextInt(4))
      case _ => TermQ(term())
    }
    def occur(): Occur = rng.nextInt(20) match {
      case n if n < 12 => Occur.Should
      case n if n < 17 => Occur.Must
      case _           => Occur.MustNot
    }
    var checked = 0
    for (_ <- 1 to 60) {
      val n = 1 + rng.nextInt(4)
      var clauses = Seq.fill(n)((occur(), leaf()))
      if (!clauses.exists(_._1 != Occur.MustNot))
        clauses = (Occur.Should: Occur, leaf()) +: clauses
      val nShould = clauses.count(_._1 == Occur.Should)
      val msm =
        if (nShould >= 2 && !clauses.exists(_._1 == Occur.Must) &&
          rng.nextInt(4) == 0) 1 + rng.nextInt(nShould) else 0
      val q = BoolQ(clauses, msm)
      checkQuery(q, 15)
      checked += 1
      // WAND must agree with the spec path on pure term disjunctions
      if (msm == 0 && clauses.forall { case (o, l) =>
        o == Occur.Should && l.isInstanceOf[TermQ] }) {
        val ts = clauses.map(_._2.asInstanceOf[TermQ].term)
        val exp = oracle.topK(q, 15)
        val got = wand.topK(ts, 15).as[(Long, Float)].collect().toSeq
        assert(got == exp, s"WAND mismatch on $ts")
      }
    }
    assert(checked == 60)
  }

  test("query parser: classic subset") {
    val q = QueryParser.parse("+import -void \"data set\" spark print*")
    val occurs = q.clauses.map(_._1)
    assert(occurs.head == Occur.Must && occurs(1) == Occur.MustNot)
    assert(q.clauses(2)._2.isInstanceOf[PhraseQ])
    assert(q.clauses(3)._2 == TermQ("spark"))
    assert(q.clauses(4)._2 == PrefixQ("print"))
    val and = QueryParser.parse("import AND spark")
    assert(and.clauses.forall(_._1 == Occur.Must))
  }
}
