package graft.analysis

/** MorfologikFilter semantics — dictionary lemmatization for Polish.
  *
  * Reference:
  *  - lucene/analysis/morfologik/src/java/org/apache/lucene/analysis/morfologik/MorfologikFilter.java:96-151
  *  - lucene/analysis/morfologik/src/java/org/apache/lucene/analysis/morfologik/MorfologikAnalyzer.java
  *    (chain: StandardTokenizer -> StandardFilter -> MorfologikFilter; note
  *    there is NO lowercase stage — lookup is case-sensitive with a
  *    lowercased fallback)
  *  - test vectors: TestMorfologikAnalyzer.java:42-199
  *
  * Per token (MorfologikFilter.incrementToken):
  *  - keyword-marked tokens pass through untouched (keywordAttr.isKeyword
  *    gate, MorfologikFilter.java:137);
  *  - otherwise the surface form is looked up as-is, then — only if that
  *    misses — lowercased per codepoint and looked up again
  *    (lookupSurfaceForm(termAtt) || lookupSurfaceForm(toLowercase(termAtt)),
  *    MorfologikFilter.java:138);
  *  - on a hit the token is REPLACED by every dictionary lemma: the first
  *    lemma keeps the token's own position increment, the rest stack at
  *    posInc 0; offsets and token type are the original token's
  *    (restoreState + setPositionIncrement(0), MorfologikFilter.java:132-135);
  *  - on a miss the token passes through unchanged.
  *
  * Each lemma carries one concatenated morphosyntactic tag; consumers see it
  * split on `+` or `|` (lemmaSplitter, MorfologikFilter.java:97).
  *
  * The production Polish dictionary is the morfologik project's FSA build —
  * an external artifact the reference pulls as a jar dependency, not shipped
  * in its tree (environmental here). [[parseDict]] reads the public
  * tab-separated interchange format the FSA is compiled from
  * (`surface<TAB>lemma<TAB>tag` per line), which is the shape a cluster
  * deployment would broadcast; [[testDict]] is a fixture holding exactly the
  * entries the reference's own test vectors exercise.
  *
  * Scale posture: the full Polish lemma table is a few-ten-MB map — a
  * broadcast, never a shuffle; lemmatization itself is a per-row flatMap.
  */
object Morfologik {

  /** One dictionary entry: a lemma (stem) plus its concatenated
    * morphosyntactic tag ("" when the dictionary carries none). */
  final case class Lemma(stem: String, tag: String = "")

  /** Emitted token plus its split tag list (MorphosyntacticTagsAttribute). */
  final case class MorfToken(term: String, startOffset: Int, endOffset: Int,
                             posInc: Int, tags: List[String])

  private val lemmaSplitter = "[+|]" // MorfologikFilter.java:97 \+|\|

  private def splitTags(tag: String): List[String] =
    if (tag.isEmpty) Nil else tag.split(lemmaSplitter).toList

  /** Apply MorfologikFilter over an already-tokenized stream. */
  def lemmatize(toks: IndexedSeq[Token],
                dict: Map[String, Seq[Lemma]],
                keywords: Set[String] = Set.empty): Vector[MorfToken] = {
    val out = Vector.newBuilder[MorfToken]
    for (t <- toks) {
      val hit: Seq[Lemma] =
        if (keywords.contains(t.term)) Nil
        else dict.getOrElse(t.term,
          dict.getOrElse(Analyzer.lowerCase(t.term), Nil))
      if (hit.isEmpty)
        out += MorfToken(t.term, t.startOffset, t.endOffset, t.posInc, Nil)
      else hit.zipWithIndex.foreach { case (l, i) =>
        out += MorfToken(l.stem, t.startOffset, t.endOffset,
          if (i == 0) t.posInc else 0, splitTags(l.tag))
      }
    }
    out.result()
  }

  /** MorfologikAnalyzer chain (StandardTokenizer -> StandardFilter (no-op in
    * 5.x) -> MorfologikFilter) as (terms, positions) for indexing. */
  def analyzeFlat(text: String, dict: Map[String, Seq[Lemma]],
                  keywords: Set[String] = Set.empty): (Array[String], Array[Int]) = {
    val toks = lemmatize(StandardTokenizer.tokenize(text), dict, keywords)
    val terms = new Array[String](toks.length)
    val positions = new Array[Int](toks.length)
    var pos = -1
    var i = 0
    while (i < toks.length) {
      pos += toks(i).posInc
      terms(i) = toks(i).term
      positions(i) = pos
      i += 1
    }
    (terms, positions)
  }

  /** Parse the tab-separated dictionary interchange format
    * (`surface<TAB>lemma<TAB>tag`, one entry per line; the text form the
    * morfologik FSA compiler consumes). Later lines append — a surface with
    * several entries keeps them in file order, which is the order the FSA
    * traversal reports and the order the filter emits. */
  def parseDict(lines: Iterator[String]): Map[String, Seq[Lemma]] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Lemma]]
    for (ln <- lines if ln.nonEmpty && !ln.startsWith("#")) {
      val parts = ln.split('\t')
      if (parts.length >= 2) {
        val tag = if (parts.length >= 3) parts(2) else ""
        m.update(parts(0), m.getOrElse(parts(0), Vector.empty) :+ Lemma(parts(1), tag))
      }
    }
    m.toMap
  }

  /** Fixture dictionary: the entries the reference's TestMorfologikAnalyzer
    * vectors exercise (what the real Polish FSA returns for those surfaces;
    * tags are asserted only for "liście" — testPOSAttribute). */
  val testDict: Map[String, Seq[Lemma]] = Map(
    "liście" -> Seq(
      Lemma("liście", "subst:sg:acc:n2+subst:sg:nom:n2+subst:sg:voc:n2"),
      Lemma("liść", "subst:pl:acc:m3+subst:pl:nom:m3+subst:pl:voc:m3"),
      Lemma("list", "subst:sg:loc:m3+subst:sg:voc:m3"),
      Lemma("lista", "subst:sg:dat:f+subst:sg:loc:f")),
    "danych" -> Seq(Lemma("dany"), Lemma("dana"), Lemma("dane"), Lemma("dać")),
    "a" -> Seq(Lemma("a")),
    "t" -> Seq(Lemma("tom"), Lemma("tona")),
    "AGD" -> Seq(Lemma("AGD"), Lemma("artykuły gospodarstwa domowego")),
    "agd" -> Seq(Lemma("artykuły gospodarstwa domowego")),
    "Poznania" -> Seq(Lemma("Poznań")),
    "poznania" -> Seq(Lemma("poznanie"), Lemma("poznać")),
    "Aarona" -> Seq(Lemma("Aaron")))
}
