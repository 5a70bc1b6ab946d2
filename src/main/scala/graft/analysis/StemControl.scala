package graft.analysis

/** KeywordMarkerFilter + StemmerOverrideFilter semantics: a term in the
  * keyword set passes the stemmer untouched; a term in the override map
  * is replaced by its mapped form and marked keyword (so the stemmer
  * skips it too); everything else is stemmed normally.
  *
  * Reference:
  *  - lucene/analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/SetKeywordMarkerFilter.java:29-49
  *  - lucene/analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/StemmerOverrideFilter.java:41-76
  *    (override wins over the stemmer and sets keywordAtt)
  */
object StemControl {

  def porterWithControl(term: String, keywords: Set[String],
                        overrides: Map[String, String]): String =
    if (keywords.contains(term)) term
    else overrides.get(term) match {
      case Some(o) => o
      case None => PorterStemmer.stem(term)
    }
}
