package graft.analysis

import java.text.BreakIterator
import java.util.Locale

/** Thai word segmentation (reference th/ThaiTokenizer.java:36 and
  * th/ThaiAnalyzer.java:101): Thai writes no spaces between words, so the
  * tokenizer sentence-splits with the ROOT sentence BreakIterator and then
  * segments each sentence with the JRE's dictionary-based Thai word
  * BreakIterator, keeping segments whose first code point is a letter or
  * digit. The analyzer chain is tokenizer -> LowerCaseFilter -> StopFilter
  * (the reference's th/stopwords.txt).
  */
object Thai {

  /** The reference's DBBI_AVAILABLE probe: a working dictionary-based
    * break iterator splits "ภาษาไทย" at offset 4. */
  lazy val available: Boolean = {
    val bi = BreakIterator.getWordInstance(new Locale("th"))
    bi.setText("ภาษาไทย")
    bi.isBoundary(4)
  }

  /** Raw segmentation: every boundary pair whose first code point is a
    * letter or digit (ThaiTokenizer.incrementWord). */
  def tokenize(text: String): Vector[String] = {
    // fail like the reference (ThaiTokenizer.java:60-62 throws
    // UnsupportedOperationException) rather than silently mis-segmenting
    // with the default word iterator on a JRE without Thai dictionary
    // break support
    if (!available) throw new UnsupportedOperationException(
      "This JRE does not have support for Thai segmentation")
    val out = Vector.newBuilder[String]
    val sent = BreakIterator.getSentenceInstance(Locale.ROOT)
    sent.setText(text)
    val word = BreakIterator.getWordInstance(new Locale("th"))
    var s0 = sent.first()
    var s1 = sent.next()
    while (s1 != BreakIterator.DONE) {
      val sentence = text.substring(s0, s1)
      word.setText(sentence)
      var a = word.first()
      var b = word.next()
      while (b != BreakIterator.DONE) {
        if (Character.isLetterOrDigit(sentence.codePointAt(a)))
          out += sentence.substring(a, b)
        a = b
        b = word.next()
      }
      s0 = s1
      s1 = sent.next()
    }
    out.result()
  }

  /** Full ThaiAnalyzer chain as flat (terms, positions): lowercase then
    * stop-filter with position gaps (StopFilter's posInc contract). */
  def analyzeFlat(text: String,
                  stopSet: Set[String]): (Array[String], Array[Int]) =
    Analyzer.stopGapFlat(tokenize(text), stopSet, key = Analyzer.lowerCase)
}
