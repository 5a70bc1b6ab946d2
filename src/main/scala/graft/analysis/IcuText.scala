package graft.analysis

import com.ibm.icu.text.{BreakIterator, Normalizer2, Transliterator}
import com.ibm.icu.util.ULocale

/** ICU normalization / transliteration / segmentation over ICU4J (on
  * Spark's own classpath — the same library the reference's analysis/icu
  * module wraps):
  *
  *  - [[normalize]] = ICUNormalizer2Filter (icu/ICUNormalizer2Filter.java:51
  *    quickCheck-then-normalize; default instance nfkc_cf, the reference
  *    default at ICUNormalizer2Filter.java:63);
  *  - [[transform]] = ICUTransformFilter (icu/ICUTransformFilter.java:60 —
  *    a compiled Transliterator applied per token; IDs like
  *    "Traditional-Simplified", "Any-Latin", "Han-Latin" or rule strings);
  *  - [[tokenize]] = ICUTokenizer's segmentation surface
  *    (icu/segmentation/ICUTokenizer.java:49): UAX#29 word breaks with
  *    ICU's dictionary-based breaks for Thai/Khmer/Lao/CJK.
  *
  * Environmental limit, recorded like kuromoji (SURVEY.md §2.14): the
  * reference's COMPILED data files — utr30.nrm (exact UTR#30 folding set)
  * and Default.brk/Khmer.brk (tailored break rules) — are format version 2,
  * which ICU4J 77 refuses ("Header authentication failed"; ICU needs >= 3
  * and no re-compiler exists offline). Folding therefore stays on the
  * rule-ported [[IcuFolding]], and tokenize uses ICU's own UAX#29 word
  * instance (the same rules Default.brk was compiled from, minus the
  * reference's Myanmar/Khmer syllable tailoring).
  */
object IcuText {

  private val nfkcCf = Normalizer2.getNFKCCasefoldInstance
  private val byMode = Map[String, Normalizer2](
    "nfkc_cf" -> nfkcCf,
    "nfc" -> Normalizer2.getNFCInstance,
    "nfkc" -> Normalizer2.getNFKCInstance,
    // DECOMPOSE mode of the nfc data (the reference test's custom filter)
    "nfd" -> Normalizer2.getInstance(null, "nfc", Normalizer2.Mode.DECOMPOSE),
    "nfkd" -> Normalizer2.getInstance(null, "nfkc", Normalizer2.Mode.DECOMPOSE))

  /** ICUNormalizer2Filter.incrementToken: skip already-normal tokens via
    * quickCheck, else normalize. Normalizer2 instances are immutable. */
  def normalize(s: String, mode: String = "nfkc_cf"): String = {
    val n = byMode.getOrElse(mode,
      throw new IllegalArgumentException(s"unknown normalizer mode $mode"))
    if (n.quickCheck(s) == com.ibm.icu.text.Normalizer.YES) s else n.normalize(s)
  }

  // Transliterators are NOT thread-safe: cache per (thread, id)
  private val translits = new ThreadLocal[scala.collection.mutable.Map[String, Transliterator]] {
    override def initialValue() = scala.collection.mutable.Map.empty
  }

  /** ICUTransformFilter: apply the compiled transliterator to one token.
    * `id` is an ICU system transform ID, or `rules` when given compiles a
    * custom one (Transliterator.createFromRules). */
  def transform(id: String, s: String, rules: Option[String] = None): String = {
    val t = translits.get.getOrElseUpdate(id, rules match {
      case Some(r) => Transliterator.createFromRules(id, r, Transliterator.FORWARD)
      case None => Transliterator.getInstance(id)
    })
    t.transliterate(s)
  }

  private val wordBreak = new ThreadLocal[BreakIterator] {
    override def initialValue() = BreakIterator.getWordInstance(ULocale.ROOT)
  }

  /** ICUTokenizer's segmentation: UAX#29 word boundaries (dictionary
    * breaks for Thai/Lao/Khmer/CJK come from ICU itself); emits the
    * segments containing a letter or digit, with their token position. */
  def tokenize(s: String): Vector[(String, Int)] = {
    val bi = wordBreak.get
    bi.setText(s)
    val out = Vector.newBuilder[(String, Int)]
    var pos = 0
    var b = bi.first()
    var e = bi.next()
    while (e != BreakIterator.DONE) {
      val seg = s.substring(b, e)
      if (seg.exists(c => Character.isLetterOrDigit(c))) {
        out += ((seg, pos)); pos += 1
      }
      b = e; e = bi.next()
    }
    out.result()
  }
}
