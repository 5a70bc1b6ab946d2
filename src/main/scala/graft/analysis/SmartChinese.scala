package graft.analysis

/** Chinese word segmentation over the reference's own SmartCN lexicon
  * (reference smartcn/.../hhmm/WordDictionary.java data =
  * coredict.mem, 85k words with corpus frequencies, shipped verbatim as a
  * resource; smartcn/.../HMMChineseTokenizer.java:38 is the behavioral
  * target). The reference repo ships only the unigram core dictionary
  * (bigramdict.mem is absent), so the Viterbi here scores paths with the
  * unigram language model — cost(w) = -ln((freq(w)+s)/total) — instead of
  * the HHMM's bigram-smoothed edge weights: a dictionary-DP segmenter on
  * the published data. Out-of-vocabulary runs fall back to single-char
  * tokens, exactly the HHMM behavior for unseen names
  * (TestSmartChineseAnalyzer.testOOV).
  *
  * Non-Chinese handling mirrors SegTokenFilter/Utility.getCharType:
  * full-width ASCII folds to half-width, Latin letter runs and digit runs
  * each form one token, other-script letters tokenize per character, and
  * everything else delimits. The analyzer chain is tokenizer ->
  * lowercase -> PorterStemFilter -> StopFilter (smartcn stopwords.txt),
  * the SmartChineseAnalyzer stack. */
object SmartChinese {

  /** word -> frequency, from coredict.mem (plain java-serialized primitive
    * arrays: hash slots -> table index; table rows are the word minus its
    * head char plus a frequency). */
  lazy val (dict: java.util.HashMap[String, Integer], totalFreq: Long,
      maxWordLen: Int) = {
    val in = new java.io.ObjectInputStream(
      getClass.getResourceAsStream("/graft/smartcn/coredict.mem"))
    try {
      val wordIndexTable = in.readObject().asInstanceOf[Array[Short]]
      val charIndexTable = in.readObject().asInstanceOf[Array[Char]]
      val charArrayTable = in.readObject().asInstanceOf[Array[Array[Array[Char]]]]
      val freqTable = in.readObject().asInstanceOf[Array[Array[Int]]]
      val m = new java.util.HashMap[String, Integer](131072)
      var total = 0L
      var maxLen = 1
      var k = 0
      while (k < charIndexTable.length) {
        val c = charIndexTable(k)
        if (c != 0) {
          val i = wordIndexTable(k)
          if (i >= 0 && i < charArrayTable.length && charArrayTable(i) != null) {
            var j = 0
            while (j < charArrayTable(i).length) {
              val rest = charArrayTable(i)(j)
              val w = if (rest == null) String.valueOf(c)
                      else c + new String(rest)
              val f = freqTable(i)(j)
              m.merge(w, Int.box(f), (a, b) => Int.box(a + b))
              total += f
              if (w.length > maxLen) maxLen = w.length
              j += 1
            }
          }
        }
        k += 1
      }
      (m, total, maxLen)
    } finally in.close()
  }

  /** SmartChineseAnalyzer's stop set (smartcn/stopwords.txt — mostly
    * punctuation and particles). */
  lazy val stopSet: Set[String] = {
    val in = getClass.getResourceAsStream("/graft/smartcn/stopwords.txt")
    require(in != null, "missing smartcn stopwords")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(l => { val i = l.indexOf("//"); if (i >= 0) l.substring(0, i) else l })
      .map(_.trim).filter(_.nonEmpty).toSet
    finally in.close()
  }

  private val lnTotal = math.log(totalFreq.toDouble)
  private val smoothing = 0.1

  private def wordCost(freq: Int): Double =
    lnTotal - math.log(freq + smoothing)

  /** Minimum-cost segmentation of a pure-Han run under the unigram model;
    * multi-char words must be in the lexicon, single chars always split
    * (OOV chars at freq 0). */
  def segmentHan(s: String): Vector[String] = {
    val n = s.length
    if (n == 0) return Vector.empty
    if (n == 1) return Vector(s)
    val best = Array.fill(n + 1)(Double.MaxValue)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxWordLen)
      while (j < i) {
        if (best(j) < Double.MaxValue) {
          val w = s.substring(j, i)
          val f = if (i - j == 1) {
            val x = dict.get(w); if (x == null) 0 else x.intValue()
          } else {
            val x = dict.get(w); if (x == null) -1 else x.intValue()
          }
          if (f >= 0) {
            val c = best(j) + wordCost(f)
            if (c < best(i)) { best(i) = c; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val stack = scala.collection.mutable.Stack[String]()
    var p = n
    while (p > 0) { stack.push(s.substring(back(p), p)); p = back(p) }
    stack.toVector
  }

  private def foldWidth(c: Char): Char =
    if (c >= 0xFF01 && c <= 0xFF5E) (c - 0xFEE0).toChar // full-width ASCII
    else if (c == 0x3000) ' '                           // ideographic space
    else c

  private def isHan(c: Char): Boolean =
    Character.UnicodeScript.of(c) == Character.UnicodeScript.HAN

  /** Tokenize mixed text: Han runs go through the lexicon DP; ASCII
    * letter runs and digit runs are single tokens; other-script letters
    * emit one token per char. */
  def tokenize(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val n = text.length
    var i = 0
    while (i < n) {
      val c = foldWidth(text(i))
      if (isHan(c)) {
        val run = new StringBuilder
        while (i < n && isHan(foldWidth(text(i)))) {
          run += foldWidth(text(i)); i += 1
        }
        out ++= segmentHan(run.result())
      } else if (c.isLetter && c < 128) {
        val run = new StringBuilder
        while (i < n && { val d = foldWidth(text(i))
          d.isLetter && d < 128 }) { run += foldWidth(text(i)); i += 1 }
        out += run.result()
      } else if (c.isDigit) {
        val run = new StringBuilder
        while (i < n && foldWidth(text(i)).isDigit) {
          run += foldWidth(text(i)); i += 1
        }
        out += run.result()
      } else if (Character.isLetter(c)) { // other scripts: per-char tokens
        out += String.valueOf(c)
        i += 1
      } else if (c.isWhitespace) i += 1
      else { // punctuation: SegTokenFilter folds every delimiter token to
        // Utility.COMMON_DELIMITER (","), which the stop set then removes
        // leaving a position gap (TestSmartChineseAnalyzer
        // .testChineseStopWords2 pins posInc=2 across a stopped ':')
        out += ","
        i += 1
      }
    }
    out.result()
  }

  /** Full SmartChineseAnalyzer chain as flat (terms, positions):
    * lowercase + Porter stem (ASCII-only effect) + stop set with
    * position gaps. */
  def analyzeFlat(text: String,
                  stops: Set[String] = stopSet): (Array[String], Array[Int]) =
    Analyzer.stopGapFlat(tokenize(text), stops, key = { t =>
      val lower = Analyzer.lowerCase(t)
      if (lower.nonEmpty && lower(0) < 128) PorterStemmer.stem(lower)
      else lower
    })
}
