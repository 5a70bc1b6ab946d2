package graft.analysis

/** Japanese word segmentation over kuromoji's own shipped surface
  * lexicon (reference analysis/kuromoji/.../ja/JapaneseTokenizer.java:72
  * is the behavioral target; the lexicon is the module's
  * TokenInfoDictionary FST — 325,871 surface forms — decoded by
  * [[LuceneFst]] from `TokenInfoDictionary$fst.dat`, shipped verbatim as
  * a resource).
  *
  * DOCUMENTED DEVIATION: the per-word Viterbi cost table
  * (`TokenInfoDictionary$buffer.dat`) is absent from this checkout
  * (SURVEY.md "known environmental limit"), so lattice paths are scored
  * by a SURROGATE additive cost — TokenCost per token, UnknownExtra for
  * unknown tokens, PLUS the reference's published SEARCH-mode long-token
  * penalties (JapaneseTokenizer.java:123-129 constants, computePenalty
  * :308-326: an all-kanji token of length L > 2 pays (L-2)*3000, any
  * other token of length L > 7 pays (L-7)*1700) — instead of cost-exact
  * Viterbi. The penalties reproduce the reference's search-mode
  * compound-splitting (4+ kanji compounds split into their 2-kanji
  * parts when the lexicon has them), and outputCompounds is implemented:
  * the split-away compound ALSO emits with posInc 0 after its first
  * part, exactly the published search-segmentation-tests.txt shape
  * (`関西 関西国際空港/0 国際 空港`); what still differs is enumerated
  * in JapaneseSpec's divergence-census test: (a) cost ties the real
  * word costs would break (では kept as one word), (b) 3-kanji
  * compounds always kept (penalty 3000 < the surrogate token cost,
  * while real word costs sometimes favor the split), (c) connection
  * costs ignored everywhere. Unambiguous dictionary segmentations match
  * the reference (JapaneseSpec pins the TestJapaneseTokenizer vectors
  * that hold).
  *
  * Unknown words mirror CharacterDefinition grouping
  * (kuromoji/.../dict/CharacterDefinition.java + UnknownDictionary):
  * KATAKANA / ALPHA / NUMERIC are isGroup classes (a run becomes one
  * token); unknown KANJI and HIRAGANA emit per character.
  *
  * Analyzer chain (reference ja/JapaneseAnalyzer.java:60-80, minus the
  * base-form and part-of-speech stages that require the cost table's
  * per-word metadata): tokenizer (punctuation discarded, the tokenizer's
  * default) -> CJKWidthFilter -> StopFilter (the module's stopwords.txt,
  * position gaps) -> JapaneseKatakanaStemFilter (drop a trailing U+30FC
  * from an all-katakana token of length >= 4,
  * JapaneseKatakanaStemFilter.java:35-75) -> LowerCaseFilter.
  */
object Japanese {

  /** Surface lexicon + max word length, decoded from the module FST. */
  lazy val (lexicon: java.util.HashSet[String], maxWordLen: Int) = {
    val fst = LuceneFst.load(
      getClass.getResourceAsStream("/graft/kuromoji/tokeninfo_fst.dat"))
    val set = new java.util.HashSet[String](524288)
    var maxLen = 1
    fst.foreachEntry { (s, _) =>
      set.add(s)
      if (s.length > maxLen) maxLen = s.length
    }
    (set, maxLen)
  }

  /** The module's stopword set (kuromoji/stopwords.txt, `#` comments). */
  lazy val stopSet: Set[String] = {
    val in = getClass.getResourceAsStream("/graft/kuromoji/stopwords.txt")
    require(in != null, "missing kuromoji stopwords")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSet
    finally in.close()
  }

  private def isKatakanaChar(c: Char): Boolean =
    Character.UnicodeBlock.of(c) == Character.UnicodeBlock.KATAKANA
  private def isHiraganaChar(c: Char): Boolean =
    Character.UnicodeBlock.of(c) == Character.UnicodeBlock.HIRAGANA
  private def isKanjiChar(c: Char): Boolean =
    Character.UnicodeScript.of(c) == Character.UnicodeScript.HAN
  /** JapaneseTokenizer.isPunctuation (ja/JapaneseTokenizer.java:1042-1066):
    * separators/control/format + punctuation + symbol categories. The
    * katakana block's middle dot U+30FB is OTHER_PUNCTUATION and must
    * break runs (testDecomposition3's マシュー・ホプキンス); the prolonged
    * sound mark U+30FC is MODIFIER_LETTER and must not. */
  private def isPunct(c: Char): Boolean = Character.getType(c) match {
    case Character.SPACE_SEPARATOR | Character.LINE_SEPARATOR |
         Character.PARAGRAPH_SEPARATOR | Character.CONTROL |
         Character.FORMAT | Character.DASH_PUNCTUATION |
         Character.START_PUNCTUATION | Character.END_PUNCTUATION |
         Character.CONNECTOR_PUNCTUATION | Character.OTHER_PUNCTUATION |
         Character.MATH_SYMBOL | Character.CURRENCY_SYMBOL |
         Character.MODIFIER_SYMBOL | Character.OTHER_SYMBOL |
         Character.INITIAL_QUOTE_PUNCTUATION |
         Character.FINAL_QUOTE_PUNCTUATION => true
    case _ => false
  }

  private def isJa(c: Char): Boolean =
    (isKatakanaChar(c) || isHiraganaChar(c) || isKanjiChar(c)) && !isPunct(c)

  // ---- surrogate cost model (see class doc) ----
  // Search-mode penalty constants are the reference's PUBLISHED values
  // (ja/JapaneseTokenizer.java:123-129); TokenCost/UnknownExtra are this
  // engine's surrogates for the absent per-word costs, calibrated so a
  // 4-kanji compound (penalty 6000) loses to its 2+2 split while a
  // 3-kanji word (penalty 3000) is kept — the reference's typical
  // search-mode outcomes.
  final val SearchModeKanjiLength = 2
  final val SearchModeOtherLength = 7
  final val SearchModeKanjiPenalty = 3000
  final val SearchModeOtherPenalty = 1700
  final val TokenCost = 5000
  final val UnknownExtra = 4000
  /** Unknown extra for the UNPENALIZED alt path only (compound
    * detection): IPADIC's unknown-word costs are high, so a known
    * 2-part split must beat an unknown whole run there (5000+7000 >
    * 2x5000) while 3+ known parts still lose to it (< 15000) — the
    * search-segmentation-tests.txt compound-emission pattern. */
  final val AltUnknownExtra = 7000

  /** Search-mode long-token penalty (computePenalty,
    * JapaneseTokenizer.java:308-326). */
  def penalty(s: String, i: Int, l: Int): Int =
    if (l > SearchModeKanjiLength) {
      var allKanji = true
      var j = i
      while (allKanji && j < i + l) {
        if (!isKanjiChar(s(j))) allKanji = false
        j += 1
      }
      if (allKanji) (l - SearchModeKanjiLength) * SearchModeKanjiPenalty
      else if (l > SearchModeOtherLength)
        (l - SearchModeOtherLength) * SearchModeOtherPenalty
      else 0
    } else 0

  /** Minimum-cost segmentation of a Japanese-script run under the
    * surrogate additive cost (TokenCost per token + UnknownExtra for
    * unknowns + the search-mode penalty per candidate); ties prefer the
    * longest token at each position, then known over unknown. Unknown
    * candidates follow the grouping classes (katakana run = one token,
    * kanji/hiragana = one char). */
  def segmentJa(s: String): Vector[String] =
    segmentPath(s, usePenalty = true)

  private def segmentPath(s: String, usePenalty: Boolean,
                          unknownExtra: Int = UnknownExtra): Vector[String] = {
    val n = s.length
    if (n == 0) return Vector.empty
    // dp(i) = surrogate cost of best split of s[i..); len(i) = chosen
    // token length
    val dpCost = new Array[Long](n + 1)
    val len = new Array[Int](n + 1)
    var i = n - 1
    while (i >= 0) {
      // unknown candidate: grouped katakana run, else single char
      val unkLen =
        if (isKatakanaChar(s(i))) {
          var j = i + 1
          while (j < n && isKatakanaChar(s(j))) j += 1
          j - i
        } else 1
      var bestCost = TokenCost.toLong + unknownExtra +
        (if (usePenalty) penalty(s, i, unkLen) else 0) + dpCost(i + unkLen)
      var bestLen = unkLen
      var bestIsUnk = true
      val maxL = math.min(maxWordLen, n - i)
      var l = 1
      while (l <= maxL) {
        if (lexicon.contains(s.substring(i, i + l))) {
          val c = TokenCost.toLong +
            (if (usePenalty) penalty(s, i, l) else 0) + dpCost(i + l)
          if (c < bestCost ||
            (c == bestCost && (l > bestLen || (l == bestLen && bestIsUnk)))) {
            bestCost = c; bestLen = l; bestIsUnk = false
          }
        }
        l += 1
      }
      dpCost(i) = bestCost; len(i) = bestLen
      i -= 1
    }
    val out = Vector.newBuilder[String]
    var p = 0
    while (p < n) { out += s.substring(p, p + len(p)); p += len(p) }
    out.result()
  }

  /** SEARCH-mode compound output (outputCompounds,
    * JapaneseTokenizer.java:231 + the altToken backtrace :1031-1100, and
    * the published search-segmentation-tests.txt vectors): when the
    * UNPENALIZED best path picks a too-long token that the penalty made
    * the output path split, the compound is ALSO emitted, with posInc 0
    * right after its first part — `関西 関西国際空港/0 国際 空港`.
    * Returned as (term, posInc) pairs; the parts keep posInc 1. */
  def segmentJaAnnotated(s: String): Vector[(String, Int)] = {
    val parts = segmentPath(s, usePenalty = true)
    if (parts.length < 2) return parts.map((_, 1))
    val alt = segmentPath(s, usePenalty = false,
      unknownExtra = AltUnknownExtra)
    if (alt == parts) return parts.map((_, 1))
    // unpenalized token start -> length; output-path boundaries
    val altByStart: Map[Int, Int] = {
      var off = 0
      alt.map { t => val e = (off, t.length); off += t.length; e }.toMap
    }
    val bounds: Set[Int] = {
      var off = 0
      (parts.map { t => off += t.length; off }.toSet) + 0
    }
    val out = Vector.newBuilder[(String, Int)]
    var off = 0
    parts.foreach { t =>
      out += ((t, 1))
      // the alt token may be an UNKNOWN word (long katakana runs —
      // コニカミノルタホールディングス): the reference's altToken
      // machinery emits those compounds too, so no lexicon gate here
      altByStart.get(off) match {
        case Some(l) if l > t.length && penalty(s, off, l) > 0 &&
          bounds.contains(off + l) =>
          out += ((s.substring(off, off + l), 0))
        case _ =>
      }
      off += t.length
    }
    out.result()
  }

  /** A user dictionary (reference ja/dict/UserDictionary.java): entries
    * (surface, custom segmentation). User entries outrank every lattice
    * path in the reference (they carry a dominating low cost,
    * UserDictionary.java WORD_COST=-100000), so the longest user surface
    * matching at a position always wins and emits its segmentation. */
  type UserDict = Seq[(String, Seq[String])]

  /** Parse the reference's user-dict CSV lines
    * ("surface,seg1 seg2 ...,readings,pos"; `#` comments). */
  def parseUserDict(lines: Seq[String]): UserDict =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val cols = l.split(",")
        (cols(0), cols(1).split(" ").toSeq)
      }

  /** Tokenize mixed text: Japanese-script runs through the lexicon DP,
    * ASCII letter and digit runs one token each, other-script letters
    * per char, punctuation/whitespace discarded (the tokenizer's
    * discardPunctuation=true default — no position holes). User-dict
    * surfaces match first (longest wins) and emit their custom
    * segmentation — TestJapaneseTokenizer.testUserDict1-3 semantics. */
  def tokenize(text: String, userDict: UserDict = Nil): Vector[String] =
    walkText(text, userDict, run => segmentJa(run).map((_, 1))).map(_._1)

  /** Token stream WITH the SEARCH-mode compound-also tokens as
    * (term, posInc) pairs (compounds ride posInc 0 after their first
    * part) — the stream the index analyzer consumes; [[tokenize]] stays
    * the parts-only view. */
  def tokenizeAnnotated(text: String,
                        userDict: UserDict = Nil): Vector[(String, Int)] =
    walkText(text, userDict, segmentJaAnnotated)

  private def walkText(text: String, userDict: UserDict,
                       jaRun: String => Vector[(String, Int)])
      : Vector[(String, Int)] = {
    val byLenDesc =
      if (userDict.isEmpty) null
      else userDict.sortBy(-_._1.length)
    val out = Vector.newBuilder[(String, Int)]
    val n = text.length
    // a user surface starting at p? (run loops break there so the user
    // entry wins mid-run too, like a dominating-cost lattice edge)
    def userAt(p: Int): (String, Seq[String]) =
      if (byLenDesc == null) null
      else byLenDesc.find { case (s, _) => text.startsWith(s, p) }.orNull
    var i = 0
    while (i < n) {
      val c = text(i)
      val user = userAt(i)
      if (user != null) {
        out ++= user._2.map((_, 1))
        i += user._1.length
      } else if (isJa(c)) {
        val run = new StringBuilder
        run += c; i += 1
        while (i < n && isJa(text(i)) && userAt(i) == null) {
          run += text(i); i += 1
        }
        out ++= jaRun(run.result())
      } else if (c.isLetter && c < 128) {
        val run = new StringBuilder
        run += c; i += 1
        while (i < n && text(i).isLetter && text(i) < 128 &&
          userAt(i) == null) {
          run += text(i); i += 1
        }
        out += ((run.result(), 1))
      } else if (c.isDigit) {
        val run = new StringBuilder
        run += c; i += 1
        while (i < n && text(i).isDigit && userAt(i) == null) {
          run += text(i); i += 1
        }
        out += ((run.result(), 1))
      } else if (Character.isLetter(c)) {
        out += ((String.valueOf(c), 1)); i += 1
      } else i += 1 // punctuation / whitespace: discarded, no position
    }
    out.result()
  }

  // --- JapaneseIterationMarkCharFilter (kuromoji/.../ja/
  // JapaneseIterationMarkCharFilter.java:46-462) -------------------------
  // Hiragana dakuten map, indexed by (char - 0x304b); entries that map to
  // themselves are already-voiced forms (the ゝ unvoiced mark then emits
  // char-1). Verbatim table from the reference's static block (:86-136).
  private val H2D: Array[Char] = {
    val m = new Array[Char](50)
    for (i <- m.indices) m(i) = (0x304b + i).toChar // default: self
    val voiced = Seq(
      0 -> 'が', 1 -> 'が', 2 -> 'ぎ', 3 -> 'ぎ', 4 -> 'ぐ', 5 -> 'ぐ',
      6 -> 'げ', 7 -> 'げ', 8 -> 'ご', 9 -> 'ご', 10 -> 'ざ', 11 -> 'ざ',
      12 -> 'じ', 13 -> 'じ', 14 -> 'ず', 15 -> 'ず', 16 -> 'ぜ',
      17 -> 'ぜ', 18 -> 'ぞ', 19 -> 'ぞ', 20 -> 'だ', 21 -> 'だ',
      22 -> 'ぢ', 23 -> 'ぢ', 25 -> 'づ', 26 -> 'づ', 27 -> 'で',
      28 -> 'で', 29 -> 'ど', 30 -> 'ど', 36 -> 'ば', 37 -> 'ば',
      39 -> 'び', 40 -> 'び', 42 -> 'ぶ', 43 -> 'ぶ', 45 -> 'べ',
      46 -> 'べ', 48 -> 'ぼ', 49 -> 'ぼ')
    voiced.foreach { case (i, c) => m(i) = c }
    m
  }
  // Katakana map = hiragana map shifted by カ-か (:139-143)
  private val K2D: Array[Char] = H2D.map(c => (c + ('カ' - 'か')).toChar)

  private def dakutenLookup(c: Char, map: Array[Char], off: Char): Char =
    if (c >= off && c < off + map.length) map(c - off) else c
  private def isDakuten(c: Char, map: Array[Char], off: Char): Boolean =
    c >= off && c < off + map.length && dakutenLookup(c, map, off) == c

  /** Normalize horizontal iteration marks (odoriji) to their expanded
    * form — string port of the reference's rolling-buffer char filter
    * (JapaneseIterationMarkCharFilter.java): spans of marks repeat the
    * same-length source run before them; a mark at the previous span's
    * end (or at stream start / after 。 or a surrogate) is illegal and
    * emitted as-is; ゝ/ヽ devoice an already-voiced source, ゞ/ヾ voice
    * via the dakuten maps; kanji 々 copies the source char. The filter
    * is length-preserving (correct() is identity, :458-461). */
  def iterationMarkNormalize(s: String, normalizeKanji: Boolean = true,
                             normalizeKana: Boolean = true): String = {
    def isKanaMark(c: Char): Boolean = normalizeKana &&
      (c == 'ゝ' || c == 'ゞ' || c == 'ヽ' || c == 'ヾ')
    def isMark(c: Char): Boolean =
      (normalizeKanji && c == '々') || isKanaMark(c)
    def normalize(src: Char, m: Char): Char = m match {
      case 'ゝ' => if (isDakuten(src, H2D, 'か')) (src - 1).toChar else src
      case 'ゞ' => dakutenLookup(src, H2D, 'か')
      case 'ヽ' => if (isDakuten(src, K2D, 'カ')) (src - 1).toChar else src
      case 'ヾ' => dakutenLookup(src, K2D, 'カ')
      case _ => src // kanji 々: plain repeat
    }
    val n = s.length
    if (n == 0) return s
    val out = new Array[Char](n)
    var spanEnd = 0 // iterationMarkSpanEndPosition
    var spanSize = 0 // iterationMarksSpanSize
    var i = 0
    while (i < n) {
      var c = s(i)
      if (Character.isHighSurrogate(c) || Character.isLowSurrogate(c) ||
        c == '。') spanEnd = i + 1
      if (isMark(c)) {
        if (i < spanEnd) { // inside the current span
          c = normalize(s(i - spanSize), c)
        } else if (i == spanEnd) { // back-to-back span start: illegal
          spanEnd += 1
        } else { // new span
          var sz = 0
          while (i + sz < n && isMark(s(i + sz))) sz += 1
          if (i - sz < spanEnd) sz = i - spanEnd
          spanSize = sz
          spanEnd = i + sz
          c = normalize(s(i - spanSize), c)
        }
      }
      out(i) = c
      i += 1
    }
    new String(out)
  }

  /** JapaneseKatakanaStemFilter.stem (:50-70): all-katakana token of
    * length >= 4 drops a trailing prolonged sound mark U+30FC. */
  def katakanaStem(term: String, minimumLength: Int = 4): String =
    if (term.length >= minimumLength && term.forall(isKatakanaChar) &&
      term.last == 'ー') term.dropRight(1)
    else term

  /** Full chain as flat (terms, positions): width fold -> stop (gaps) ->
    * katakana stem -> lowercase. Consumes the ANNOTATED stream, so
    * SEARCH-mode compound tokens index at their first part's position
    * (posInc 0) exactly like the reference analyzer's
    * `関西 関西国際空港/0 国際 空港`. */
  def analyzeFlat(text: String,
                  stops: Set[String] = stopSet,
                  userDict: UserDict = Nil): (Array[String], Array[Int]) = {
    val ann = tokenizeAnnotated(text, userDict)
    val terms = new Array[String](ann.length)
    val positions = new Array[Int](ann.length)
    var n = 0
    var pos = -1
    ann.foreach { case (t, inc) =>
      pos += inc
      val k = MiscFilters.cjkWidth(t)
      if (!stops.contains(k)) {
        terms(n) = Analyzer.lowerCase(katakanaStem(k))
        positions(n) = pos
        n += 1
      }
    }
    if (n == ann.length) (terms, positions)
    else (java.util.Arrays.copyOf(terms, n),
      java.util.Arrays.copyOf(positions, n))
  }
}
