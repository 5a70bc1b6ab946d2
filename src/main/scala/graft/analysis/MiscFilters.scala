package graft.analysis

/** The reference's small single-purpose token filters.
  *
  * Reference semantics:
  *  - ElisionFilter (strip a qualifying article before the first
  *    apostrophe; fr/it/ca/ga analyzers run it BEFORE LowerCaseFilter):
  *    lucene/analysis/common/src/java/org/apache/lucene/analysis/util/ElisionFilter.java:33-75,
  *    article sets: fr/FrenchAnalyzer.java:61-63, it/ItalianAnalyzer.java:52-57
  *  - LengthFilter / CodepointCountFilter (FilteringTokenFilter — dropped
  *    tokens leave position gaps):
  *    miscellaneous/LengthFilter.java, miscellaneous/CodepointCountFilter.java
  *  - KeepWordFilter: miscellaneous/KeepWordFilter.java
  *  - TrimFilter (whitespace trim, offsets untouched): miscellaneous/TrimFilter.java
  *  - TruncateTokenFilter (keyword-aware): miscellaneous/TruncateTokenFilter.java
  *  - LimitTokenCountFilter: miscellaneous/LimitTokenCountFilter.java
  *  - ApostropheFilter (keep the part before the first ' or U+2019):
  *    tr/ApostropheFilter.java
  *  - RemoveDuplicatesTokenFilter (same term at the same position):
  *    miscellaneous/RemoveDuplicatesTokenFilter.java
  */
object MiscFilters {

  /** FrenchAnalyzer.DEFAULT_ARTICLES (matched case-insensitively). */
  val FrenchArticles: Set[String] = Set(
    "l", "m", "t", "qu", "n", "s", "j", "d", "c",
    "jusqu", "quoiqu", "lorsqu", "puisqu")

  /** ItalianAnalyzer.DEFAULT_ARTICLES. */
  val ItalianArticles: Set[String] = Set(
    "c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
    "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s", "v", "d")

  /** CatalanAnalyzer.DEFAULT_ARTICLES. */
  val CatalanArticles: Set[String] = Set("d", "l", "m", "n", "s", "t")

  /** IrishAnalyzer.DEFAULT_ARTICLES (its HYPHENATIONS stop set {h, n, t}
    * runs as a StopFilter BEFORE elision in the reference chain). */
  val IrishArticles: Set[String] = Set("d", "m", "b")

  /** IrishLowerCaseFilter (ga/IrishLowerCaseFilter.java:28-75): a word
    * starting n/t before an uppercase vowel (incl. fada accents) is an
    * inflected eclipsis/t-prothesis — keep it searchable by inserting a
    * hyphen ("nAthair" -> "n-athair") before lowercasing the rest. */
  def irishLowerCase(term: String): String = {
    def isUpperVowel(c: Char) = "AEIOUÁÉÍÓÚ".indexOf(c) >= 0
    val hyphenate = term.length > 1 &&
      (term.charAt(0) == 'n' || term.charAt(0) == 't') && isUpperVowel(term.charAt(1))
    val base = if (hyphenate) term.substring(0, 1) + "-" + term.substring(1) else term
    val from = if (hyphenate) 2 else 0
    val sb = new java.lang.StringBuilder(base.length)
    sb.append(base, 0, from)
    var i = from
    while (i < base.length) {
      val cp = base.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** ElisionFilter on one term: if the prefix before the FIRST apostrophe
    * (' or U+2019) is an article, strip prefix + apostrophe. */
  def elision(term: String, articles: Set[String]): String = {
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      if (c == '\'' || c == '’') {
        return if (articles.contains(term.substring(0, i).toLowerCase(
          java.util.Locale.ROOT))) term.substring(i + 1)
        else term
      }
      i += 1
    }
    term
  }

  private def filtering(toks: IndexedSeq[Token])(keep: Token => Boolean): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var gap = 0
    for (t <- toks) {
      if (keep(t)) { out += t.copy(posInc = t.posInc + gap); gap = 0 }
      else gap += t.posInc
    }
    out.result()
  }

  /** LengthFilter: keep tokens whose CHAR length is in [min, max]. */
  def lengthFilter(toks: IndexedSeq[Token], min: Int, max: Int): Vector[Token] = {
    require(min >= 0, "minimum length must be greater than or equal to zero")
    require(min <= max, "maximum length must not be less than minimum length")
    filtering(toks)(t => t.term.length >= min && t.term.length <= max)
  }

  /** CodepointCountFilter: same, counting codepoints. */
  def codepointCountFilter(toks: IndexedSeq[Token], min: Int, max: Int): Vector[Token] =
    filtering(toks) { t =>
      val n = t.term.codePointCount(0, t.term.length)
      n >= min && n <= max
    }

  /** KeepWordFilter (case-sensitivity decided by how `keep` was built —
    * pass lowercased set + lowercase upstream for ignoreCase). */
  def keepWords(toks: IndexedSeq[Token], keep: Set[String],
                ignoreCase: Boolean = false): Vector[Token] =
    filtering(toks) { t =>
      keep.contains(if (ignoreCase) t.term.toLowerCase(java.util.Locale.ROOT)
      else t.term)
    }

  /** TrimFilter: strip leading/trailing whitespace from the term text. */
  def trim(toks: IndexedSeq[Token]): Vector[Token] =
    toks.iterator.map { t =>
      var s = 0
      var e = t.term.length
      while (s < e && Character.isWhitespace(t.term.charAt(s))) s += 1
      while (e > s && Character.isWhitespace(t.term.charAt(e - 1))) e -= 1
      if (s == 0 && e == t.term.length) t else t.copy(term = t.term.substring(s, e))
    }.toVector

  /** TruncateTokenFilter: cap non-keyword tokens at `length` chars. */
  def truncate(toks: IndexedSeq[Token], length: Int,
               keywords: Set[String] = Set.empty): Vector[Token] = {
    require(length >= 1, "length parameter must be a positive number: " + length)
    toks.iterator.map { t =>
      if (t.term.length > length && !keywords.contains(t.term))
        t.copy(term = t.term.substring(0, length))
      else t
    }.toVector
  }

  /** LimitTokenCountFilter: pass through the first `max` tokens. */
  def limitTokenCount(toks: IndexedSeq[Token], max: Int): Vector[Token] = {
    require(max >= 1, "maxTokenCount must be greater than zero")
    toks.take(max).toVector
  }

  /** LimitTokenPositionFilter (miscellaneous/LimitTokenPositionFilter
    * .java:40-98): keep tokens whose POSITION (1-based, accumulated from
    * posIncs) is <= maxTokenPosition — stacked posInc=0 tokens at the
    * boundary position survive, the first increment past it stops the
    * stream. */
  def limitTokenPosition(toks: IndexedSeq[Token], maxTokenPosition: Int): Vector[Token] = {
    require(maxTokenPosition >= 1, "maxTokenPosition must be greater than zero")
    val out = Vector.newBuilder[Token]
    var pos = 0
    var i = 0
    var stop = false
    while (i < toks.length && !stop) {
      pos += toks(i).posInc
      if (pos <= maxTokenPosition) out += toks(i) else stop = true
      i += 1
    }
    out.result()
  }

  /** UpperCaseFilter (core/UpperCaseFilter.java:38-52): full codepoint
    * uppercase. The reference documents it as locale-hazardous (unlike
    * lowercase, uppercasing can change length — e.g. ß -> SS via
    * Character.toUpperCase staying 1:1 here exactly as
    * CharacterUtils.toUpperCase does: per-codepoint, not String-level). */
  def upperCase(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(Character.toUpperCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** PatternKeywordMarkerFilter (miscellaneous/PatternKeywordMarkerFilter
    * .java:33-53): keywordAtt set when the pattern matches the WHOLE term
    * (matcher.matches()), shielding it from the downstream stemmer. */
  def stemWithPatternKeyword(term: String, pattern: java.util.regex.Pattern,
                             stem: String => String): String =
    if (pattern.matcher(term).matches()) term else stem(term)

  /** ApostropheFilter: keep only the part before the first ' / U+2019. */
  def apostrophe(term: String): String = {
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      if (c == '\'' || c == '’') return term.substring(0, i)
      i += 1
    }
    term
  }

  /** ScandinavianFoldingFilter (miscellaneous/ScandinavianFoldingFilter
    * .java:28-137): åÅäæÄÆ->a/A, öÖøØ->o/O, and the double vowels
    * aa/ae/ao/oe/oo collapse to their first letter. */
  def scandinavianFold(term: String): String = {
    val b = term.toCharArray
    var len = b.length
    var i = 0
    def del(at: Int): Unit = {
      System.arraycopy(b, at + 1, b, at, len - at - 1); len -= 1
    }
    while (i < len) {
      val c = b(i)
      if (c == 'å' || c == 'ä' || c == 'æ') b(i) = 'a'
      else if (c == 'Å' || c == 'Ä' || c == 'Æ') b(i) = 'A'
      else if (c == 'ö' || c == 'ø') b(i) = 'o'
      else if (c == 'Ö' || c == 'Ø') b(i) = 'O'
      else if (len - 1 > i) {
        val n = b(i + 1)
        if ((c == 'a' || c == 'A') &&
          (n == 'a' || n == 'A' || n == 'e' || n == 'E' || n == 'o' || n == 'O'))
          del(i + 1)
        else if ((c == 'o' || c == 'O') &&
          (n == 'e' || n == 'E' || n == 'o' || n == 'O'))
          del(i + 1)
      }
      i += 1
    }
    new String(b, 0, len)
  }

  /** ScandinavianNormalizationFilter (miscellaneous/
    * ScandinavianNormalizationFilter.java:40-110): ä->æ, ö->ø, and the
    * digraphs aa->å, ae->æ, oe/oo->ø (case-aware) — interchangeable
    * spellings normalize without the folding filter's destructiveness. */
  def scandinavianNormalize(term: String): String = {
    val b = term.toCharArray
    var len = b.length
    var i = 0
    def del(at: Int): Unit = {
      System.arraycopy(b, at + 1, b, at, len - at - 1); len -= 1
    }
    while (i < len) {
      val c = b(i)
      if (c == 'ä') b(i) = 'æ'
      else if (c == 'Ä') b(i) = 'Æ'
      else if (c == 'ö') b(i) = 'ø'
      else if (c == 'Ö') b(i) = 'Ø'
      else if (len - 1 > i) {
        val n = b(i + 1)
        if (c == 'a' && (n == 'a' || n == 'o' || n == 'A' || n == 'O')) {
          del(i + 1); b(i) = 'å'
        } else if (c == 'A' && (n == 'a' || n == 'A' || n == 'o' || n == 'O')) {
          del(i + 1); b(i) = 'Å'
        } else if (c == 'a' && (n == 'e' || n == 'E')) {
          del(i + 1); b(i) = 'æ'
        } else if (c == 'A' && (n == 'e' || n == 'E')) {
          del(i + 1); b(i) = 'Æ'
        } else if (c == 'o' && (n == 'e' || n == 'E' || n == 'o' || n == 'O')) {
          del(i + 1); b(i) = 'ø'
        } else if (c == 'O' && (n == 'e' || n == 'E' || n == 'o' || n == 'O')) {
          del(i + 1); b(i) = 'Ø'
        }
      }
      i += 1
    }
    new String(b, 0, len)
  }

  /** KeywordRepeatFilter (miscellaneous/KeywordRepeatFilter.java:34-60):
    * each token twice — first flagged keyword (a keyword-aware stemmer
    * leaves it), then the stemmable copy at posInc 0. `stem` plays the
    * downstream keyword-aware stem filter; pair with
    * [[removeDuplicates]] to drop no-op stems, the reference's
    * recommended original+stem indexing chain. */
  def keywordRepeat(toks: IndexedSeq[Token], stem: String => String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    for (t <- toks) {
      out += t // keyword copy: stemmer skips it
      out += t.copy(term = stem(t.term), posInc = 0)
    }
    out.result()
  }

  /** CapitalizationFilter (miscellaneous/CapitalizationFilter.java:
  * 110-170): normalizes capitalization of the token text, treating runs
  * separated by chars <= ' ' or '.' as words. keep-set words stay as-is
  * (except a forced first letter), okPrefix words (e.g. "McK") stay,
  * words shorter than minWordLength stay, and exceeding maxWordCount
  * restores the whole original token. */
  def capitalize(term: String,
                 onlyFirstWord: Boolean = true,
                 keep: Set[String] = Set.empty,
                 forceFirstLetter: Boolean = true,
                 okPrefix: Seq[String] = Nil,
                 minWordLength: Int = 0,
                 maxWordCount: Int = Int.MaxValue,
                 maxTokenLength: Int = Int.MaxValue): String = {
    if (term.length >= maxTokenLength) return term
    val b = term.toCharArray
    var wordCount = 0
    def processWord(off: Int, len: Int): Unit = {
      if (len < 1) return
      val wc = wordCount
      wordCount += 1
      if (onlyFirstWord && wc > 0) {
        var i = 0
        while (i < len) { b(off + i) = Character.toLowerCase(b(off + i)); i += 1 }
        return
      }
      if (keep.contains(new String(b, off, len))) {
        if (wc == 0 && forceFirstLetter) b(off) = Character.toUpperCase(b(off))
        return
      }
      if (len < minWordLength) return
      if (okPrefix.exists(p => len >= p.length &&
        p.indices.forall(i => p.charAt(i) == b(off + i)))) return
      b(off) = Character.toUpperCase(b(off))
      var i = 1
      while (i < len) { b(off + i) = Character.toLowerCase(b(off + i)); i += 1 }
    }
    var lastWordStart = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c <= ' ' || c == '.') {
        val len = i - lastWordStart
        if (len > 0) { processWord(lastWordStart, len); lastWordStart = i + 1; i += 1 }
      }
      i += 1
    }
    if (lastWordStart < b.length) processWord(lastWordStart, b.length - lastWordStart)
    if (wordCount > maxWordCount) term else new String(b)
  }

  /** HyphenatedWordsFilter (miscellaneous/HyphenatedWordsFilter.java:
    * 58-105): a token ending in '-' merges with the following token(s);
    * the merged token keeps the first part's start offset and posInc and
    * the last part's end offset. A trailing dangler gets its '-' back. */
  def hyphenatedWords(toks: IndexedSeq[Token]): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    val pending = new java.lang.StringBuilder
    var first: Token = null
    var lastEnd = 0
    for (t <- toks) {
      lastEnd = t.endOffset
      if (t.term.nonEmpty && t.term.last == '-') {
        if (first == null) first = t
        pending.append(t.term, 0, t.term.length - 1)
      } else if (first == null) {
        out += t
      } else {
        pending.append(t.term)
        out += first.copy(term = pending.toString, endOffset = t.endOffset)
        pending.setLength(0); first = null
      }
    }
    if (first != null) { // stream ended on a hyphen: keep it
      pending.append('-')
      out += first.copy(term = pending.toString, endOffset = lastEnd)
    }
    out.result()
  }

  /** TurkishLowerCaseFilter (tr/TurkishLowerCaseFilter.java:35-95):
    * I -> ı (dotless) unless a combining-dot-above follows through
    * non-spacing marks (then I -> i and the dot is removed, mimicking
    * the composed form); everything else per-codepoint lowercase. */
  def turkishLowerCase(term: String): String = {
    val CombiningDotAbove = 0x0307
    val sb = new java.lang.StringBuilder(term.length)
    var iOrAfter = false
    var i = 0
    def isBeforeDot(from: Int): Boolean = {
      var j = from
      while (j < term.length) {
        val c = term.codePointAt(j)
        if (Character.getType(c) != Character.NON_SPACING_MARK) return false
        if (c == CombiningDotAbove) return true
        j += Character.charCount(c)
      }
      false
    }
    while (i < term.length) {
      val ch = term.codePointAt(i)
      iOrAfter = ch == 'I' ||
        (iOrAfter && Character.getType(ch) == Character.NON_SPACING_MARK)
      if (iOrAfter && ch == CombiningDotAbove) {
        // drop the dot (it composed with the preceding I -> i)
      } else if (ch == 'I') {
        if (isBeforeDot(i + 1)) sb.append('i')
        else { sb.append('ı'); iOrAfter = false }
      } else {
        sb.appendCodePoint(Character.toLowerCase(ch))
      }
      i += Character.charCount(ch)
    }
    sb.toString
  }

  /** GermanNormalizationFilter (de/GermanNormalizationFilter.java:28-110):
    * the UniNE "German2" folding as a 3-state FSM — umlauts fold to their
    * base vowel, 'e' after an a/o/solitary-u state is deleted (so
    * "flaechen" == "flächen" == "flachen"), ß -> ss. */
  def germanNormalize(term: String): String = {
    val N = 0; val V = 1; val U = 2
    var state = N
    val b = new java.lang.StringBuilder(term.length + 4)
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      c match {
        case 'a' | 'o' => b.append(c); state = U
        case 'u' => b.append(c); state = if (state == N) U else V
        case 'e' =>
          if (state != U) b.append(c) // in U-state the 'e' is deleted
          state = V
        case 'i' | 'q' | 'y' => b.append(c); state = V
        case 'ä' => b.append('a'); state = V
        case 'ö' => b.append('o'); state = V
        case 'ü' => b.append('u'); state = V
        case 'ß' => b.append("ss"); state = N
        case other => b.append(other); state = N
      }
      i += 1
    }
    b.toString
  }

  /** SerbianNormalizationFilter (sr/SerbianNormalizationFilter.java:28):
    * Cyrillic -> bald Latin, plus Latin diacritics folded (đ->dj, ž->z,
    * č/ć->c, š->s; љ/њ/џ expand to lj/nj/dz). */
  def serbianNormalize(term: String): String = {
    val b = new java.lang.StringBuilder(term.length + 4)
    term.foreach {
      case 'а' => b.append('a'); case 'б' => b.append('b')
      case 'в' => b.append('v'); case 'г' => b.append('g')
      case 'д' => b.append('d'); case 'ђ' | 'đ' => b.append("dj")
      case 'е' => b.append('e'); case 'ж' | 'з' | 'ž' => b.append('z')
      case 'и' => b.append('i'); case 'ј' => b.append('j')
      case 'к' => b.append('k'); case 'л' => b.append('l')
      case 'љ' => b.append("lj"); case 'м' => b.append('m')
      case 'н' => b.append('n'); case 'њ' => b.append("nj")
      case 'о' => b.append('o'); case 'п' => b.append('p')
      case 'р' => b.append('r'); case 'с' => b.append('s')
      case 'т' => b.append('t'); case 'ћ' | 'ц' | 'ч' | 'č' | 'ć' => b.append('c')
      case 'у' => b.append('u'); case 'ф' => b.append('f')
      case 'х' => b.append('h'); case 'џ' => b.append("dz")
      case 'ш' | 'š' => b.append('s')
      case other => b.append(other)
    }
    b.toString
  }

  /** PersianCharFilter (fa/PersianCharFilter.java:30): zero-width
    * non-joiner becomes a space before tokenization. */
  def persianCharFilter(text: String): String = text.replace('\u200C', ' ')

  /** CJKWidthFilter (cjk/CJKWidthFilter.java:28-115): fullwidth ASCII
    * variants fold to basic latin; halfwidth katakana folds to kana,
    * with the halfwidth voice marks (U+FF9E/FF9F) composing into the
    * preceding kana where a composed form exists (else they map to the
    * combining marks U+3099/309A). A practical subset of NFKC. */
  private val KanaNorm: Array[Char] = Array(
    0x30fb, 0x30f2, 0x30a1, 0x30a3, 0x30a5, 0x30a7, 0x30a9, 0x30e3, 0x30e5,
    0x30e7, 0x30c3, 0x30fc, 0x30a2, 0x30a4, 0x30a6, 0x30a8, 0x30aa, 0x30ab,
    0x30ad, 0x30af, 0x30b1, 0x30b3, 0x30b5, 0x30b7, 0x30b9, 0x30bb, 0x30bd,
    0x30bf, 0x30c1, 0x30c4, 0x30c6, 0x30c8, 0x30ca, 0x30cb, 0x30cc, 0x30cd,
    0x30ce, 0x30cf, 0x30d2, 0x30d5, 0x30d8, 0x30db, 0x30de, 0x30df, 0x30e0,
    0x30e1, 0x30e2, 0x30e4, 0x30e6, 0x30e8, 0x30e9, 0x30ea, 0x30eb, 0x30ec,
    0x30ed, 0x30ef, 0x30f3, 0x3099, 0x309A).map(_.toChar)

  private val KanaCombineVoiced: Array[Byte] = Array[Byte](
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 1,
    0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1)

  private val KanaCombineHalfVoiced: Array[Byte] = Array[Byte](
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 2, 0, 0, 2,
    0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  def cjkWidth(term: String): String = {
    val text = term.toCharArray
    var length = text.length
    var i = 0
    while (i < length) {
      val ch = text(i)
      if (ch >= 0xFF01 && ch <= 0xFF5E) {
        text(i) = (ch - 0xFEE0).toChar // fullwidth ASCII
      } else if (ch >= 0xFF65 && ch <= 0xFF9F) {
        val combined = (ch == 0xFF9E || ch == 0xFF9F) && i > 0 && {
          val prev = text(i - 1)
          prev >= 0x30A6 && prev <= 0x30FD && {
            val d = if (ch == 0xFF9F) KanaCombineHalfVoiced(prev - 0x30A6)
            else KanaCombineVoiced(prev - 0x30A6)
            text(i - 1) = (prev + d).toChar
            text(i - 1) != prev
          }
        }
        if (combined) {
          System.arraycopy(text, i + 1, text, i, length - i - 1)
          length -= 1
          i -= 1
        } else text(i) = KanaNorm(ch - 0xFF65)
      }
      i += 1
    }
    new String(text, 0, length)
  }

  /** RemoveDuplicatesTokenFilter: drop a token when the same term was
    * already emitted at the same position (posInc > 0 clears the set);
    * the dropped overlap contributes no gap (its posInc is 0). */
  def removeDuplicates(toks: IndexedSeq[Token]): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    val seen = scala.collection.mutable.HashSet.empty[String]
    for (t <- toks) {
      if (t.posInc > 0) seen.clear()
      if (seen.add(t.term)) out += t
    }
    out.result()
  }
}
