package graft.analysis

import java.util.regex.Pattern

/** WikipediaTokenizer — markup-aware tokenization of MediaWiki text.
  *
  * Reference semantics, executed directly from the published JFlex spec
  * with JFlex's maximal-munch rule (longest match, ties by rule order):
  * lucene/analysis/common/src/java/org/apache/lucene/analysis/wikipedia/
  * WikipediaTokenizerImpl.jflex:60-200 (states, char classes, actions)
  * and WikipediaTokenizer.java:135-263 (the three output modes and the
  * untokenized-type collapse: consecutive same-type wiki tokens with a
  * strictly-increasing in-construct counter merge into one token whose
  * text rebuilds the inter-token gaps as spaces, trimmed).
  *
  * State is four scanner variables, exactly the reference's:
  * currentTokType (the type wiki-construct words inherit), numBalanced
  * (tracks a dangling '' opener), positionInc (0/1, SET by rules and
  * inherited by rules that don't set it — e.g. the first word after an
  * external-link URL emits at the URL's position), numLinkToks, and the
  * per-construct numWikiTokensSeen that drives collapsing.
  */
object Wikipedia {

  /** Output modes (WikipediaTokenizer.java:96-104). */
  final val TokensOnly = 0
  final val UntokenizedOnly = 1
  final val Both = 2

  /** Wiki token types (WikipediaTokenizer.java:61-80). */
  final val InternalLink = "il"
  final val ExternalLink = "el"
  final val ExternalLinkUrl = "elu"
  final val Citation = "ci"
  final val Category = "c"
  final val Bold = "b"
  final val Italics = "i"
  final val BoldItalics = "bi"
  final val Heading = "h"
  final val SubHeading = "sh"

  /** One output token. `untokenized` marks a collapsed span
    * (UNTOKENIZED_TOKEN_FLAG). `wikiSeen` is the scanner's in-construct
    * counter (exposed for the collapse logic and tests). */
  final case class WTok(term: String, start: Int, end: Int, tpe: String,
                        posInc: Int, wikiSeen: Int,
                        untokenized: Boolean = false)

  // --- char classes (WikipediaTokenizerImpl.jflex:72-78, verbatim) ---
  private final val Letter = "\\u0041-\\u005a\\u0061-\\u007a" +
    "\\u00c0-\\u00d6\\u00d8-\\u00f6\\u00f8-\\u00ff\\u0100-\\u1fff" +
    "\\uffa0-\\uffdc"
  private final val Digit = "\\u0030-\\u0039\\u0660-\\u0669" +
    "\\u06f0-\\u06f9\\u0966-\\u096f\\u09e6-\\u09ef\\u0a66-\\u0a6f" +
    "\\u0ae6-\\u0aef\\u0b66-\\u0b6f\\u0be7-\\u0bef\\u0c66-\\u0c6f" +
    "\\u0ce6-\\u0cef\\u0d66-\\u0d6f\\u0e50-\\u0e59\\u0ed0-\\u0ed9" +
    "\\u1040-\\u1049"
  private final val Korean = "\\uac00-\\ud7af\\u1100-\\u11ff"
  private final val CjCls = "\\u3040-\\u318f\\u3100-\\u312f" +
    "\\u30A0-\\u30FF\\u31F0-\\u31FF\\u3300-\\u337f\\u3400-\\u4dbf" +
    "\\u4e00-\\u9fff\\uf900-\\ufaff\\uff65-\\uff9f"

  private final val An = s"[$Letter$Digit$Korean]+"
  private final val Alpha = s"[$Letter]+"
  private final val P = "[_\\-/.,]"
  private final val Hd = s"[$Letter$Digit]*[$Digit][$Letter$Digit]*"
  private final val Ws = "\\r\\n|[ \\r\\n\\t\\f]"
  // ("http://"|"https://") HOST ("/"? (AN|P|?|&|=|#)*)* — '/' is in P,
  // so the nested closure flattens to one star (same longest match,
  // no catastrophic backtracking)
  private final val Url =
    s"https?://$An(?:\\.$An)+(?:$An|[_\\-/.,?&=#])*"
  private final val Tags = s"</?$An(?:(?:$Ws)*$An=\"$An\")*>"

  // Action ids
  private final val TOK = 0          // return token of fixed type (sets posInc=1)
  private final val TOK_CUR = 1      // return token of currentTokType (posInc untouched)
  private final val SKIP = 2         // skip, no state/posInc change
  private final val SKIP_INC1 = 3    // skip, positionInc = 1
  private final val OPEN_LINK = 4    // [[ -> INTERNAL_LINK_STATE
  private final val OPEN_CAT = 5     // [[:?Category: -> CATEGORY_STATE
  private final val OPEN_EXT = 6     // [  -> EXTERNAL_LINK_STATE
  private final val TWO_QUOTES = 7   // '' in YYINITIAL
  private final val OPEN_EQ = 8      // == -> DOUBLE_EQUALS_STATE
  private final val OPEN_BRACE = 9   // {{ or <ref> -> DOUBLE_BRACE_STATE
  private final val CLOSE_LINK = 10  // ]] -> YYINITIAL
  private final val EXT_URL = 11     // URL inside external link
  private final val EXT_WORD = 12    // word inside external link
  private final val CLOSE_EXT = 13   // ] -> YYINITIAL (posInc = 0)
  private final val Q_BOLD = 14      // ' in TWO_SQ -> bold
  private final val Q_BOLDITAL = 15  // ''' in TWO_SQ -> bold italics
  private final val Q_ITAL_WORD = 16 // word in TWO_SQ -> italics, STRING
  private final val Q_WORD = 17      // word in THREE/FIVE_SQ -> STRING
  private final val EQ_SUB = 18      // = in DOUBLE_EQUALS -> sub heading
  private final val EQ_WORD = 19     // word in DOUBLE_EQUALS -> heading
  private final val EQ_CLOSE = 20    // == in DOUBLE_EQUALS -> YYINITIAL
  private final val BRACE_WORD = 21  // word in DOUBLE_BRACE (citation)
  private final val BRACE_CLOSE = 22 // }} or </ref> -> YYINITIAL
  private final val STR_CLOSE = 23   // ''/'''/'''''/=== in STRING
  private final val STR_WORD = 24    // word in STRING
  private final val STR_PIPE = 25    // | in STRING (returns currentTokType)
  private final val OPEN_LINK_STR = 26 // [[ from STRING (resets numBalanced)
  private final val OPEN_CAT_STR = 27  // [[:?Category: from STRING
  private final val OPEN_EXT_STR = 28  // [ from STRING (el, not elu)
  private final val EXT_WS = 29      // whitespace in external link
  // quote states' bracket rules do NOT touch numBalanced (jflex
  // TWO/THREE/FIVE_SINGLE_QUOTES_STATE vs STRING)
  private final val OPEN_LINK_Q = 30
  private final val OPEN_CAT_Q = 31
  private final val OPEN_EXT_Q = 32

  private final case class Rule(pat: Pattern, act: Int, tpe: String = "")

  private def r(re: String, act: Int, tpe: String = "") =
    Rule(Pattern.compile(re), act, tpe)

  // scanner states
  private final val S_INITIAL = 0
  private final val S_CATEGORY = 1
  private final val S_LINK = 2
  private final val S_EXT = 3
  private final val S_TWO_SQ = 4
  private final val S_THREE_SQ = 5
  private final val S_FIVE_SQ = 6
  private final val S_EQ = 7
  private final val S_BRACE = 8
  private final val S_STRING = 9

  // The global [^]|{TAGS} skip rule is appended to every state's table
  // (JFlex inclusive-state semantics: the unprefixed bottom rule applies
  // everywhere, losing same-length ties to the state's own rules).
  private val tagSkip = r(Tags, SKIP)

  private val rules: Array[Array[Rule]] = {
    val num = Seq(
      s"$An$P$Hd", s"[$Digit]+$P[$Digit]+", s"$Hd$P$An",
      s"$An(?:$P$Hd$P$An)+", s"$Hd(?:$P$An$P$Hd)+",
      s"$An$P$Hd(?:$P$An$P$Hd)+", s"$Hd$P$An(?:$P$Hd$P$An)+")
    val initial = Array(
      r(An, TOK, "<ALPHANUM>"),
      r(s"$Alpha(?:'$Alpha)+", TOK, "<APOSTROPHE>"),
      r(s"[$Letter]\\.(?:[$Letter]\\.)+", TOK, "<ACRONYM>"),
      r(s"$Alpha[&@]$Alpha", TOK, "<COMPANY>"),
      r(s"$An(?:[._\\-]$An)*@$An(?:[.\\-]$An)+", TOK, "<EMAIL>")) ++
      num.map(n => r(n, TOK, "<NUM>")) ++ Array(
      r(s"$An(?:\\.$An)+", TOK, "<HOST>"),
      r(s"[$CjCls]", TOK, "<CJ>"),
      r("\\[\\[:?Category:", OPEN_CAT),
      r("\\[\\[", OPEN_LINK),
      r("\\[", OPEN_EXT),
      r("''", TWO_QUOTES),
      r("==", OPEN_EQ),
      r("\\{\\{", OPEN_BRACE),
      r("<ref>", OPEN_BRACE),
      tagSkip,
      r("[\\s\\S]", SKIP_INC1))
    val category = Array(
      r(An, TOK_CUR),
      r("\\]\\]", CLOSE_LINK),
      tagSkip,
      r("[\\s\\S]", SKIP_INC1))
    val link = Array(
      r(An, TOK_CUR),
      r("\\]\\]", CLOSE_LINK),
      tagSkip,
      r("[\\s\\S]", SKIP_INC1))
    val ext = Array(
      r(Url, EXT_URL),
      r(An, EXT_WORD),
      r("\\]", CLOSE_EXT),
      r(Ws, EXT_WS),
      tagSkip,
      r("[\\s\\S]", SKIP))
    val twoSq = Array(
      r("'''", Q_BOLDITAL),
      r("'", Q_BOLD),
      r(An, Q_ITAL_WORD),
      r("\\[\\[:?Category:", OPEN_CAT_Q),
      r("\\[\\[", OPEN_LINK_Q),
      r("\\[", OPEN_EXT_Q),
      tagSkip,
      r("[\\s\\S]", SKIP))
    val threeSq = Array(
      r(An, Q_WORD),
      r("\\[\\[:?Category:", OPEN_CAT_Q),
      r("\\[\\[", OPEN_LINK_Q),
      r("\\[", OPEN_EXT_Q),
      tagSkip,
      r("[\\s\\S]", SKIP))
    val eq = Array(
      r("==", EQ_CLOSE),
      r("=", EQ_SUB),
      r(An, EQ_WORD),
      tagSkip,
      r("[\\s\\S]", SKIP))
    val brace = Array(
      r(An, BRACE_WORD),
      r("\\}\\}", BRACE_CLOSE),
      r("</ref>", BRACE_CLOSE),
      tagSkip,
      r("[\\s\\S]", SKIP))
    val string = Array(
      r("'''''", STR_CLOSE),
      r("'''", STR_CLOSE),
      r("''", STR_CLOSE),
      r("===", STR_CLOSE),
      r(An, STR_WORD),
      r("\\[\\[:?Category:", OPEN_CAT_STR),
      r("\\[\\[", OPEN_LINK_STR),
      r("\\[", OPEN_EXT_STR),
      r("\\|", STR_PIPE),
      tagSkip,
      r("[\\s\\S]", SKIP))
    Array(initial, category, link, ext, twoSq, threeSq, threeSq, eq,
      brace, string)
  }

  /** Raw scan: the JFlex state machine, longest match with ties by rule
    * order, emitting tokens with the reference's posInc/wikiSeen. */
  private def scan(text: String): Vector[WTok] = {
    val out = Vector.newBuilder[WTok]
    var state = S_INITIAL
    var curType = "<ALPHANUM>"
    var numBalanced = 0
    var posInc = 1
    var numLinkToks = 0
    var wikiSeen = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val tbl = rules(state)
      var bestLen = 0
      var bestRule = -1
      var k = 0
      while (k < tbl.length) {
        val m = tbl(k).pat.matcher(text)
        m.region(i, n)
        if (m.lookingAt()) {
          val len = m.end - i
          if (len > bestLen) { bestLen = len; bestRule = k }
        }
        k += 1
      }
      if (bestRule < 0) { i += 1 } // unreachable: [\s\S] always matches
      else {
        val rule = tbl(bestRule)
        val term = text.substring(i, i + bestLen)
        rule.act match {
          case TOK =>
            posInc = 1
            out += WTok(term, i, i + bestLen, rule.tpe, 1, wikiSeen)
          case TOK_CUR =>
            wikiSeen += 1
            out += WTok(term, i, i + bestLen, curType, posInc, wikiSeen)
          case SKIP =>
          case SKIP_INC1 =>
            if (state == S_INITIAL) wikiSeen = 0
            posInc = 1
          case OPEN_CAT =>
            wikiSeen = 0; posInc = 1; curType = Category
            state = S_CATEGORY
          case OPEN_LINK =>
            wikiSeen = 0; posInc = 1; curType = InternalLink
            state = S_LINK
          case OPEN_EXT =>
            wikiSeen = 0; posInc = 1; curType = ExternalLinkUrl
            state = S_EXT
          case TWO_QUOTES =>
            wikiSeen = 0; posInc = 1
            if (numBalanced == 0) { numBalanced = 1; state = S_TWO_SQ }
            else numBalanced = 0
          case OPEN_EQ =>
            wikiSeen = 0; posInc = 1; state = S_EQ
          case OPEN_BRACE =>
            wikiSeen = 0; posInc = 1; curType = Citation
            state = S_BRACE
          case CLOSE_LINK =>
            numLinkToks = 0; state = S_INITIAL
          case EXT_URL =>
            posInc = 1; wikiSeen += 1
            out += WTok(term, i, i + bestLen, curType, 1, wikiSeen)
          case EXT_WORD =>
            posInc = if (numLinkToks == 0) 0 else 1
            wikiSeen += 1; curType = ExternalLink; numLinkToks += 1
            out += WTok(term, i, i + bestLen, curType, posInc, wikiSeen)
          case CLOSE_EXT =>
            numLinkToks = 0; posInc = 0; state = S_INITIAL
          case EXT_WS =>
            posInc = 1
          case Q_BOLD =>
            curType = Bold; state = S_THREE_SQ
          case Q_BOLDITAL =>
            curType = BoldItalics; state = S_FIVE_SQ
          case Q_ITAL_WORD =>
            curType = Italics; wikiSeen += 1; state = S_STRING
            out += WTok(term, i, i + bestLen, curType, posInc, wikiSeen)
          case Q_WORD =>
            wikiSeen += 1; state = S_STRING
            out += WTok(term, i, i + bestLen, curType, posInc, wikiSeen)
          case EQ_SUB =>
            curType = SubHeading; wikiSeen = 0; state = S_STRING
          case EQ_WORD =>
            curType = Heading; wikiSeen += 1
            out += WTok(term, i, i + bestLen, curType, posInc, wikiSeen)
          case EQ_CLOSE =>
            state = S_INITIAL
          case BRACE_WORD =>
            wikiSeen = 0
            out += WTok(term, i, i + bestLen, curType, posInc, wikiSeen)
          case BRACE_CLOSE =>
            state = S_INITIAL
          case STR_CLOSE =>
            numBalanced = 0; curType = "<ALPHANUM>"; state = S_INITIAL
          case STR_WORD =>
            wikiSeen += 1
            out += WTok(term, i, i + bestLen, curType, posInc, wikiSeen)
          case STR_PIPE =>
            out += WTok(term, i, i + bestLen, curType, posInc, wikiSeen)
          case OPEN_CAT_STR =>
            numBalanced = 0; wikiSeen = 0; curType = Category
            state = S_CATEGORY
          case OPEN_LINK_STR =>
            numBalanced = 0; wikiSeen = 0; curType = InternalLink
            state = S_LINK
          case OPEN_EXT_STR =>
            numBalanced = 0; wikiSeen = 0; curType = ExternalLink
            state = S_EXT
          case OPEN_CAT_Q =>
            wikiSeen = 0; curType = Category; state = S_CATEGORY
          case OPEN_LINK_Q =>
            wikiSeen = 0; curType = InternalLink; state = S_LINK
          case OPEN_EXT_Q =>
            wikiSeen = 0; curType = ExternalLink; state = S_EXT
        }
        i += bestLen
      }
    }
    out.result()
  }

  /** Tokenize `text`. TOKENS_ONLY emits the raw stream;
    * UNTOKENIZED_ONLY collapses runs of types in `untokenizedTypes`
    * into single span tokens; BOTH emits the collapsed span followed by
    * its members (first member at posInc 0) —
    * WikipediaTokenizer.java:135-263. */
  def tokenize(text: String, mode: Int = TokensOnly,
               untokenizedTypes: Set[String] = Set.empty): Vector[WTok] = {
    val raw = scan(text)
    val out = Vector.newBuilder[WTok]
    var i = 0
    if (mode == TokensOnly || untokenizedTypes.isEmpty) {
      while (i < raw.length) { out += raw(i); i += 1 }
    } else {
      while (i < raw.length) {
        val t = raw(i)
        if (!untokenizedTypes.contains(t.tpe)) { out += t; i += 1 }
        else {
          // collapse: same type while the in-construct counter strictly
          // exceeds the number of accepted lookaheads
          val buf = new java.lang.StringBuilder(t.term)
          var lastPos = t.start + t.term.length
          var numSeen = 0
          var j = i + 1
          var cont = true
          while (cont && j < raw.length) {
            val nx = raw(j)
            if (nx.tpe == t.tpe && nx.wikiSeen > numSeen) {
              var g = nx.start - lastPos
              while (g > 0) { buf.append(' '); g -= 1 }
              buf.append(nx.term)
              lastPos = nx.start + nx.term.length
              numSeen += 1; j += 1
            } else cont = false
          }
          val s = buf.toString.trim
          val nextInc = if (j < raw.length) raw(j).posInc else 1
          out += WTok(s, t.start, t.start + s.length, t.tpe,
            nextInc, t.wikiSeen, untokenized = true)
          if (mode == Both) {
            var k = i
            while (k < j) {
              val m = raw(k)
              out += (if (k == i) m.copy(posInc = 0) else m)
              k += 1
            }
          }
          i = j
        }
      }
    }
    val toks = out.result()
    // don't emit posInc=0 for the first token (WikipediaTokenizer:171)
    if (toks.nonEmpty && toks.head.posInc == 0)
      toks.head.copy(posInc = 1) +: toks.tail
    else toks
  }

  /** Flat (terms, positions) over the TOKENS_ONLY stream — the chain
    * entry point (positions accumulate posInc, Lucene convention). */
  def analyzeFlat(text: String): (Array[String], Array[Int]) = {
    val toks = tokenize(text)
    val terms = new Array[String](toks.length)
    val pos = new Array[Int](toks.length)
    var p = -1
    var i = 0
    while (i < toks.length) {
      p += toks(i).posInc
      terms(i) = toks(i).term
      pos(i) = p
      i += 1
    }
    (terms, pos)
  }
}
