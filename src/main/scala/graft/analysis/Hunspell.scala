package graft.analysis

/** Hunspell dictionary stemming (reference hunspell/Dictionary.java,
  * hunspell/Stemmer.java:1, hunspell/HunspellStemFilter.java:48) — the
  * generic morphology path Solr deployments use where no bespoke stemmer
  * exists. Covers the non-compound core of the format: PFX/SFX rules with
  * strip/append/condition, continuation classes on the appended affix
  * (two-stage suffix chains), optional conditions, zero affixes, escaped
  * slashes, FLAG long/num modes, homonyms, and upper/title case variants.
  * Compound flags, COMPLEXPREFIXES, CIRCUMFIX, KEEPCASE, ICONV/OCONV and
  * morphological aliases are out of scope (the reference's own stemmer
  * ignores compounding too).
  *
  * Stemming follows the reference's recursion contract exactly
  * (Stemmer.java stem/applyAffix):
  *  - depth 0 tries prefixes and suffixes of the whole word;
  *  - after a suffix, another suffix may strip only if the INNER suffix's
  *    continuation classes contain the outer suffix's flag;
  *  - after a prefix, a suffix may strip if it has no continuation
  *    classes (plain cross-product) or they contain the prefix flag;
  *  - the dictionary form must carry the affix flag, and when a prefix
  *    was stripped also the prefix flag (directly or via the suffix's
  *    continuation classes).
  */
object Hunspell {

  /** One PFX/SFX rule line. `cond` is the raw condition string (a char
    * sequence of literals and [..]/[^..] classes, already known not to
    * need checking when null). */
  final case class Affix(id: Int, flag: Int, strip: String, append: String,
                         cont: Set[Int], cond: String,
                         crossProduct: Boolean, isPrefix: Boolean)

  final class Dict(val words: Map[String, List[Set[Int]]],
                   val prefixes: Vector[Affix], val suffixes: Vector[Affix],
                   val twoStageAffix: Boolean, val ignoreCase: Boolean) {

    /** All stems of `word` (with duplicates, like Stemmer.stem). */
    def stem(word: String): List[String] = {
      if (ignoreCase || word.isEmpty || !Character.isUpperCase(word(0)))
        return doStem(word, caseVariant = false)
      var seenUpper = false
      var seenLower = false
      var i = 1
      while (i < word.length) {
        val v = Character.isUpperCase(word(i))
        seenUpper |= v; seenLower |= !v
        i += 1
      }
      val lowerAll = word.toLowerCase(java.util.Locale.ROOT)
      if (!seenLower) { // UPPER: exact, Title, lower
        val title = word(0) + lowerAll.substring(1)
        doStem(word, caseVariant = false) ++ doStem(title, caseVariant = true) ++
          doStem(lowerAll, caseVariant = true)
      } else if (!seenUpper) { // Title: exact, lower
        doStem(word, caseVariant = false) ++ doStem(lowerAll, caseVariant = true)
      } else doStem(word, caseVariant = false)
    }

    /** Stems with duplicates removed, first occurrence wins
      * (Stemmer.uniqueStems). */
    def uniqueStems(word: String): List[String] = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      stem(word).foreach(seen += _)
      seen.toList
    }

    private def lookup(w: String): List[Set[Int]] =
      words.getOrElse(if (ignoreCase) w.toLowerCase(java.util.Locale.ROOT) else w, Nil)

    private def doStem(word: String, caseVariant: Boolean): List[String] =
      lookup(word).map(_ => word) :::
        rec(word, previous = -1, prevFlag = -1, prefixFlag = -1, depth = 0,
          doPrefix = true, doSuffix = true, prevWasPrefix = false)

    /** Does `cond` match the end (suffix rules) / start (prefix rules) of
      * the reconstructed pre-affix form? Conditions are hunspell's tiny
      * regex subset: literals, '.', [set], [^set]. */
    private def condMatches(a: Affix, stemPart: String): Boolean = {
      if (a.cond == null) return true
      val toks = Vector.newBuilder[Char => Boolean]
      var i = 0
      val c = a.cond
      while (i < c.length) {
        c(i) match {
          case '[' =>
            val neg = i + 1 < c.length && c(i + 1) == '^'
            val from = if (neg) i + 2 else i + 1
            val to = { val j = c.indexOf(']', from); if (j < 0) c.length else j }
            val set = c.substring(from, to).toSet
            toks += (ch => set(ch) != neg)
            i = to + 1
          case '.' => toks += (_ => true); i += 1
          case lit => toks += (ch => ch == lit); i += 1
        }
      }
      val ts = toks.result()
      if (stemPart.length < ts.length) return false
      val off = if (a.isPrefix) 0 else stemPart.length - ts.length
      ts.indices.forall(k => ts(k)(stemPart(off + k)))
    }

    private def rec(word: String, previous: Int, prevFlag: Int,
                    prefixFlag: Int, depth: Int, doPrefix: Boolean,
                    doSuffix: Boolean, prevWasPrefix: Boolean): List[String] = {
      val out = List.newBuilder[String]
      def compatible(a: Affix): Boolean =
        if (depth == 0) true
        else a.crossProduct && (a.cont.contains(prevFlag) ||
          (a.cont.isEmpty && !a.isPrefix && prevWasPrefix))
      if (doPrefix) prefixes.foreach { a =>
        if (a.id != previous && word.length - a.append.length >= 1 &&
            word.startsWith(a.append) && compatible(a)) {
          val stripped = a.strip + word.substring(a.append.length)
          if (condMatches(a, stripped))
            out ++= applyAffix(stripped, a, prefixFlag = -1, depth,
              caseVariantBlocked = false)
        }
      }
      if (doSuffix) suffixes.foreach { a =>
        if (a.id != previous && word.length - a.append.length >= 1 &&
            word.endsWith(a.append) && compatible(a)) {
          val stripped =
            word.substring(0, word.length - a.append.length) + a.strip
          if (condMatches(a, stripped))
            out ++= applyAffix(stripped, a, prefixFlag, depth,
              caseVariantBlocked = false)
        }
      }
      out.result()
    }

    private def applyAffix(stripped: String, a: Affix, prefixFlag: Int,
                           depth: Int, caseVariantBlocked: Boolean): List[String] = {
      val direct = lookup(stripped).collect {
        case flags if flags.contains(a.flag) &&
          (prefixFlag < 0 || flags.contains(prefixFlag) ||
            a.cont.contains(prefixFlag)) => stripped
      }
      val chained: List[String] =
        if (!a.crossProduct) Nil
        else if (depth == 0 && a.isPrefix)
          // removed a prefix: go look for a suffix
          rec(stripped, a.id, a.flag, prefixFlag = a.flag, depth = 1,
            doPrefix = false, doSuffix = true, prevWasPrefix = true)
        else if (depth <= 1 && !a.isPrefix && twoStageAffix)
          // removed a suffix: another suffix may chain through its
          // continuation classes
          rec(stripped, a.id, a.flag, prefixFlag, depth + 1,
            doPrefix = false, doSuffix = true, prevWasPrefix = false)
        else Nil
      direct ::: chained
    }
  }

  /** HunspellStemFilter contract (dedup=true): every unique stem of the
    * token at its position; a token with no stems passes through. */
  def filterToken(dict: Dict, term: String): List[String] = {
    val stems = dict.uniqueStems(term)
    if (stems.isEmpty) List(term) else stems
  }

  // ---------------- .aff / .dic parsing ----------------

  private val FlagChar = 0
  private val FlagLong = 1
  private val FlagNum = 2

  private def parseFlags(s: String, mode: Int): Set[Int] = mode match {
    case FlagChar => s.map(_.toInt).toSet
    case FlagLong => s.grouped(2).map { p =>
      (p(0).toInt << 16) | (if (p.length > 1) p(1).toInt else 0)
    }.toSet
    case FlagNum => s.split(',').iterator.map(_.trim).filter(_.nonEmpty)
      .map(_.toInt).toSet
  }

  /** Parse the .aff content (as text). */
  def parseAff(aff: String): (Vector[Affix], Vector[Affix], Int, Boolean) = {
    val prefixes = Vector.newBuilder[Affix]
    val suffixes = Vector.newBuilder[Affix]
    var flagMode = FlagChar
    var twoStage = false
    var nextId = 0
    val lines = aff.linesIterator.toVector
    var li = 0
    while (li < lines.length) {
      val line = lines(li).trim
      val args = line.split("\\s+")
      if (line.startsWith("FLAG ")) {
        flagMode = args(1) match {
          case "long" => FlagLong
          case "num"  => FlagNum
          case _      => FlagChar
        }
      } else if ((line.startsWith("PFX ") || line.startsWith("SFX ")) &&
          args.length >= 4 && (args(3) forall Character.isDigit)) {
        val isPrefix = line.startsWith("PFX")
        val flag = parseFlags(args(1), flagMode).head
        val crossProduct = args(2) == "Y"
        val n = args(3).toInt
        var k = 0
        while (k < n && li + 1 + k < lines.length) {
          val ruleArgs = lines(li + 1 + k).trim.split("\\s+")
          var append = ruleArgs(3)
          var cont = Set.empty[Int]
          val slash = append.lastIndexOf('/')
          if (slash >= 0) {
            cont = parseFlags(append.substring(slash + 1), flagMode)
            append = append.substring(0, slash)
            twoStage = true
          }
          if (append == "0") append = ""
          val strip = if (ruleArgs(2) == "0") "" else ruleArgs(2)
          val condRaw = if (ruleArgs.length > 4) ruleArgs(4) else "."
          // "." means no condition; so does a condition equal to the strip
          val cond =
            if (condRaw == "." || condRaw == strip) null else condRaw
          val a = Affix(nextId, flag, strip, append, cont, cond,
            crossProduct, isPrefix)
          nextId += 1
          if (isPrefix) prefixes += a else suffixes += a
          k += 1
        }
        li += n
      }
      li += 1
    }
    (prefixes.result(), suffixes.result(), flagMode, twoStage)
  }

  /** Parse the .dic content; entries are `word/FLAGS` with optional
    * tab-separated morphology and `\/` escapes. */
  def parseDic(dic: String, flagMode: Int): Map[String, List[Set[Int]]] = {
    val m = scala.collection.mutable.LinkedHashMap
      .empty[String, List[Set[Int]]]
    dic.linesIterator.drop(1).foreach { raw =>
      val entry = raw.split('\t')(0).trim
      if (entry.nonEmpty && !entry.startsWith("#")) {
        // last slash not preceded by a backslash splits word from flags
        var slash = -1
        var i = entry.length - 1
        while (i >= 0 && slash < 0) {
          if (entry(i) == '/' && (i == 0 || entry(i - 1) != '\\')) slash = i
          i -= 1
        }
        val (w0, flagPart) =
          if (slash < 0) (entry, "") else (entry.substring(0, slash),
            entry.substring(slash + 1))
        val word = w0.replace("\\/", "/")
        val flags =
          if (flagPart.isEmpty) Set.empty[Int]
          else parseFlags(flagPart, flagMode)
        m.updateWith(word) {
          case Some(l) => Some(l :+ flags)
          case None    => Some(List(flags))
        }
      }
    }
    m.toMap
  }

  /** Load a dictionary from .aff/.dic text. */
  def load(aff: String, dic: String, ignoreCase: Boolean = false): Dict = {
    val (pfx, sfx, flagMode, twoStage) = parseAff(aff)
    val words0 = parseDic(dic, flagMode)
    val words =
      if (!ignoreCase) words0
      else words0.groupMapReduce(
        _._1.toLowerCase(java.util.Locale.ROOT))(_._2)(_ ::: _)
    new Dict(words, pfx, sfx, twoStage, ignoreCase)
  }

  private def resourceText(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** The bundled fixture dictionary (the reference's own test fixture,
    * hunspell/simple.aff + simple.dic). */
  lazy val simple: Dict =
    load(resourceText("/graft/hunspell/simple.aff"),
      resourceText("/graft/hunspell/simple.dic"))
}
