package graft.sources

import scala.collection.mutable

/** Solr CSV update loader (reference solr/core/.../handler/loader/
  * CSVLoaderBase.java:1, internal/csv/CSVParser.java) — the `/update/csv`
  * request surface: CSV records become multi-valued documents through a
  * per-field adder pipeline with the loader's exact quirks.
  *
  * Reference semantics reproduced:
  *  - Strategy: `separator` (default ','), `encapsulator` (default '"',
  *    doubled encapsulator = literal), optional `escape` (setting escape
  *    WITHOUT an encapsulator disables encapsulation — :131-140); empty
  *    lines skipped; quoted fields may span lines.
  *  - Header rules (:148-162): no `fieldnames` -> header assumed true and
  *    the first RECORD names the fields; `fieldnames` given AND
  *    header=true -> one extra line skipped; `skipLines` raw lines drop
  *    before parsing.
  *  - Adder pipeline order per field: split -> trim -> map -> add
  *    (:173-196, built innermost-add outward). Multiple `map` rules wrap
  *    so the LAST declared rule applies FIRST and feeds the earlier ones.
  *    `add` drops zero-length values unless keepEmpty. Params resolve
  *    per-field first (`f.<name>.map`) then globally (`map`).
  *  - `split` re-parses the value with its OWN single-line CSV strategy
  *    (per-field separator/encapsulator/escape, encapsulation disabled
  *    unless given); an empty value yields the original value (:84-95).
  *  - Empty fieldnames and `skip`-listed fields drop their column.
  *  - `literal.<name>=v` adds a constant field to every document.
  *  - `rowid`/`rowidOffset`: physical line number at record start (plus
  *    offset) as an extra field.
  */
object CsvLoader {

  final case class Params(separator: Char = ',',
                          encapsulator: Option[Char] = Some('"'),
                          escape: Option[Char] = None,
                          fieldnames: Option[Seq[String]] = None,
                          header: Option[Boolean] = None,
                          skipLines: Int = 0,
                          skip: Set[String] = Set.empty,
                          keepEmpty: Boolean = false,
                          fKeepEmpty: Map[String, Boolean] = Map.empty,
                          map: Seq[(String, String)] = Nil,
                          fMap: Map[String, Seq[(String, String)]] = Map.empty,
                          trim: Boolean = false,
                          fTrim: Map[String, Boolean] = Map.empty,
                          split: Boolean = false,
                          fSplit: Map[String, Boolean] = Map.empty,
                          fSeparator: Map[String, Char] = Map.empty,
                          fEncapsulator: Map[String, Char] = Map.empty,
                          fEscape: Map[String, Char] = Map.empty,
                          literals: Seq[(String, String)] = Nil,
                          rowId: Option[String] = None,
                          rowIdOffset: Int = 0) {
    // setting escape without an encapsulator disables encapsulation
    // (CSVLoaderBase.java:131-140)
    def effEncap: Option[Char] =
      if (encapsulator.isEmpty && escape.isDefined) None else encapsulator
    def keepEmptyOf(f: String): Boolean = fKeepEmpty.getOrElse(f, keepEmpty)
    def mapOf(f: String): Seq[(String, String)] = fMap.getOrElse(f, map)
    def trimOf(f: String): Boolean = fTrim.getOrElse(f, trim)
    def splitOf(f: String): Boolean = fSplit.getOrElse(f, split)
  }

  /** One parsed record with the physical line index where it started. */
  final case class Rec(line: Int, vals: Seq[String])

  /** CSVParser.readEscape: r/n/t/b/f decode, anything else literal. */
  private def readEscape(next: Char): Char = next match {
    case 'r' => '\r'; case 'n' => '\n'; case 't' => '\t'
    case 'b' => '\b'; case 'f' => '\f'; case c => c
  }

  /** CSV tokenizer (reference internal/csv/CSVParser semantics):
    * separator / encapsulator (doubled = literal, quoted fields span
    * lines) / escape char with r-n-t-b-f decoding (readEscape, applied
    * inside AND outside quotes); after a closing encapsulator only
    * whitespace may precede the delimiter/EOL (else error), and EOF
    * inside a quoted field errors; empty lines (LF, CRLF or lone CR)
    * skipped when `skipEmptyLines`. Tracks physical line numbers. */
  def parseCsv(content: String, sep: Char, encap: Option[Char],
               escape: Option[Char],
               skipEmptyLines: Boolean = true): Seq[Rec] = {
    val out = Seq.newBuilder[Rec]
    var i = 0; var line = 0
    val n = content.length
    def atEol(k: Int): Boolean =
      content.charAt(k) == '\n' || content.charAt(k) == '\r'
    def eolLen(k: Int): Int =
      if (content.charAt(k) == '\r' && k + 1 < n &&
        content.charAt(k + 1) == '\n') 2 else 1
    while (i < n) {
      // at start of a physical line
      if (skipEmptyLines && atEol(i)) {
        i += eolLen(i); line += 1
      } else {
        val startLine = line
        val vals = Seq.newBuilder[String]
        val cur = new java.lang.StringBuilder
        var inQuote = false
        var recDone = false
        while (!recDone && i <= n) {
          if (i == n) {
            require(!inQuote,
              s"(startline $startLine) eof reached before encapsulated token finished")
            vals += cur.toString; recDone = true
          } else {
            val c = content.charAt(i)
            if (inQuote) {
              if (escape.contains(c) && i + 1 < n &&
                !encap.contains(c)) {
                cur.append(readEscape(content.charAt(i + 1))); i += 2
              } else if (encap.contains(c)) {
                if (i + 1 < n && content.charAt(i + 1) == c) {
                  cur.append(c); i += 2 // doubled encapsulator
                } else {
                  inQuote = false; i += 1
                  // only whitespace allowed until delimiter/EOL/EOF
                  var closed = false
                  while (!closed && i < n) {
                    val d = content.charAt(i)
                    if (d == sep) {
                      vals += cur.toString; cur.setLength(0); i += 1
                      closed = true
                    } else if (atEol(i)) {
                      i += eolLen(i); line += 1
                      vals += cur.toString; recDone = true; closed = true
                    } else if (d.isWhitespace) i += 1
                    else throw new IllegalArgumentException(
                      s"(line $line) invalid char between encapsulated token end delimiter")
                  }
                  if (!closed) { // EOF right after the quote
                    vals += cur.toString; recDone = true
                  }
                }
              } else {
                if (c == '\n') line += 1
                cur.append(c); i += 1
              }
            } else if (escape.contains(c) && i + 1 < n) {
              cur.append(readEscape(content.charAt(i + 1))); i += 2
            } else if (encap.contains(c) && cur.length() == 0) {
              inQuote = true; i += 1
            } else if (c == sep) {
              vals += cur.toString; cur.setLength(0); i += 1
            } else if (atEol(i)) {
              i += eolLen(i); line += 1
              vals += cur.toString; recDone = true
            } else {
              cur.append(c); i += 1
            }
          }
        }
        out += Rec(startLine, vals.result())
      }
    }
    out.result()
  }

  /** Load documents: (rowidLine, field -> ordered values). */
  def loadDocs(content0: String, p: Params): Seq[(Int, Map[String, Seq[String]])] = {
    // skipLines drops RAW physical lines before any parsing (:232-240)
    var effSkip = p.skipLines
    if (p.fieldnames.isDefined && p.header.contains(true)) effSkip += 1
    var content = content0
    var skipped = 0
    while (skipped < effSkip) {
      // readLine semantics: LF, CRLF or lone CR all end a raw line
      val idx = content.indexWhere(c => c == '\n' || c == '\r')
      content =
        if (idx < 0) ""
        else if (content.charAt(idx) == '\r' && idx + 1 < content.length &&
          content.charAt(idx + 1) == '\n') content.substring(idx + 2)
        else content.substring(idx + 1)
      skipped += 1
    }
    var recs = parseCsv(content, p.separator, p.effEncap, p.escape)
    val fieldnames: Seq[String] = p.fieldnames.getOrElse {
      require(p.header.forall(identity),
        "must specify fieldnames or header=true")
      require(recs.nonEmpty, "Expected fieldnames in CSV input")
      val h = recs.head.vals; recs = recs.tail; h
    }
    recs.map { rec =>
      // CSVLoaderBase.load:316-318 — a short or long line is an input
      // error, never a partial document
      require(rec.vals.length == fieldnames.length,
        s"CSVLoader: line=${rec.line}, expected ${fieldnames.length} " +
          s"values but got ${rec.vals.length}")
      val doc = mutable.LinkedHashMap[String, mutable.ArrayBuffer[String]]()
      def add(f: String, v: String): Unit =
        if (v.nonEmpty || p.keepEmptyOf(f))
          doc.getOrElseUpdate(f, mutable.ArrayBuffer()) += v
      // pipeline per value: split -> trim -> map(last rule first) -> add
      def mapAdd(f: String, v0: String): Unit = {
        var v = v0
        for ((from, to) <- p.mapOf(f).reverse)
          if (v == from) v = to
        add(f, v)
      }
      def trimMapAdd(f: String, v: String): Unit =
        mapAdd(f, if (p.trimOf(f)) v.trim else v)
      for ((f, col) <- fieldnames.zipWithIndex
           if f.nonEmpty && !p.skip.contains(f) && col < rec.vals.length) {
        val v = rec.vals(col)
        if (p.splitOf(f)) {
          val fs = p.fSeparator.getOrElse(f, ',')
          val fe = p.fEncapsulator.get(f)
          val fx = p.fEscape.get(f)
          val pieces = parseCsv(v, fs, fe, fx, skipEmptyLines = false)
          if (pieces.isEmpty || v.isEmpty) trimMapAdd(f, v)
          else pieces.head.vals.foreach(trimMapAdd(f, _))
        } else trimMapAdd(f, v)
      }
      for ((name, value) <- p.literals) add(name, value)
      for (rf <- p.rowId)
        add(rf, (rec.line + p.rowIdOffset).toString)
      (rec.line + p.rowIdOffset, doc.view.mapValues(_.toSeq).toMap)
    }
  }
}

/** Solr CSV response writer (wt=csv — reference solr/core/.../response/
  * CSVResponseWriter.java, internal/csv/CSVPrinter.java): documents out
  * as CSV with the printer's exact quote/escape decisions.
  *
  * Reference quirks reproduced:
  *  - Encapsulate decision (CSVPrinter.printAndEncapsulate): empty value
  *    quotes ONLY when it is the first cell on the line; a value quotes
  *    when its first char is <= '#', when a FIRST-on-line value starts
  *    with any non-alphanumeric, when it contains CR/LF/delimiter/
  *    encapsulator, or when its LAST char is <= ' '. Quoting doubles
  *    embedded encapsulators.
  *  - Escape mode (escape set without encapsulator): CR -> \r, LF -> \n,
  *    delimiter and escape char backslash-escaped in place.
  *  - Multi-valued fields print through a SECOND strategy (default:
  *    main delimiter, NO encapsulator, '\\' escape; csv.mv.separator /
  *    csv.mv.encapsulator / csv.mv.escape override — setting the mv
  *    encapsulator without an mv escape disables the mv escape), and the
  *    joined string is then printed as ONE cell by the main printer.
  *  - Missing/empty fields print csv.null (default "").
  */
object CsvResponse {

  final case class WParams(separator: Char = ',',
                           encapsulator: Option[Char] = Some('"'),
                           escape: Option[Char] = None,
                           mvSeparator: Option[Char] = None,
                           mvEncapsulator: Option[Char] = None,
                           mvEscape: Option[Char] = None,
                           nullValue: String = "",
                           header: Boolean = true,
                           newline: String = "\n",
                           fields: Seq[String] = Nil,
                           multiValued: Set[String] = Set.empty) {
    // main strategy: escape set WITHOUT an explicit encapsulator param
    // is modeled by passing encapsulator = None
    def mvStrat: (Char, Option[Char], Option[Char]) = {
      val sep = mvSeparator.getOrElse(separator)
      (mvEncapsulator, mvEscape) match {
        case (Some(e), None)    => (sep, Some(e), None)
        case (Some(e), Some(x)) => (sep, Some(e), Some(x))
        case (None, Some(x))    => (sep, None, Some(x))
        case (None, None)       => (sep, None, Some('\\'))
      }
    }
  }

  /** CSVPrinter.print for one cell under (delim, encap, escape). */
  private[sources] def printCell(sb: java.lang.StringBuilder, v: String,
                                 first: Boolean, delim: Char,
                                 encap: Option[Char],
                                 escape: Option[Char]): Unit = {
    if (!first) sb.append(delim)
    encap match {
      case Some(q) =>
        var quote = false
        if (v.isEmpty) quote = first
        else {
          val c0 = v.charAt(0)
          // the reference's ASCII-only alnum test (CSVPrinter
          // printAndEncapsulate) — a non-ASCII first char on a new line
          // quotes even though it is a Unicode letter
          val nonAsciiAlnum = c0 < '0' || (c0 > '9' && c0 < 'A') ||
            (c0 > 'Z' && c0 < 'a') || c0 > 'z'
          if (first && nonAsciiAlnum) quote = true
          else if (c0 <= '#') quote = true
          else if (v.exists(c => c == '\n' || c == '\r' || c == q || c == delim))
            quote = true
          else if (v.charAt(v.length - 1) <= ' ') quote = true
        }
        if (!quote) sb.append(v)
        else {
          sb.append(q)
          v.foreach { c =>
            if (c == q) sb.append(q).append(q) else sb.append(c)
          }
          sb.append(q)
        }
      case None => escape match {
        case Some(x) =>
          v.foreach {
            case '\n' => sb.append(x).append('n')
            case '\r' => sb.append(x).append('r')
            case c if c == delim || c == x => sb.append(x).append(c)
            case c => sb.append(c)
          }
        case None => sb.append(v)
      }
    }
  }

  /** Serialize documents (field -> values) to CSV text. */
  def write(docs: Seq[Map[String, Seq[String]]], p: WParams): String = {
    val sb = new java.lang.StringBuilder
    val mainEncap =
      if (p.escape.isDefined && p.encapsulator.isEmpty) None else p.encapsulator
    val mainEscape = if (mainEncap.isEmpty) p.escape else None
    def cell(v: String, first: Boolean): Unit =
      printCell(sb, v, first, p.separator, mainEncap, mainEscape)
    if (p.header) {
      p.fields.zipWithIndex.foreach { case (f, i) => cell(f, i == 0) }
      sb.append(p.newline)
    }
    val (mvSep, mvEnc, mvEsc) = p.mvStrat
    for (doc <- docs) {
      p.fields.zipWithIndex.foreach { case (f, i) =>
        val vals = doc.getOrElse(f, Nil)
        if (vals.isEmpty) cell(p.nullValue, i == 0)
        else if (vals.size > 1 || p.multiValued.contains(f)) {
          // encode through the mv printer, then the joined string is one
          // main-printer cell
          val mv = new java.lang.StringBuilder
          vals.zipWithIndex.foreach { case (v, k) =>
            printCell(mv, v, k == 0, mvSep, mvEnc, mvEsc)
          }
          cell(mv.toString, i == 0)
        } else cell(vals.head, i == 0)
      }
      sb.append(p.newline)
    }
    sb.toString
  }
}
