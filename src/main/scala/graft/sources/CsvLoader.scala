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

  /** CSV tokenizer: separator / encapsulator (doubled = literal, quoted
    * fields span lines) / escape char; empty lines skipped when
    * `skipEmptyLines`. Tracks physical line numbers. */
  def parseCsv(content: String, sep: Char, encap: Option[Char],
               escape: Option[Char],
               skipEmptyLines: Boolean = true): Seq[Rec] = {
    val out = Seq.newBuilder[Rec]
    var i = 0; var line = 0
    val n = content.length
    while (i < n) {
      // at start of a physical line
      if (skipEmptyLines && (content.charAt(i) == '\n' ||
        (content.charAt(i) == '\r' && i + 1 < n && content.charAt(i + 1) == '\n'))) {
        if (content.charAt(i) == '\r') i += 1
        i += 1; line += 1
      } else {
        val startLine = line
        val vals = Seq.newBuilder[String]
        val cur = new java.lang.StringBuilder
        var inQuote = false
        var recDone = false
        while (!recDone && i <= n) {
          if (i == n) {
            vals += cur.toString; recDone = true
          } else {
            val c = content.charAt(i)
            if (inQuote) {
              if (encap.contains(c)) {
                if (i + 1 < n && content.charAt(i + 1) == c) {
                  cur.append(c); i += 2 // doubled encapsulator
                } else { inQuote = false; i += 1 }
              } else {
                if (c == '\n') line += 1
                cur.append(c); i += 1
              }
            } else if (escape.contains(c) && i + 1 < n) {
              cur.append(content.charAt(i + 1)); i += 2
            } else if (encap.contains(c) && cur.length() == 0) {
              inQuote = true; i += 1
            } else if (c == sep) {
              vals += cur.toString; cur.setLength(0); i += 1
            } else if (c == '\n' || (c == '\r' && i + 1 < n &&
              content.charAt(i + 1) == '\n')) {
              if (c == '\r') i += 1
              i += 1; line += 1
              vals += cur.toString; recDone = true
            } else if (c == '\r') {
              i += 1; line += 1
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
      val nl = content.indexOf('\n')
      content = if (nl < 0) "" else content.substring(nl + 1)
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
