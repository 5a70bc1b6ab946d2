package graft.operators

import java.text.{NumberFormat, ParsePosition, SimpleDateFormat}
import java.util.{Locale, TimeZone}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataImportHandler transformer chain (reference solr/contrib/
  * dataimporthandler): the row-shaped ETL surface Solr users run at
  * ingest, re-expressed for Spark. Each transformer scans the WHOLE
  * field list (like the reference's Transformer.transformRow contract),
  * and the chain applies in declared order, so a later field can consume
  * a column an earlier transformer produced — including through
  * `${entity.col}` variable references (VariableResolver).
  *
  * Reference semantics reproduced exactly:
  *  - RegexTransformer.java:40-150: `splitBy` (Java String.split — drops
  *    trailing empties), `replaceWith` (m.find ? replaceAll : ORIGINAL
  *    value), `regex` group extraction (1 group -> the column; >1 groups
  *    -> List, or named columns via `groupNames` with empty slots
  *    skipped; no match -> row untouched; replaceWith wins over
  *    groupNames). List inputs map element-wise, fanning group values
  *    into parallel lists.
  *  - DateFormatTransformer.java:43-70: SimpleDateFormat parse of the
  *    trimmed value, blank -> null, List inputs element-wise; parse
  *    failures leave the row untouched (logged warning in the ref).
  *  - TemplateTransformer.java:40-70: a pure `${var}`
  *    expression copies the RAW value; any unresolvable variable skips
  *    the field (pre-existing value survives); otherwise string
  *    replacement of every `${...}`.
  *  - NumberFormatTransformer.java:40-100: styles int/number/percent/
  *    currency via java.text.NumberFormat with a STRICT
  *    whole-string-consumed check; blank values skipped.
  *  - ClobTransformer.java:35-60: blob -> UTF-8 string.
  *  - HTMLStripTransformer: strips via the analysis HtmlStrip (same
  *    HTMLStripCharFilter semantics).
  *  - LineEntityProcessor.java:49-96: acceptLineRegex / skipLineRegex use
  *    FIND (unanchored) semantics, accept checked before skip.
  *
  * One deliberate deviation: date parsing pins the UTC zone (the
  * reference uses the JVM default zone) so results are reproducible
  * across hosts; pass `tz` to override.
  */
object DataImport {

  /** One `<field .../>` spec. `column` is the output column; `srcColName`
    * defaults to `column` (reading and writing the same column). */
  final case class Field(column: String,
                         srcColName: Option[String] = None,
                         regex: Option[String] = None,
                         splitBy: Option[String] = None,
                         replaceWith: Option[String] = None,
                         groupNames: Option[String] = None,
                         template: Option[String] = None,
                         dateTimeFormat: Option[String] = None,
                         formatStyle: Option[String] = None,
                         locale: Option[String] = None,
                         clob: Boolean = false,
                         stripHTML: Boolean = false) {
    def src: String = srcColName.getOrElse(column)
  }

  type DihRow = mutable.LinkedHashMap[String, Any]

  /** Compiled-pattern cache (the reference's RegexTransformer.getPattern
    * cache): the pattern population is bounded by the field specs (plus
    * ${var}-resolved variants), so an unbounded per-JVM map is safe and
    * removes a Pattern.compile per value. */
  private val patternCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]
  private def pattern(re: String): java.util.regex.Pattern = {
    var p = patternCache.get(re)
    if (p == null) {
      p = java.util.regex.Pattern.compile(re)
      patternCache.putIfAbsent(re, p)
    }
    p
  }

  /** SimpleDateFormat is not thread-safe: cache per thread, keyed by
    * (pattern, locale, zone) — the reference's fmtCache is per
    * transformer instance, same idea. */
  private val sdfCache =
    ThreadLocal.withInitial[mutable.Map[(String, Locale, String), SimpleDateFormat]](
      () => mutable.Map[(String, Locale, String), SimpleDateFormat]())
  private def sdf(fmt: String, locale: Locale, tz: String): SimpleDateFormat =
    sdfCache.get().getOrElseUpdate((fmt, locale, tz), {
      val f = new SimpleDateFormat(fmt, locale)
      f.setTimeZone(TimeZone.getTimeZone(tz))
      f
    })

  // ---------- VariableResolver subset ---------------------------------

  private val VarPat = "\\$\\{([^}]*)\\}".r

  /** Resolve `${ns.col}` / `${col}` against the row (entity namespace
    * prefix stripped when it matches). Null when unresolvable. */
  def resolveVar(v: String, row: DihRow, entity: String): Any = {
    val key =
      if (v.startsWith(entity + ".")) v.substring(entity.length + 1) else v
    row.get(key).orNull
  }

  def getVariables(expr: String): List[String] =
    VarPat.findAllMatchIn(expr).map(_.group(1)).toList

  def replaceTokens(s: String, row: DihRow, entity: String): String =
    if (s == null) null
    else VarPat.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement {
      val v = resolveVar(m.group(1), row, entity)
      if (v == null) "" else v.toString
    })

  // ---------- RegexTransformer ----------------------------------------

  def regexTransform(row: DihRow, fields: Seq[Field],
                     entity: String = "e"): DihRow = {
    for (f <- fields) {
      val reStr = f.regex.map(replaceTokens(_, row, entity)).orNull
      val splitBy = f.splitBy.map(replaceTokens(_, row, entity)).orNull
      val replaceWith = f.replaceWith.map(replaceTokens(_, row, entity)).orNull
      val groupNames = f.groupNames.map(replaceTokens(_, row, entity)).orNull
      if (reStr != null || splitBy != null) {
        row.get(f.src).orNull match {
          case null =>
          case inputs: List[_] =>
            val results = mutable.ArrayBuffer[Any]()
            var otherVars: mutable.Map[String, mutable.ArrayBuffer[Any]] = null
            for (in <- inputs) {
              processOne(f.column, reStr, splitBy, replaceWith,
                String.valueOf(in), groupNames) match {
                case null =>
                case m: Map[_, _] =>
                  m.asInstanceOf[Map[String, Any]].foreach { case (k, v) =>
                    val sink =
                      if (k == f.column) results
                      else {
                        if (otherVars == null) otherVars = mutable.Map()
                        otherVars.getOrElseUpdate(k, mutable.ArrayBuffer[Any]())
                      }
                    v match {
                      case c: Seq[_] => sink ++= c
                      case one => sink += one
                    }
                  }
                case c: Seq[_] => results ++= c
                case one => results += one
              }
            }
            row(f.column) = results.toList
            if (otherVars != null)
              otherVars.foreach { case (k, v) => row(k) = v.toList }
          case v =>
            processOne(f.column, reStr, splitBy, replaceWith,
              String.valueOf(v), groupNames) match {
              case null =>
              case m: Map[_, _] =>
                m.asInstanceOf[Map[String, Any]].foreach { case (k, x) => row(k) = x }
              case o => row(f.column) = o
            }
        }
      }
    }
    row
  }

  /** One value through one regex field spec — RegexTransformer.process. */
  private def processOne(col: String, reStr: String, splitBy: String,
                         replaceWith: String, value: String,
                         groupNames: String): Any =
    if (splitBy != null) value.split(splitBy).toList
    else if (replaceWith != null) {
      val m = pattern(reStr).matcher(value)
      if (m.find()) m.replaceAll(replaceWith) else value
    } else {
      val names =
        if (groupNames != null && groupNames.trim.nonEmpty)
          groupNames.split(",") else null
      val m = pattern(reStr).matcher(value)
      if (m.find() && m.groupCount() > 0) {
        if (m.groupCount() > 1) {
          if (names == null) (1 to m.groupCount()).map(m.group).toList
          else {
            val out = mutable.LinkedHashMap[String, Any]()
            for (i <- 1 to m.groupCount() if i <= names.length) {
              val n = names(i - 1)
              if (n != null && n.trim.nonEmpty) out(n) = m.group(i)
            }
            out.toMap
          }
        } else m.group(1)
      } else null
    }

  // ---------- DateFormatTransformer -----------------------------------

  def dateFormatTransform(row: DihRow, fields: Seq[Field],
                          entity: String = "e",
                          tz: String = "UTC"): DihRow = {
    for (f <- fields; fmtStr <- f.dateTimeFormat) {
      val fmt = replaceTokens(fmtStr, row, entity)
      val locale = f.locale.map(new Locale(_)).getOrElse(Locale.ROOT)
      def parse(v: Any): java.sql.Timestamp = {
        if (v == null) return null
        val s = v.toString.trim
        if (s.isEmpty) return null
        new java.sql.Timestamp(sdf(fmt, locale, tz).parse(s).getTime)
      }
      try row.get(f.src).orNull match {
        case null =>
        case l: List[_] => row(f.column) = l.map(parse)
        case v => row(f.column) = parse(v)
      } catch { case _: java.text.ParseException => /* ref: warn + skip */ }
    }
    row
  }

  // ---------- TemplateTransformer -------------------------------------

  def templateTransform(row: DihRow, fields: Seq[Field],
                        entity: String = "e"): DihRow = {
    for (f <- fields; expr <- f.template) {
      val vars = getVariables(expr)
      val resolvable = vars.forall(resolveVar(_, row, entity) != null)
      if (resolvable) {
        if (vars.size == 1 && expr.startsWith("${") && expr.endsWith("}"))
          row(f.column) = resolveVar(vars.head, row, entity)
        else row(f.column) = replaceTokens(expr, row, entity)
      }
    }
    row
  }

  // ---------- NumberFormatTransformer ---------------------------------

  def numberFormatTransform(row: DihRow, fields: Seq[Field],
                            entity: String = "e"): DihRow = {
    for (f <- fields; style0 <- f.formatStyle) {
      val style = replaceTokens(style0, row, entity).toLowerCase(Locale.ROOT)
      val locale = f.locale.map { s =>
        val m = "^([a-z]{2})-([A-Z]{2})$".r.findFirstMatchIn(s)
          .getOrElse(throw new IllegalArgumentException(s"bad locale $s"))
        new Locale(m.group(1), m.group(2))
      }.getOrElse(Locale.ROOT)
      def nf(): NumberFormat = style match {
        case "integer"  => NumberFormat.getIntegerInstance(locale)
        case "number"   => NumberFormat.getNumberInstance(locale)
        case "currency" => NumberFormat.getCurrencyInstance(locale)
        case "percent"  => NumberFormat.getPercentInstance(locale)
        case other => throw new IllegalArgumentException(s"style $other")
      }
      def parse(s: String): Number = {
        val pos = new ParsePosition(0)
        val n = nf().parse(s, pos)
        if (pos.getIndex != s.length)
          throw new java.text.ParseException("illegal number format", pos.getIndex)
        n
      }
      row.get(f.src).orNull match {
        case null =>
        case l: List[_] =>
          row(f.column) = l.map(v => parse(String.valueOf(v)))
        case v if v.toString.trim.isEmpty =>
        case v => row(f.column) = parse(v.toString)
      }
    }
    row
  }

  // ---------- Clob / HTMLStrip ----------------------------------------

  def clobTransform(row: DihRow, fields: Seq[Field]): DihRow = {
    for (f <- fields if f.clob) row.get(f.src).orNull match {
      case b: Array[Byte] => row(f.column) = new String(b, "UTF-8")
      case _ =>
    }
    row
  }

  def htmlStripTransform(row: DihRow, fields: Seq[Field]): DihRow = {
    for (f <- fields if f.stripHTML) row.get(f.src).orNull match {
      case null =>
      case l: List[_] =>
        row(f.column) = l.map(v => graft.analysis.HtmlStrip.strip(String.valueOf(v)))
      case v => row(f.column) = graft.analysis.HtmlStrip.strip(v.toString)
    }
    row
  }

  // ---------- the chain -----------------------------------------------

  /** Apply the named transformers in order — mirrors the entity's
    * transformer="RegexTransformer,DateFormatTransformer,..." attribute. */
  def applyChain(row: DihRow, fields: Seq[Field], transformers: Seq[String],
                 entity: String = "e", tz: String = "UTC"): DihRow = {
    var r = row
    for (t <- transformers) r = t match {
      case "RegexTransformer"        => regexTransform(r, fields, entity)
      case "DateFormatTransformer"   => dateFormatTransform(r, fields, entity, tz)
      case "TemplateTransformer"     => templateTransform(r, fields, entity)
      case "NumberFormatTransformer" => numberFormatTransform(r, fields, entity)
      case "ClobTransformer"         => clobTransform(r, fields)
      case "HTMLStripTransformer"    => htmlStripTransform(r, fields)
      case other => throw new IllegalArgumentException(s"transformer $other")
    }
    r
  }

  /** LineEntityProcessor predicate: accept (find) then skip (find). */
  def lineAccepted(line: String, acceptLineRegex: Option[String],
                   skipLineRegex: Option[String]): Boolean = {
    val acc = acceptLineRegex.forall(r => pattern(r).matcher(line).find())
    val skip = skipLineRegex.exists(r => pattern(r).matcher(line).find())
    acc && !skip
  }

  // ---------- Spark integration ---------------------------------------

  /** Run the transformer chain over a DataFrame: every input column
    * seeds the row map; `out` declares the output schema (string, long,
    * double, timestamp, array<string> supported). A single mapPartitions
    * — per-row work, zero shuffle, fully data-parallel. */
  def transform(df: DataFrame, fields: Seq[Field], transformers: Seq[String],
                out: Seq[(String, DataType)], entity: String = "e",
                tz: String = "UTC"): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(out.map { case (n, t) =>
      StructField(n, t, nullable = true) })
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val row: DihRow = mutable.LinkedHashMap()
        inSchema.fields.zipWithIndex.foreach { case (f, i) =>
          row(f.name) = r.get(i) match {
            case s: scala.collection.Seq[_] => s.toList
            case v => v
          }
        }
        val done = applyChain(row, fields, transformers, entity, tz)
        Row.fromSeq(out.map { case (n, t) =>
          val v = done.get(n).orNull
          (v, t) match {
            case (null, _) => null
            case (x, StringType) => x.toString
            case (x: Number, LongType) => x.longValue()
            case (x: Number, IntegerType) => x.intValue()
            case (x: Number, DoubleType) => x.doubleValue()
            case (x: String, LongType) => x.trim.toLong
            case (x: String, IntegerType) => x.trim.toInt
            case (x: String, DoubleType) => x.trim.toDouble
            case (x: java.sql.Timestamp, TimestampType) => x
            case (l: List[_], ArrayType(StringType, _)) =>
              l.map(e => if (e == null) null else e.toString)
            case (x, _) => x
          }
        })
      }
    }(enc)
  }
}
