package graft.operators

import java.net.{URI, URL}
import java.time.Instant
import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Solr update-request-processor chain, re-expressed as Spark Columns.
  *
  * The reference runs each added document through a configured chain of
  * `UpdateRequestProcessor`s before indexing (reference
  * solr/core/src/java/org/apache/solr/update/processor/
  * UpdateRequestProcessorChain.java:59ff). Every processor here is
  * row-local, so the whole chain compiles to one codegen'd projection —
  * no shuffle, no state; at 100 TB it is a pure map over the ingest scan.
  *
  * Multi-valued fields are modeled as `array<string>` columns; each
  * field-mutating processor is a Column→Column function, composed by
  * ordinary function application in chain order (exactly the reference's
  * processor-chain order semantics).
  */
object UpdateChain {

  // ---- field-mutating processors (FieldMutatingUpdateProcessor family) --

  /** TrimFieldUpdateProcessorFactory.java:54-58: `String.trim()` on every
    * CharSequence value — Java trim strips BOTH ends of every char
    * `<= U+0020`, not just spaces. */
  def trimVals(c: Column): Column =
    transform(c, v => regexp_replace(v, "^[\\x00-\\x20]+|[\\x00-\\x20]+$", ""))

  /** RemoveBlankFieldUpdateProcessorFactory.java:49-55: only ZERO-LENGTH
    * values are removed (whitespace-only values survive unless a trim ran
    * earlier in the chain). */
  def removeBlank(c: Column): Column = filter(c, v => length(v) > 0)

  /** FieldLengthUpdateProcessorFactory.java:47-52: each string value is
    * replaced by its character length. */
  def fieldLength(c: Column): Column = transform(c, v => length(v))

  /** ConcatFieldUpdateProcessorFactory.java:66,75-83: fields with 2+
    * values collapse to ONE delimiter-joined value; single-valued and
    * empty fields pass through untouched. Default delimiter ", ". */
  def concatVals(c: Column, delimiter: String = ", "): Column =
    when(size(c) <= 1, c).otherwise(array(array_join(c, delimiter)))

  /** CountFieldValuesUpdateProcessorFactory.java:58-63: the field's value
    * becomes its value COUNT (getValueCount of a missing field is 0 but
    * the mutator only runs when the field exists — callers guard). */
  def countVals(c: Column): Column = size(c)

  /** FirstFieldValueUpdateProcessorFactory.java:52-55 /
    * LastFieldValueUpdateProcessorFactory.java:56-72 /
    * Min/MaxFieldValueUpdateProcessorFactory.java:52-63 — keep exactly one
    * value (min/max use natural ordering and require mutually-comparable
    * values; on strings that is lexicographic). */
  def firstVal(c: Column): Column = element_at(c, 1)
  def lastVal(c: Column): Column = element_at(c, -1)
  def minVal(c: Column): Column = array_min(c)
  def maxVal(c: Column): Column = array_max(c)

  /** UniqFieldsUpdateProcessorFactory.java:53-63: de-duplicate preserving
    * first-occurrence order (the reference collects into an insertion-
    * ordered set; Spark's array_distinct keeps first occurrences). */
  def uniqVals(c: Column): Column = array_distinct(c)

  /** TruncateFieldUpdateProcessorFactory.java:79-87: values longer than
    * maxLength keep their first maxLength chars; shorter pass through. */
  def truncateVals(c: Column, maxLength: Int): Column =
    transform(c, v => substring(v, 1, maxLength))

  /** RegexReplaceProcessorFactory.java:81-120: replaceAll with
    * `literalReplacement` defaulting to TRUE — the replacement string is
    * `Matcher.quoteReplacement`ed, so `$` and `\` in it are literal. With
    * literalReplacement=false, `$n` group references apply (Spark's
    * regexp_replace semantics already). */
  def regexReplaceVals(c: Column, pattern: String, replacement: String,
                       literalReplacement: Boolean = true): Column = {
    val repl =
      if (literalReplacement)
        replacement.replace("\\", "\\\\").replace("$", "\\$")
      else replacement
    transform(c, v => regexp_replace(v, pattern, repl))
  }

  /** DefaultValueUpdateProcessorFactory.java:71-79: a missing (or absent)
    * field gets the configured default; present fields are untouched. */
  def defaultValue(c: Column, dv: String): Column =
    when(c.isNull || size(c) === 0, array(lit(dv))).otherwise(c)

  /** HTMLStripFieldUpdateProcessorFactory.java:57-70 strips markup with
    * the analysis HTMLStripCharFilter — reuse the analyzer's port. */
  def htmlStripVals(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    val strip = udf((vs: Seq[String]) =>
      if (vs == null) null else vs.map(v => graft.analysis.HtmlStrip.strip(v)))
    strip(c)
  }

  // ---- all-or-none parse processors (ParseXFieldUpdateProcessorFactory) --

  // NumberFormat with the default (ROOT) locale accepts optional
  // `,`-grouped digit groups; parse must consume the WHOLE string
  // (ParseNumericFieldUpdateProcessorFactory.java — pos.getIndex()
  // != length => not mutated).
  private val IntPat = "^[+-]?(\\d{1,3}(,\\d{3})+|\\d+)$"
  private val DoublePat = "^[+-]?(\\d{1,3}(,\\d{3})+|\\d+)(\\.\\d+)?$"

  private def degroup(v: Column): Column = regexp_replace(v, ",", "")

  /** ParseLongFieldUpdateProcessorFactory semantics over a multi-valued
    * string field: returns the parsed array<long>, or NULL when ANY value
    * fails to parse — the AllValuesOrNoneFieldMutatingUpdateProcessor
    * contract (mutate every value or leave the field entirely alone);
    * callers coalesce with the original field. */
  def parseLongs(c: Column): Column =
    when(forall(c, v => v.rlike(IntPat)),
      transform(c, v => degroup(v).cast("long")))

  /** ParseIntFieldUpdateProcessorFactory.java:61-84 adds the 32-bit
    * roundtrip check: a value that parses but overflows Int is NOT
    * mutated (so the whole field stays put). */
  def parseInts(c: Column): Column =
    when(forall(c, v => v.rlike(IntPat) &&
           degroup(v).cast("long").between(Int.MinValue, Int.MaxValue)),
      transform(c, v => degroup(v).cast("int")))

  /** ParseDoubleFieldUpdateProcessorFactory: NumberFormat double parse,
    * whole-string consumption, all-or-none. */
  def parseDoubles(c: Column): Column =
    when(forall(c, v => v.rlike(DoublePat)),
      transform(c, v => degroup(v).cast("double")))

  /** ParseBooleanFieldUpdateProcessorFactory.java:63-97: configurable
    * trueValues/falseValues (defaults {"true"}/{"false"}), caseSensitive
    * defaulting to FALSE; a value in neither set blocks the whole field
    * (all-or-none). */
  def parseBooleans(c: Column,
                    trueValues: Set[String] = Set("true"),
                    falseValues: Set[String] = Set("false"),
                    caseSensitive: Boolean = false): Column = {
    val tv = if (caseSensitive) trueValues else trueValues.map(_.toLowerCase(Locale.ROOT))
    val fv = if (caseSensitive) falseValues else falseValues.map(_.toLowerCase(Locale.ROOT))
    def norm(v: Column) = if (caseSensitive) v else lower(v)
    when(forall(c, v => norm(v).isin((tv ++ fv).toSeq.map(lit): _*)),
      transform(c, v => norm(v).isin(tv.toSeq.map(lit): _*)))
  }

  /** ParseDateFieldUpdateProcessorFactory: try each configured format in
    * order; all values must parse under SOME configured format
    * (per-value, first format wins), else the field is untouched. */
  def parseDates(c: Column, formats: Seq[String]): Column = {
    def tryOne(v: Column): Column =
      formats.map(f => to_timestamp(v, f)).reduce(coalesce(_, _))
    when(forall(c, v => tryOne(v).isNotNull), transform(c, tryOne(_)))
  }

  // ---- URLClassifyProcessor ------------------------------------------

  /** Output row of URLClassifyProcessor.java:115-131 (all six fields). */
  final case class UrlClass(url_length: Int, url_levels: Int,
                            url_toplevel: Int, url_landingpage: Int,
                            url_domain: String, url_canonical: String)

  // URLClassifyProcessor.java:69-87 — note the reference's
  // isLandingPage uses reference-(in)equality `suffix != ""` against
  // these array constants, so a bare trailing "/" IS a landing page.
  private val LandingPageSuffixes: Array[String] = Array(
    "/", "index.html", "index.htm", "index.phtml", "index.shtml",
    "index.xml", "index.php", "index.asp", "index.aspx",
    "welcome.html", "welcome.htm", "welcome.phtml", "welcome.shtml",
    "welcome.xml", "welcome.php", "welcome.asp", "welcome.aspx")

  private def landingPageSuffix(u: URL): String = {
    val path = Option(u.getPath).getOrElse("").toLowerCase(Locale.ROOT)
    LandingPageSuffixes.find(path.endsWith).getOrElse("")
  }

  private def pathWithoutSuffix(u: URL): String = {
    val path = Option(u.getPath).getOrElse("").toLowerCase(Locale.ROOT)
    val sfx = landingPageSuffix(u)
    if (sfx.nonEmpty && path.endsWith(sfx)) path.dropRight(sfx.length) else path
  }

  /** URLClassifyProcessor.java:160-231, vectors pinned by the reference's
    * URLClassifyProcessorTest: normalize via `new URI(url).normalize()`
    * (resolves `.`/`..`), levels = '/' count of the suffix-and-
    * trailing-slash-stripped path, toplevel = empty stripped path AND no
    * query, landing = suffix match (incl. bare "/") AND no query,
    * canonical = first `/suffix$` replaced by `/`. Malformed URLs are
    * skipped (the reference logs and leaves the doc untouched). */
  def classifyUrl(url: String): Option[UrlClass] =
    try {
      val n = new URI(url).normalize().toURL
      val stripped = pathWithoutSuffix(n).replaceAll("/+$", "")
      val levels = stripped.count(_ == '/')
      val toplevel = stripped.isEmpty && n.getQuery == null
      val landing = n.getQuery == null && landingPageSuffix(n).nonEmpty
      val lps = landingPageSuffix(n)
      val canonical =
        if (lps.isEmpty) n.toString
        else n.toString.replaceFirst("/" + java.util.regex.Pattern.quote(lps) + "$", "/")
      Some(UrlClass(n.toString.length, levels, if (toplevel) 1 else 0,
        if (landing) 1 else 0, n.getHost, canonical))
    } catch { case _: Exception => None }

  // ---- SignatureUpdateProcessor ---------------------------------------

  /** Bob Jenkins' lookup3, "ycs" 64-bit chained variant (reference
    * solr/solrj/.../common/util/Hash.java:193-249 lookup3ycs64): consumes
    * UTF-16 chars merging surrogate pairs to code points, mixes every 3,
    * finalizes only when the last block was unmixed. */
  def lookup3ycs64(s: CharSequence, initval: Long): Long = {
    var a = 0xdeadbeef + initval.toInt
    var b = a
    var c = a + (initval >>> 32).toInt
    val end = s.length
    var i = 0
    var mixed = true
    def next(): Int = {
      val ch = s.charAt(i); i += 1
      if (Character.isHighSurrogate(ch) && i < end) {
        val lo = s.charAt(i); i += 1
        Character.toCodePoint(ch, lo)
      } else ch.toInt
    }
    var done = false
    while (!done) {
      if (i >= end) done = true
      else {
        mixed = false
        a += next()
        if (i >= end) done = true
        else {
          b += next()
          if (i >= end) done = true
          else {
            c += next()
            if (i >= end) done = true
            else {
              // mix(a,b,c)
              a -= c; a ^= Integer.rotateLeft(c, 4);  c += b
              b -= a; b ^= Integer.rotateLeft(a, 6);  a += c
              c -= b; c ^= Integer.rotateLeft(b, 8);  b += a
              a -= c; a ^= Integer.rotateLeft(c, 16); c += b
              b -= a; b ^= Integer.rotateLeft(a, 19); a += c
              c -= b; c ^= Integer.rotateLeft(b, 4);  b += a
              mixed = true
            }
          }
        }
      }
    }
    if (!mixed) {
      // final(a,b,c)
      c ^= b; c -= Integer.rotateLeft(b, 14)
      a ^= c; a -= Integer.rotateLeft(c, 11)
      b ^= a; b -= Integer.rotateLeft(a, 25)
      c ^= b; c -= Integer.rotateLeft(b, 16)
      a ^= c; a -= Integer.rotateLeft(c, 4)
      b ^= a; b -= Integer.rotateLeft(a, 14)
      c ^= b; c -= Integer.rotateLeft(b, 24)
    }
    (c.toLong & 0xffffffffL) + (b.toLong << 32)
  }

  /** SignatureUpdateProcessorFactory.java:120-160 add() ordering: for
    * each signature field (config order, or SORTED field names when
    * unconfigured) feed the field NAME, then every VALUE. Lookup3
    * chains the 64-bit state through adds; hex is the big-endian byte
    * dump (Lookup3Signature.java:29-36). */
  def lookup3SignatureHex(parts: Seq[String]): String = {
    val h = parts.foldLeft(0L)((acc, p) => lookup3ycs64(p, acc))
    f"$h%016x"
  }

  /** MD5Signature.java:46-54: one digest over the UTF-8 concatenation of
    * the same add() stream; SignatureUpdateProcessorFactory hex-encodes
    * lowercase. As a Column: md5(concat(name, v1, v2, name2, ...)) —
    * Spark's md5() IS that digest, fully codegen'd. */
  def md5SignatureCol(parts: Seq[Column]): Column = md5(concat(parts: _*))

  // ---- DocExpirationUpdateProcessorFactory ----------------------------

  /** DocExpirationUpdateProcessorFactory.java:370-392: the `_ttl_` field
    * value is a date-math expression applied to NOW (e.g. "+5MINUTES");
    * the computed Date lands in the expiration field. The periodic
    * delete is `expireField:[* TO NOW]`. */
  def expireAt(now: Instant, ttl: String): Instant =
    graft.search.DateMath.resolve(now, "NOW" + ttl)
}
