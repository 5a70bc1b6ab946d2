package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import graft.operators.DataImport
import graft.operators.DataImport.{Field, DihRow}

/** DataImportHandler transformer semantics (reference solr/contrib/
  * dataimporthandler Test{Regex,DateFormat,Template,NumberFormat}
  * Transformer vectors plus the LineEntityProcessor accept/skip rules).
  */
class DataImportSpec extends AnyFunSuite {

  private def row(kv: (String, Any)*): DihRow =
    mutable.LinkedHashMap(kv: _*)

  // ---- RegexTransformer (TestRegexTransformer vectors) ----

  test("splitBy: comma-separated becomes a 4-element list") {
    val fields = Seq(Field("col1", srcColName = Some("a"), splitBy = Some(",")))
    val r = DataImport.regexTransform(row("a" -> "a,bb,cc,d"), fields)
    assert(r.size === 2)
    assert(r("col1").asInstanceOf[List[_]].size === 4)
  }

  test("groupNames fan groups into named columns; empty slots skipped") {
    val fields = Seq(Field("fullName", regex = Some("(\\w*) (\\w*) (\\w*)"),
      groupNames = Some(",firstName,lastName")))
    val r = DataImport.regexTransform(row("fullName" -> "Mr Noble Paul"), fields)
    assert(r("firstName") === "Noble")
    assert(r("lastName") === "Paul")

    val r2 = DataImport.regexTransform(
      row("fullName" -> List("Mr Noble Paul", "Mr Shalin Mangar")), fields)
    assert(r2("firstName") === List("Noble", "Shalin"))
    assert(r2("lastName") === List("Paul", "Mangar"))
  }

  test("replaceWith: match replaces all, no-match returns original") {
    val f1 = Seq(Field("name", regex = Some("'"), replaceWith = Some("''")))
    assert(DataImport.regexTransform(row("name" -> "D'souza"), f1)("name") === "D''souza")

    val f2 = Seq(Field("title_underscore", srcColName = Some("title"),
      regex = Some("\\s+"), replaceWith = Some("_")))
    assert(DataImport.regexTransform(row("title" -> "value with spaces"), f2)
      ("title_underscore") === "value_with_spaces")
    assert(DataImport.regexTransform(row("title" -> "valueWithoutSpaces"), f2)
      ("title_underscore") === "valueWithoutSpaces")
  }

  test("mileage chain: variable reuse, failed matches leave row untouched") {
    val s = "Fuel Economy Range: 26 mpg Hwy, 19 mpg City"
    val fields = Seq(
      Field("city_mileage", srcColName = Some("rowdata"), regex = Some(
        "Fuel Economy Range:\\s*?\\d*?\\s*?mpg Hwy,\\s*?(\\d*?)\\s*?mpg City")),
      Field("highway_mileage", srcColName = Some("rowdata"), regex = Some(
        "Fuel Economy Range:\\s*?(\\d*?)\\s*?mpg Hwy,\\s*?\\d*?\\s*?mpg City")),
      // reuses the result of the earlier field through ${e.city_mileage}
      Field("hltCityMPG", srcColName = Some("rowdata"),
        regex = Some(".*(${e.city_mileage})"),
        replaceWith = Some("*** $1 ***")),
      // no match, no replaceWith -> row untouched for t1
      Field("t1", srcColName = Some("rowdata"), regex = Some("duff")),
      // no match WITH replaceWith -> original value
      Field("t2", srcColName = Some("rowdata"), regex = Some("duff"),
        replaceWith = Some("60")),
      // replaceWith wins over groupNames
      Field("t3", srcColName = Some("rowdata"), regex = Some("(Range)"),
        replaceWith = Some("range"), groupNames = Some("t4,t5")))
    val r = DataImport.regexTransform(row("rowdata" -> s), fields)
    assert(r.size === 6) // rowdata + 5 produced (t1 absent)
    assert(!r.contains("t1"))
    assert(r("t2") === s)
    assert(r("rowdata") === s)
    assert(r("highway_mileage") === "26")
    assert(r("city_mileage") === "19")
    assert(r("hltCityMPG") === "*** 19 *** mpg City")
    assert(r("t3") === "Fuel Economy range: 26 mpg Hwy, 19 mpg City")
  }

  test("single-group regex over a list keeps all values") {
    val fields = Seq(Field("participant", srcColName = Some("person"),
      regex = Some("(.*)")))
    val r = DataImport.regexTransform(row("person" -> List("hello", "world")), fields)
    assert(r("participant") === List("hello", "world"))
  }

  // ---- DateFormatTransformer ----

  test("date parse: trimmed value, blank -> null, list element-wise") {
    val fields = Seq(Field("d", srcColName = Some("raw"),
      dateTimeFormat = Some("yyyy-MM-dd HH:mm")))
    val r = DataImport.dateFormatTransform(
      row("raw" -> "  2024-03-05 10:30 "), fields)
    assert(r("d").asInstanceOf[java.sql.Timestamp].getTime ===
      java.time.Instant.parse("2024-03-05T10:30:00Z").toEpochMilli)
    val r2 = DataImport.dateFormatTransform(row("raw" -> "   "), fields)
    assert(r2("d") === null)
    val r3 = DataImport.dateFormatTransform(
      row("raw" -> List("2024-03-05 10:30", "2023-01-01 00:00")), fields)
    assert(r3("d").asInstanceOf[List[_]].size === 2)
    // unparseable -> row untouched
    val r4 = DataImport.dateFormatTransform(row("raw" -> "garbage"), fields)
    assert(!r4.contains("d"))
  }

  // ---- TemplateTransformer ----

  test("template: literal + vars, raw copy for pure var, unresolvable skips") {
    val fields = Seq(Field("out", template = Some("${e.a}-${e.b}")))
    val r = DataImport.templateTransform(row("a" -> "x", "b" -> "y"), fields)
    assert(r("out") === "x-y")
    // pure single variable copies the RAW (non-string) value
    val f2 = Seq(Field("copy", template = Some("${e.num}")))
    val r2 = DataImport.templateTransform(row("num" -> 42L), f2)
    assert(r2("copy") === 42L)
    // one unresolvable variable -> field skipped entirely
    val r3 = DataImport.templateTransform(row("a" -> "x"), fields)
    assert(!r3.contains("out"))
  }

  // ---- NumberFormatTransformer ----

  test("number styles parse strictly (whole string must consume)") {
    val fInt = Seq(Field("n", srcColName = Some("raw"),
      formatStyle = Some("integer")))
    assert(DataImport.numberFormatTransform(row("raw" -> "1,234"), fInt)("n")
      .asInstanceOf[Number].longValue === 1234L)
    intercept[Exception] {
      DataImport.numberFormatTransform(row("raw" -> "12x"), fInt)
    }
    val fNum = Seq(Field("n", srcColName = Some("raw"),
      formatStyle = Some("number")))
    assert(DataImport.numberFormatTransform(row("raw" -> "1,234.56"), fNum)("n")
      .asInstanceOf[Number].doubleValue === 1234.56)
    // blank skipped
    val rb = DataImport.numberFormatTransform(row("raw" -> " "), fNum)
    assert(!rb.contains("n"))
    // percent divides by 100
    val fPct = Seq(Field("n", srcColName = Some("raw"),
      formatStyle = Some("percent")))
    assert(DataImport.numberFormatTransform(row("raw" -> "12%"), fPct)("n")
      .asInstanceOf[Number].doubleValue === 0.12)
  }

  // ---- chain order + LineEntityProcessor ----

  test("chain: regex extracts, then date/number parse, then template") {
    val fields = Seq(
      Field("line", regex = Some("(\\S+)\\|(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2})\\|(\\S+)"),
        groupNames = Some("id,when,amount")),
      Field("when_ts", srcColName = Some("when"),
        dateTimeFormat = Some("yyyy-MM-dd HH:mm")),
      Field("amount_n", srcColName = Some("amount"),
        formatStyle = Some("number")),
      Field("label", template = Some("${e.id}@${e.when}")))
    val r = DataImport.applyChain(
      row("line" -> "ord7|2024-03-05 10:30|1,234.5"),
      fields, Seq("RegexTransformer", "DateFormatTransformer",
        "NumberFormatTransformer", "TemplateTransformer"))
    assert(r("id") === "ord7")
    assert(r("amount_n").asInstanceOf[Number].doubleValue === 1234.5)
    assert(r("label") === "ord7@2024-03-05 10:30")
    assert(r("when_ts").isInstanceOf[java.sql.Timestamp])
  }

  test("LineEntityProcessor accept/skip use find semantics") {
    assert(DataImport.lineAccepted("keep this row", Some("keep"), Some("drop")))
    assert(!DataImport.lineAccepted("drop keep", Some("keep"), Some("drop")))
    assert(!DataImport.lineAccepted("nothing here", Some("keep"), None))
    assert(DataImport.lineAccepted("anything", None, None))
  }

  test("HTMLStrip + Clob transformers") {
    val fields = Seq(
      Field("t", stripHTML = true),
      Field("s", srcColName = Some("blob"), clob = true))
    var r = DataImport.htmlStripTransform(
      row("t" -> "a <b>bold</b> move"), fields)
    r = DataImport.clobTransform(
      r ++= Seq("blob" -> "hello bytes".getBytes("UTF-8")), fields)
    assert(r("t").toString.replaceAll("\\s+", " ").trim === "a bold move")
    assert(r("s") === "hello bytes")
  }
}
