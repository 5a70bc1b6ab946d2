package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CsvLoader
import graft.sources.CsvLoader.Params

/** Solr CSV update loader semantics — the reference TestCSVLoader
  * vectors: empty-value dropping vs keepEmpty, map rule stacking (last
  * rule first), split with per-field strategies, header/fieldnames/
  * skipLines interplay, skip/empty fieldnames, literals, rowid.
  */
class CsvLoaderSpec extends AnyFunSuite {

  private val base = "id,str_s\n100,\"quoted\"\n101,\n102,\"\"\n103,"

  private def docsOf(content: String, p: Params): Seq[Map[String, Seq[String]]] =
    CsvLoader.loadDocs(content, p).map(_._2)

  test("empty values drop unless keepEmpty; quoted values unwrap") {
    val docs = docsOf(base, Params())
    assert(docs.size === 4)
    assert(docs(0)("id") === Seq("100"))
    assert(docs(0)("str_s") === Seq("quoted"))
    assert(!docs(1).contains("str_s"))
    assert(!docs(2).contains("str_s")) // "" quoted-empty also drops
    assert(!docs(3).contains("str_s"))
    val keep = docsOf(base, Params(fKeepEmpty = Map("str_s" -> true)))
    assert(keep(1)("str_s") === Seq(""))
    assert(keep(2)("str_s") === Seq(""))
    assert(keep(3)("str_s") === Seq(""))
  }

  test("map rules: value rewrite, to-empty drops, stacked rules last-first") {
    val m1 = docsOf(base, Params(map = Seq("quoted" -> "QUOTED")))
    assert(m1(0)("str_s") === Seq("QUOTED"))
    assert(!m1(1).contains("str_s"))
    // map quoted-> empty: the mapped value then drops at add
    val m2 = docsOf(base, Params(map = Seq("quoted" -> "")))
    assert(!m2(0).contains("str_s"))
    // map empty->EMPTY resurrects blanks
    val m3 = docsOf(base, Params(map = Seq("" -> "EMPTY")))
    assert(m3(0)("str_s") === Seq("quoted"))
    assert(m3(1)("str_s") === Seq("EMPTY"))
    assert(m3(2)("str_s") === Seq("EMPTY"))
    assert(m3(3)("str_s") === Seq("EMPTY"))
    // stacked: LAST declared rule applies first and feeds earlier rules
    val m4 = docsOf(base, Params(map = Seq("" -> "EMPTY", "quoted" -> "QUOTED")))
    assert(m4(0)("str_s") === Seq("QUOTED"))
    assert(m4(1)("str_s") === Seq("EMPTY"))
  }

  test("fieldnames + header=true skips the header; empty name and skip drop columns") {
    val fn = docsOf(base, Params(fieldnames = Some(Seq("id", "my_s")),
      header = Some(true), fMap = Map("my_s" -> Seq("" -> "EMPTY"))))
    assert(fn(0)("my_s") === Seq("quoted"))
    assert(fn(1)("my_s") === Seq("EMPTY"))
    assert(!fn.exists(_.contains("str_s")))
    assert(!fn.exists(_("id") == Seq("id"))) // header row consumed

    val sk = docsOf(base, Params(keepEmpty = true, skip = Set("str_s")))
    assert(sk.forall(!_.contains("str_s")))
    val en = docsOf(base, Params(keepEmpty = true,
      fieldnames = Some(Seq("id", "")), header = Some(true)))
    assert(en.forall(d => d.keySet === Set("id")))
  }

  test("header=false keeps the header row as a document; skipLines drops raw lines") {
    val hf = docsOf(base, Params(fieldnames = Some(Seq("id", "my_s")),
      header = Some(false)))
    assert(hf.size === 5)
    assert(hf(0)("id") === Seq("id")) // the header line became a doc
    assert(hf(1)("my_s") === Seq("quoted"))
    val sl = docsOf(base, Params(fieldnames = Some(Seq("id", "my_s")),
      header = Some(false), skipLines = 1))
    assert(sl.size === 4)
    assert(sl(0)("id") === Seq("100"))
  }

  test("split re-parses values with the field strategy; map applies per piece") {
    val f = "id,str_s\n100,\"quoted\"\n101,\"a,b,c\"\n102,\"a,,b\"\n103,\n"
    val docs = docsOf(f, Params(fMap = Map("str_s" -> Seq("" -> "EMPTY")),
      fSplit = Map("str_s" -> true)))
    assert(docs(0)("str_s") === Seq("quoted"))
    assert(docs(1)("str_s") === Seq("a", "b", "c"))
    assert(docs(2)("str_s") === Seq("a", "EMPTY", "b"))
    assert(docs(3)("str_s") === Seq("EMPTY"))
  }

  test("custom separator/encapsulator incl. per-field split strategy; no default backslash escaping") {
    val f = "id|str_s\n100|^quoted^\n101|a;'b';c\n102|a;;b\n103|\n104|a\\\\b\n"
    val docs = docsOf(f, Params(separator = '|', encapsulator = Some('^'),
      fMap = Map("str_s" -> Seq("" -> "EMPTY")),
      fSplit = Map("str_s" -> true),
      fSeparator = Map("str_s" -> ';'),
      fEncapsulator = Map("str_s" -> '\'')))
    assert(docs(0)("str_s") === Seq("quoted"))
    assert(docs(1)("str_s") === Seq("a", "b", "c"))
    assert(docs(2)("str_s") === Seq("a", "EMPTY", "b"))
    assert(docs(3)("str_s") === Seq("EMPTY"))
    assert(docs(4)("str_s") === Seq("a\\\\b"))
  }

  test("literals attach to every doc; rowid numbers physical lines") {
    val docs = CsvLoader.loadDocs("id\n100\n101\n102",
      Params(literals = Seq("name" -> "LITERAL_VALUE"),
        rowId = Some("rowid_i")))
    assert(docs.map(_._2("rowid_i").head) === Seq("1", "2", "3"))
    assert(docs.forall(_._2("name") === Seq("LITERAL_VALUE")))
    val off = CsvLoader.loadDocs("id\n200\n201\n202",
      Params(rowId = Some("rowid_i"), rowIdOffset = 100))
    assert(off.map(_._2("rowid_i").head) === Seq("101", "102", "103"))
  }

  test("quoted field spans lines; doubled encapsulator is literal") {
    val f = "id,t\n1,\"line1\nline2\"\n2,\"say \"\"hi\"\"\"\n"
    val docs = docsOf(f, Params())
    assert(docs(0)("t") === Seq("line1\nline2"))
    assert(docs(1)("t") === Seq("say \"hi\""))
    // rowid of record after the multi-line field accounts for both lines
    val withRow = CsvLoader.loadDocs(f, Params(rowId = Some("r")))
    assert(withRow(1)._2("r") === Seq("3"))
  }

  test("escape without encapsulator disables encapsulation") {
    val f = "id,t\n1,a\\,b\n2,\"x\"\n"
    val docs = docsOf(f, Params(escape = Some('\\'), encapsulator = None))
    assert(docs(0)("t") === Seq("a,b"))
    assert(docs(1)("t") === Seq("\"x\"")) // quotes now literal
  }

  // ---- response writer (CSVResponseWriter / CSVPrinter) ----

  import graft.sources.CsvResponse
  import graft.sources.CsvResponse.WParams

  test("writer quote decisions: first-empty, special first char, trailing space, doubling") {
    val docs = Seq(
      Map("a" -> Seq(""), "b" -> Seq("plain"), "c" -> Seq("x ")),
      Map("a" -> Seq("#lead"), "b" -> Seq("has,comma"), "c" -> Seq("say \"hi\"")))
    val out = CsvResponse.write(docs, WParams(fields = Seq("a", "b", "c")))
    val lines = out.split("\n")
    assert(lines(0) === "a,b,c")
    // empty FIRST cell quotes; empty elsewhere would not
    assert(lines(1) === "\"\",plain,\"x \"")
    // '#' <= '#' quotes; comma quotes; embedded quotes double
    assert(lines(2) === "\"#lead\",\"has,comma\",\"say \"\"hi\"\"\"")
  }

  test("writer nulls, multi-valued mv-escape encoding, round-trip through the loader") {
    val docs = Seq(
      Map("id" -> Seq("1"), "tags" -> Seq("x", "y,z", "w")),
      Map("id" -> Seq("2")))
    val out = CsvResponse.write(docs, WParams(fields = Seq("id", "tags"),
      nullValue = "NA", multiValued = Set("tags")))
    val lines = out.split("\n")
    // mv joins with the main separator, backslash-escaping embedded
    // separators; the joined string then quotes as ONE main cell
    assert(lines(1) === "1,\"x,y\\,z,w\"")
    assert(lines(2) === "2,NA")
    // round-trip: load with split=true + backslash escape recovers values
    val back = CsvLoader.loadDocs(out, CsvLoader.Params(
      fSplit = Map("tags" -> true), fEscape = Map("tags" -> '\\')))
    assert(back(0)._2("tags") === Seq("x", "y,z", "w"))
    assert(back(1)._2("id") === Seq("2"))
  }

  test("writer escape mode (escape without encapsulator) maps CR/LF and delimiter") {
    val docs = Seq(Map("t" -> Seq("a,b\nc")))
    val out = CsvResponse.write(docs, WParams(fields = Seq("t"),
      encapsulator = None, escape = Some('\\'), header = false))
    assert(out === "a\\,b\\nc\n")
  }

  test("writer custom mv separator and mv encapsulator") {
    val docs = Seq(Map("t" -> Seq("a", "b|c")))
    val out = CsvResponse.write(docs, WParams(fields = Seq("t"),
      header = false, multiValued = Set("t"),
      mvSeparator = Some('|'), mvEncapsulator = Some('\'')))
    // mv cell: a|'b|c' — then main printer quotes nothing (no comma)
    assert(out === "a|'b|c'\n")
  }

  // ---- parity fixes from review: parser strictness + escape decode ----

  test("escape decodes r/n/t like the reference readEscape, also inside quotes") {
    val docs = docsOf("id,t\n1,a\\nb\n", Params(escape = Some('\\'),
      encapsulator = None))
    assert(docs(0)("t") === Seq("a\nb"))
    // inside quotes with both escape and encapsulator configured
    val q = docsOf("id,t\n1,\"a\\\"b\"\n", Params(escape = Some('\\')))
    assert(q(0)("t") === Seq("a\"b"))
    // writer escape-mode output round-trips through the loader
    val out = CsvResponse.write(Seq(Map("t" -> Seq("x,y\nz"))),
      WParams(fields = Seq("t"), encapsulator = None, escape = Some('\\'),
        header = false))
    val back = docsOf("t\n" + out, Params(escape = Some('\\'),
      encapsulator = None))
    assert(back(0)("t") === Seq("x,y\nz"))
  }

  test("whitespace allowed after a closing quote; garbage and EOF-in-quote error") {
    assert(docsOf("id,t\n1,\"ab\" \n", Params())(0)("t") === Seq("ab"))
    intercept[Exception] { docsOf("id,t\n1,\"ab\"cd\n", Params()) }
    intercept[Exception] { docsOf("id,t\n1,\"unterminated", Params()) }
  }

  test("value-count mismatch is an input error, not a partial document") {
    intercept[Exception] { docsOf("id,str\n100,a,EXTRA\n", Params()) }
    intercept[Exception] { docsOf("id,str\n101\n", Params()) }
  }

  test("lone-CR line endings: empty lines skip, skipLines strips one raw line") {
    val docs = CsvLoader.loadDocs("id\r\r100\r101\r", Params())
    assert(docs.map(_._2("id").head) === Seq("100", "101"))
    val sk = CsvLoader.loadDocs("junk\rid\r100\r",
      Params(skipLines = 1))
    assert(sk.map(_._2("id").head) === Seq("100"))
  }

  test("writer quotes a non-ASCII first char on a new line (ASCII-only alnum rule)") {
    val out = CsvResponse.write(Seq(Map("t" -> Seq("émile"))),
      WParams(fields = Seq("t"), header = false))
    assert(out === "\"émile\"\n")
    // not first on the line: no quote
    val out2 = CsvResponse.write(Seq(Map("a" -> Seq("x"), "t" -> Seq("émile"))),
      WParams(fields = Seq("a", "t"), header = false))
    assert(out2 === "x,émile\n")
  }
}
