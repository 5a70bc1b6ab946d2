package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.XmlRecordReader

/** XPathRecordReader semantics at reference golden parity — every vector
  * from the reference's TestXPathRecordReader.java (solr/contrib/
  * dataimporthandler): record framing, commonField persistence, putNulls
  * index alignment, attribute predicates, '//' descendants, FLATTEN,
  * mixed content, namespace-local names, error propagation.
  */
class XmlRecordReaderSpec extends AnyFunSuite {

  private def strList(v: AnyRef): List[String] =
    v.asInstanceOf[List[String]]

  test("basic: multi-valued child counts per record") {
    val xml = "<root>\n   <b><c>Hello C1</c>\n      <c>Hello C1</c>\n      </b>\n   <b><c>Hello C2</c>\n     </b>\n</root>"
    val rr = new XmlRecordReader("/root/b").addField("c", "/root/b/c", true)
    val l = rr.getAllRecords(xml)
    assert(l.size === 2)
    assert(strList(l(0)("c")).size === 2)
    assert(strList(l(1)("c")).size === 1)
  }

  test("attributes on the record element") {
    val xml = "<root>\n   <b a=\"x0\" b=\"y0\" />\n   <b a=\"x1\" b=\"y1\" />\n   <b a=\"x2\" b=\"y2\" />\n</root>"
    val rr = new XmlRecordReader("/root/b")
      .addField("a", "/root/b/@a", false)
      .addField("b", "/root/b/@b", false)
    val l = rr.getAllRecords(xml)
    assert(l.size === 3)
    assert(l(0)("a") === "x0" && l(1)("a") === "x1" && l(2)("a") === "x2")
    assert(l(0)("b") === "y0" && l(1)("b") === "y1" && l(2)("b") === "y2")
  }

  test("attributes at several levels (merchantProduct)") {
    val xml = "<r>\n<merchantProduct id=\"814636051\" mid=\"189973\">\n  <in_stock type=\"stock-4\" />\n  <condition type=\"cond-0\" />\n  <price>301.46</price>\n</merchantProduct>\n<merchantProduct id=\"814636052\" mid=\"189974\">\n  <in_stock type=\"stock-5\" />\n  <condition type=\"cond-1\" />\n  <price>302.46</price>\n</merchantProduct>\n</r>"
    val rr = new XmlRecordReader("/r/merchantProduct")
      .addField("id", "/r/merchantProduct/@id", false)
      .addField("mid", "/r/merchantProduct/@mid", false)
      .addField("price", "/r/merchantProduct/price", false)
      .addField("conditionType", "/r/merchantProduct/condition/@type", false)
    val l = rr.getAllRecords(xml)
    assert(l(0)("id") === "814636051" && l(0)("mid") === "189973")
    assert(l(0)("price") === "301.46" && l(0)("conditionType") === "cond-0")
    assert(l(1)("id") === "814636052" && l(1)("mid") === "189974")
    assert(l(1)("price") === "302.46" && l(1)("conditionType") === "cond-1")
  }

  test("missing attribute values put NULL entries inside a record") {
    val xml = "<root>\n<a>\n  <b a=\"x0\" b=\"y0\" />\n       <b a=\"x1\" b=\"y1\" />\n       </a><a>\n  <b a=\"x3\"  />\n       <b b=\"y4\" />\n       </a></root>"
    val rr = new XmlRecordReader("/root/a")
      .addField("a", "/root/a/b/@a", true)
      .addField("b", "/root/a/b/@b", true)
    val l = rr.getAllRecords(xml)
    assert(l.size === 2)
    assert(strList(l(1)("a"))(1) === null)
    assert(strList(l(1)("b"))(0) === null)
  }

  test("missing elements put NULL entries (putNulls)") {
    val xml = "<root>\n\t<a>\n\t   <b>\n\t  <x>x0</x>\n\t            <y>y0</y>\n\t            </b>\n\t   <b>\n\t  <x>x1</x>\n\t            <y>y1</y>\n\t            </b>\n\t   </a>\n\t<a>\n\t   <b>\n\t  <x>x3</x>\n\t   </b>\n\t   <b>\n\t  <y>y4</y>\n\t   </b>\n\t   </a>\n</root>"
    val rr = new XmlRecordReader("/root/a")
      .addField("a", "/root/a/b/x", true)
      .addField("b", "/root/a/b/y", true)
    val l = rr.getAllRecords(xml)
    assert(l.size === 2)
    assert(strList(l(1)("a"))(1) === null)
    assert(strList(l(1)("b"))(0) === null)
  }

  test("empty elements store empty strings, not nulls") {
    val xml = "<root>\n\t<a>\n\t   <b>\n\t  <x>x0</x>\n\t            <y>y0</y>\n\t   </b>\n\t   <b>\n\t  <x></x>\n\t            <y>y1</y>\n\t   </b>\n\t</a>\n</root>"
    val rr = new XmlRecordReader("/root/a")
      .addField("a", "/root/a/b/x", true)
      .addField("b", "/root/a/b/y", true)
    val l = rr.getAllRecords(xml)
    assert(l.size === 1)
    assert(strList(l(0)("a")) === List("x0", ""))
    assert(strList(l(0)("b")) === List("y0", "y1"))
  }

  test("mixed content: direct text only, children excluded") {
    val xml = "<xhtml:p xmlns:xhtml=\"http://xhtml.com/\" >This text is \n  <xhtml:b>bold</xhtml:b> and this text is \n  <xhtml:u>underlined</xhtml:u>!\n</xhtml:p>"
    val rr = new XmlRecordReader("/p")
      .addField("p", "/p", true)
      .addField("b", "/p/b", true)
      .addField("u", "/p/u", true)
    val row = rr.getAllRecords(xml).head
    assert(strList(row("b"))(0) === "bold")
    assert(strList(row("u"))(0) === "underlined")
    val p = strList(row("p"))(0)
    assert(p.contains("This text is") && p.contains("and this text is") &&
      p.contains("!") && !p.contains("bold"))
  }

  test("FLATTEN recursively collects child text") {
    val xml = "<xhtml:p xmlns:xhtml=\"http://xhtml.com/\" >This text is \n  <xhtml:b>bold</xhtml:b> and this text is \n  <xhtml:u>underlined</xhtml:u>!\n</xhtml:p>"
    val rr = new XmlRecordReader("/p")
      .addField("p", "/p", false, flatten = true)
    val row = rr.getAllRecords(xml).head
    assert(row("p").asInstanceOf[String].trim ===
      "This text is \n  bold and this text is \n  underlined!")
  }

  test("attribute-presence predicate [@k]") {
    val xml = "<root>\n\t<a>\n\t   <b k=\"x\">\n\t <x>x0</x>\n\t <y></y>\n\t </b>\n\t <b k=\"y\">\n\t <x></x>\n\t <y>y1</y>\n\t </b>\n\t <b k=\"z\">\n\t <x>x2</x>\n\t <y>y2</y>\n\t </b>\n\t</a>\n\t<a>\n\t   <b>\n\t <x>x3</x>\n\t </b>\n\t <b>\n\t <y>y4</y>\n\t </b>\n\t</a>\n</root>"
    val rr = new XmlRecordReader("/root/a")
      .addField("x", "/root/a/b[@k]/x", true)
      .addField("y", "/root/a/b[@k]/y", true)
    val l = rr.getAllRecords(xml)
    assert(l.size === 2)
    assert(strList(l(0)("x")) === List("x0", "", "x2"))
    assert(strList(l(0)("y")) === List("", "y1", "y2"))
    assert(l(1).isEmpty)
  }

  test("multiple predicates [@k][@m='n']") {
    val xml = "<root>\n\t<a>\n\t <b k=\"x\" m=\"n\" >\n\t <x>x0</x>\n\t <y>y0</y>\n\t </b>\n\t <b k=\"y\" m=\"p\">\n\t <x>x1</x>\n\t <y>y1</y>\n\t </b>\n\t</a>\n\t<a>\n\t <b k=\"x\">\n\t <x>x3</x>\n\t </b>\n\t <b m=\"n\">\n\t <y>y4</y>\n\t </b>\n\t</a>\n</root>"
    val rr = new XmlRecordReader("/root/a")
      .addField("x", "/root/a/b[@k][@m='n']/x", true)
      .addField("y", "/root/a/b[@k][@m='n']/y", true)
    val l = rr.getAllRecords(xml)
    assert(l.size === 2)
    assert(strList(l(0)("x")).size === 1)
    assert(strList(l(0)("y")).size === 1)
    assert(l(1).isEmpty)
  }

  test("attribute-value predicate [@k='x']") {
    val xml = "<root>\n\t<a>\n   <b k=\"x\">\n\t <x>x0</x>\n\t <y>y0</y>\n\t </b>\n\t <b k=\"y\">\n\t <x>x1</x>\n\t <y>y1</y>\n\t </b>\n\t</a>\n\t<a>\n   <b><x>x3</x></b>\n\t<b><y>y4</y></b>\n\t</a>\n</root>"
    val rr = new XmlRecordReader("/root/a")
      .addField("x", "/root/a/b[@k='x']/x", true)
      .addField("y", "/root/a/b[@k='x']/y", true)
    val l = rr.getAllRecords(xml)
    assert(l.size === 2)
    assert(strList(l(0)("x")).size === 1)
    assert(strList(l(0)("y")).size === 1)
    assert(l(1).isEmpty)
  }

  test("attribute value containing a slash") {
    val xml = "<root><b>\n  <a x=\"a/b\" h=\"hello-A\"/>  \n</b></root>"
    val rr = new XmlRecordReader("/root/b")
      .addField("x", "/root/b/a[@x='a/b']/@h", false)
    val l = rr.getAllRecords(xml)
    assert(l.size === 1)
    assert(l(0)("x") === "hello-A")
  }

  test("unsupported xpaths throw") {
    intercept[RuntimeException] { new XmlRecordReader("//b") }
    val rr = new XmlRecordReader("/root/b")
    intercept[RuntimeException] { rr.addField("bold", "b", false) }
  }

  test("// descendants from root, scoped to the forEach frame") {
    val xml = "<anyd>\n  this <boo>top level</boo> is ignored because it is external to the forEach\n  <status>as is <boo>this element</boo></status>\n  <contenido id=\"10097\" idioma=\"cat\">\n    This one is <boo>not ignored as it's</boo> inside a forEach\n    <antetitulo><i> big <boo>antler</boo></i></antetitulo>\n    <titulo>  My <i>flattened <boo>title</boo></i> </titulo>\n    <resumen> My summary <i>skip this!</i>  </resumen>\n    <texto>   <boo>Within the body of</boo>My text</texto>\n    <p>Access <boo>inner <i>sub clauses</i> as well</boo></p>\n    </contenido>\n</anyd>"
    val rr = new XmlRecordReader("/anyd/contenido")
      .addField("descdend", "//boo", true)
      .addField("inr_descd", "//boo/i", false)
      .addField("cont", "/anyd/contenido", false)
      .addField("id", "/anyd/contenido/@id", false)
      .addField("status", "/anyd/status", false)
      .addField("title", "/anyd/contenido/titulo", false, flatten = true)
      .addField("resume", "/anyd/contenido/resumen", false)
      .addField("text", "/anyd/contenido/texto", false)
    val l = rr.getAllRecords(xml)
    assert(l.size === 1)
    val m = l.head
    assert(m("cont").toString.trim === "This one is  inside a forEach")
    assert(m("id") === "10097")
    assert(m("title").toString.trim === "My flattened title")
    assert(m("resume").toString.trim === "My summary")
    assert(m("text").toString.trim === "My text")
    val d = strList(m("descdend"))
    assert(d(0) === "not ignored as it's")
    assert(d(1) === "antler")
    assert(d(2) === "Within the body of")
    assert(d(3) === "inner  as well")
    assert(m("inr_descd").toString.trim === "sub clauses")
  }

  test("// descendants when the record is the whole document") {
    val xml = "<anycd>\n  this <boo>top level</boo> is ignored because it is external to the forEach\n  <status>as is <boo>this element</boo></status>\n  <contenido id=\"10097\" idioma=\"cat\">\n    This one is <boo>not ignored as it's</boo> inside a forEach\n    <antetitulo><i> big <boo>antler</boo></i></antetitulo>\n    <titulo>  My <i>flattened <boo>title</boo></i> </titulo>\n    <resumen> My summary <i>skip this!</i>  </resumen>\n    <texto>   <boo>Within the body of</boo>My text</texto>\n    <p>Access <boo>inner <i>sub clauses</i> as well</boo></p>\n    </contenido>\n</anycd>"
    val rr = new XmlRecordReader("/anycd").addField("descdend", "//boo", true)
    val l = rr.getAllRecords(xml)
    assert(l.size === 1)
    val d = strList(l.head("descdend"))
    assert(d === List("top level", "this element", "not ignored as it's",
      "antler", "title", "Within the body of", "inner  as well"))
  }

  test("/anycd/contenido//boo collects only descendants below the anchor") {
    val xml = "<anycd>\n  this <boo>top level</boo> is ignored\n  <status>as is <boo>this element</boo></status>\n  <contenido id=\"1\">\n    This one is <boo>not ignored as it's</boo> inside\n    <antetitulo><i> big <boo>antler</boo></i></antetitulo>\n    <titulo>  My <i>flattened <boo>title</boo></i> </titulo>\n    <texto>   <boo>Within the body of</boo>My text</texto>\n    <p>Access <boo>inner <i>sub clauses</i> as well</boo></p>\n    </contenido>\n</anycd>"
    val rr = new XmlRecordReader("/anycd")
      .addField("descdend", "/anycd/contenido//boo", true)
    val l = rr.getAllRecords(xml)
    assert(l.size === 1)
    assert(strList(l.head("descdend")) === List("not ignored as it's",
      "antler", "title", "Within the body of", "inner  as well"))
  }

  test("single record with attributes and trimmed element text") {
    val xml = "<root>\n       <contenido id=\"10097\" idioma=\"cat\">\n    <antetitulo></antetitulo>\n    <titulo>    This is my title             </titulo>\n    <resumen>   This is my summary           </resumen>\n    <texto>     This is the body of my text  </texto>\n    </contenido>\n</root>"
    val rr = new XmlRecordReader("/root/contenido")
      .addField("id", "/root/contenido/@id", false)
      .addField("title", "/root/contenido/titulo", false)
      .addField("resume", "/root/contenido/resumen", false)
      .addField("text", "/root/contenido/texto", false)
    val l = rr.getAllRecords(xml)
    assert(l.size === 1)
    val m = l.head
    assert(m("id") === "10097")
    assert(m("title").toString.trim === "This is my title")
    assert(m("resume").toString.trim === "This is my summary")
    assert(m("text").toString.trim === "This is the body of my text")
  }

  test("forEach path equals a field path") {
    val xml = "<root>\n   <cat>\n     <name>hello</name>\n   </cat>\n   <item name=\"item name\"/>\n</root>"
    val rr = new XmlRecordReader("/root/cat/name")
      .addField("catName", "/root/cat/name", false)
    assert(rr.getAllRecords(xml).head("catName") === "hello")
  }

  test("putNulls keeps parallel multi-valued lists aligned") {
    val xml = "<root>\n  <i>\n    <x>\n      <a>A.1.1</a>\n      <b>B.1.1</b>\n    </x>\n    <x>\n      <b>B.1.2</b>\n      <c>C.1.2</c>\n    </x>\n  </i>\n  <i>\n    <x>\n      <a>A.2.1</a>\n      <c>C.2.1</c>\n    </x>\n    <x>\n      <b>B.2.2</b>\n      <c>C.2.2</c>\n    </x>\n  </i>\n</root>"
    val rr = new XmlRecordReader("/root/i")
      .addField("a", "/root/i/x/a", true)
      .addField("b", "/root/i/x/b", true)
      .addField("c", "/root/i/x/c", true)
    val l = rr.getAllRecords(xml)
    val (a0, b0, c0) = (strList(l(0)("a")), strList(l(0)("b")), strList(l(0)("c")))
    assert(a0 === List("A.1.1", null) && b0 === List("B.1.1", "B.1.2") &&
      c0 === List(null, "C.1.2"))
    val (a1, b1, c1) = (strList(l(1)("a")), strList(l(1)("b")), strList(l(1)("c")))
    assert(a1 === List("A.2.1", null) && b1 === List(null, "B.2.2") &&
      c1 === List("C.2.1", "C.2.2"))
  }

  test("trailing slash in a field xpath reads as the same path") {
    val xml = "<root><b><c>v</c></b></root>"
    val rr = new XmlRecordReader("/root/b").addField("c", "/root/b/c/", true)
    assert(strList(rr.getAllRecords(xml).head("c")) === List("v"))
  }

  test("malformed XML raises") {
    val bad = "<root>\n    <node>\n        <id/>3</id>\n        <desc>test3</desc>\n    </node>\n</root>"
    val rr = new XmlRecordReader("/root/node")
      .addField("id", "/root/node/id", true)
      .addField("desc", "/root/node/desc", true)
    intercept[Exception] { rr.getAllRecords(bad) }
  }

  test("root-most '//' spec wins a shared local name in skipped subtrees") {
    // /root/a//x and //x both watch local name x; inside an UNKNOWN
    // subtree under /root/a the reference's put-walk lets the root-most
    // entry overwrite, so the text lands in f2, not f1
    val xml = "<root><a><unknown><x>deep</x></unknown></a></root>"
    val rr = new XmlRecordReader("/root/a")
      .addField("f1", "/root/a//x", true)
      .addField("f2", "//x", true)
    val rec = rr.getAllRecords(xml).head
    assert(!rec.contains("f1"))
    assert(strList(rec("f2")) === List("deep"))
  }

  test("multiple forEach roots emit records tagged by their path") {
    val xml = "<root>\n<a>\n   <b a=\"x0\" b=\"y0\" />\n        <b a=\"x1\" b=\"y1\" />\n        </a><x>\n   <b a=\"x4\" b=\"y4\" />\n        </x></root>"
    val rr = new XmlRecordReader("/root/a | /root/x")
      .addField("a", "/root/a/b/@a", true)
      .addField("b", "/root/a/b/@b", true)
      .addField("a", "/root/x/b/@a", true)
      .addField("b", "/root/x/b/@b", true)
    var aCnt = 0; var xCnt = 0
    rr.streamRecords(xml, (rec, xpath) => {
      if (rec != null) {
        if (xpath == "/root/a") aCnt += 1
        if (xpath == "/root/x") xCnt += 1
      }
    })
    assert(aCnt === 1 && xCnt === 1)
  }
}
