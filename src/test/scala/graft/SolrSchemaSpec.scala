package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SolrSchema
import graft.sources.SolrSchema._

/** Solr schema.xml dynamicField/copyField binding semantics (reference
  * solr/core/src/java/org/apache/solr/schema/IndexSchema.java:999-1160 +
  * schema/CopyField.java): longest-pattern-wins dynamic resolution,
  * glob remainder substitution into dynamic copy destinations, maxChars
  * truncation, and the reference's registration error cases. */
class SolrSchemaSpec extends AnyFunSuite {

  private val xml =
    """<schema name="test" version="1.5">
      |  <types>
      |    <fieldType name="string" class="solr.StrField"/>
      |    <fieldType name="text_general" class="solr.TextField">
      |      <analyzer><tokenizer class="solr.StandardTokenizerFactory"/>
      |        <filter class="solr.LowerCaseFilterFactory"/></analyzer>
      |    </fieldType>
      |    <fieldType name="int" class="solr.TrieIntField"/>
      |  </types>
      |  <fields>
      |    <field name="id" type="string"/>
      |    <field name="title" type="text_general"/>
      |    <field name="text" type="text_general" multiValued="true"
      |           stored="false"/>
      |    <dynamicField name="*_i" type="int"/>
      |    <dynamicField name="*_ti" type="int"/>
      |    <dynamicField name="*_s" type="string"/>
      |    <dynamicField name="*_t" type="text_general"/>
      |    <dynamicField name="*_txt" type="text_general" multiValued="true"/>
      |    <dynamicField name="attr_*" type="string" multiValued="true"/>
      |  </fields>
      |  <copyField source="*_t" dest="*_txt"/>
      |  <copyField source="title" dest="text" maxChars="10"/>
      |  <copyField source="*_s" dest="text"/>
      |</schema>""".stripMargin

  private lazy val schema = SolrSchema.parse(xml)

  test("parse: types, fields, dynamic fields, copy decls") {
    assert(schema.types("string").clazz == "solr.StrField")
    assert(schema.types("text_general").clazz == "solr.TextField")
    assert(schema.fields("text").multiValued && !schema.fields("text").stored)
    assert(schema.dynamicFields.length == 6)
  }

  test("dynamic resolution: longest regex first; explicit wins") {
    // *_ti (4) outranks *_i (3) for foo_ti (dynamicFieldListToSortedArray)
    assert(schema.dynamicPattern("foo_ti").contains("*_ti"))
    assert(schema.dynamicPattern("foo_i").contains("*_i"))
    // NameStartsWith
    assert(schema.dynamicPattern("attr_anything").contains("attr_*"))
    assert(schema.field("foo_ti").typeName == "int")
    assert(schema.field("attr_x").multiValued)
    // explicit field resolves before any dynamic pattern
    assert(schema.field("title").typeName == "text_general")
    assert(schema.fieldOrNull("nosuchfield").isEmpty)
    intercept[IllegalArgumentException] { schema.field("nosuchfield") }
  }

  test("copyField glob source -> dynamic dest substitutes the remainder") {
    // DynamicCopy.getTargetField: remainder of foo_t under *_t is "foo",
    // subst into *_txt gives foo_txt
    val cfs = schema.copyFieldsList("foo_t")
    assert(cfs.map(_.dest.name) == Seq("foo_txt"))
    assert(cfs.head.dest.multiValued)
    // a non-matching name has no copy
    assert(schema.copyFieldsList("foo_i").isEmpty)
  }

  test("explicit and dynamic-source copies to one dest; maxChars " +
    "truncation (CopyField.getLimitedValue)") {
    val t = schema.copyFieldsList("title")
    assert(t.map(_.dest.name) == Seq("text") && t.head.maxChars == 10)
    assert(t.head.limitedValue("short") == "short")
    assert(t.head.limitedValue("0123456789") == "0123456789".substring(0, 10))
    assert(t.head.limitedValue("0123456789abcdef") == "0123456789")
    val s = schema.copyFieldsList("lang_s")
    assert(s.map(_.dest.name) == Seq("text") && s.head.maxChars == 0)
    assert(schema.isCopyFieldTarget("text"))
    assert(!schema.isCopyFieldTarget("title"))
  }

  test("registration errors match the reference") {
    def bad(copy: String): Unit = {
      val x = xml.replace("""<copyField source="*_s" dest="text"/>""", copy)
      intercept[Exception] { SolrSchema.parse(x) }
    }
    // invalid glob: inner asterisk
    bad("""<copyField source="a*b" dest="text"/>""")
    // explicit source -> dynamic dest WITH asterisk
    bad("""<copyField source="title" dest="*_txt"/>""")
    // unknown dest
    bad("""<copyField source="title" dest="nosuch"/>""")
    // source neither glob nor matching anything
    bad("""<copyField source="nosuch" dest="text"/>""")
  }

  test("sparkType maps fieldType classes to Spark types") {
    import org.apache.spark.sql.types._
    def tp(name: String) =
      SolrSchema.sparkType(schema.types, schema.field(name))
    assert(tp("id") == StringType)
    assert(tp("foo_i") == IntegerType)
    assert(tp("title") == StringType)
    assert(tp("text") == ArrayType(StringType)) // multiValued
    assert(tp("attr_x") == ArrayType(StringType))
  }

  test("bind: copy destinations materialize over a DataFrame") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val df = Seq(
      ("1", "A title well beyond ten chars", "en", "hello world"),
      ("2", "short", "de", "zweite zeile"))
      .toDF("id", "title", "lang_s", "body_t")
    val out = schema.bind(df).orderBy("id").collect()
    // body_t -> body_txt (glob subst), full value
    assert(out(0).getSeq[String](out(0).fieldIndex("body_txt")) == Seq("hello world"))
    // text <- title (maxChars 10) + lang_s, in getCopyFieldsList order
    assert(out(0).getSeq[String](out(0).fieldIndex("text")) == Seq("A title we", "en"))
    assert(out(1).getSeq[String](out(1).fieldIndex("text")) == Seq("short", "de"))
    // unknown column refuses
    intercept[IllegalArgumentException] {
      schema.bind(df.withColumnRenamed("id", "nosuch_field"))
    }
  }

  test("single-valued dest with multiple contributions raises") {
    val x = xml
      .replace("""<field name="title" type="text_general"/>""",
        """<field name="title" type="text_general"/>
          |<field name="single" type="string"/>""".stripMargin)
      .replace("""<copyField source="*_s" dest="text"/>""",
        """<copyField source="*_s" dest="single"/>
          |<copyField source="title" dest="single"/>""".stripMargin)
    val s2 = SolrSchema.parse(x)
    val spark = SparkSuite.spark
    import spark.implicits._
    val df = Seq(("1", "t", "en")).toDF("id", "title", "lang_s")
    intercept[IllegalArgumentException] { s2.bind(df) }
  }
}
