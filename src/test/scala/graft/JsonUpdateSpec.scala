package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JsonUpdate
import graft.sources.JsonUpdate._

/** JSON update command grammar — the reference JsonLoaderTest.testParsing
  * vector plus doc-array, child-document and atomic-update shapes. */
class JsonUpdateSpec extends AnyFunSuite {

  private val input = """{

'add': {
  'doc': {
    'bool': true,
    'f0': 'v0',
    'f2': {
      'boost': 2.3,
      'value': 'test'
    },
    'array': [ 'aaa', 'bbb' ],
    'boosted': {
      'boost': 6.7,
      'value': [ 'aaa', 'bbb' ]
    }
  }
},
'add': {
  'commitWithin': 1234,
  'overwrite': false,
  'boost': 3.45,
  'doc': {
    'f1': 'v1',
    'f1': 'v2',
    'f2': null
  }
},

'commit': {},
'optimize': { 'waitSearcher':false, 'openSearcher':false },

'delete': { 'id':'ID' },
'delete': { 'id':'ID', 'commitWithin':500 },
'delete': { 'query':'QUERY' },
'delete': { 'query':'QUERY', 'commitWithin':500 },
'rollback': {}

}
"""

  test("the reference testParsing vector") {
    val cmds = JsonUpdate.parse(input)
    val adds = cmds.collect { case a: Add => a }
    assert(adds.size === 2)
    val d0 = adds(0).doc
    assert(d0.boostOf("boosted") === 6.7)
    assert(d0.valuesOf("boosted").size === 2)
    assert(d0.valuesOf("bool") === Seq(true))
    assert(d0.boostOf("f2") === 2.3)
    assert(d0.valuesOf("f2") === Seq("test"))
    assert(d0.valuesOf("array") === Seq("aaa", "bbb"))
    val a1 = adds(1)
    assert(a1.doc.valuesOf("f1").size === 2)
    assert(math.abs(a1.boost - 3.45) < 1e-9)
    assert(!a1.overwrite)
    assert(a1.commitWithin === 1234L)
    assert(a1.doc.valuesOf("f2").isEmpty) // null -> zero values

    val commits = cmds.collect { case c: Commit => c }
    assert(commits.size === 2)
    assert(!commits(0).optimize)
    assert(commits(1).optimize)
    assert(commits(1).options === Map("waitSearcher" -> false,
      "openSearcher" -> false))

    val dels = cmds.collect { case d: Delete => d }
    assert(dels.size === 4)
    assert(dels(0) === Delete(Some("ID"), None, -1))
    assert(dels(1) === Delete(Some("ID"), None, 500))
    assert(dels(2) === Delete(None, Some("QUERY"), -1))
    assert(dels(3) === Delete(None, Some("QUERY"), 500))

    assert(cmds.count(_ == Rollback) === 1)
  }

  test("bare doc array, add-array form, scalar and array deletes") {
    val arr = JsonUpdate.parse("""[{'id':'1'},{'id':'2'}]""")
    assert(arr.collect { case a: Add => a.doc.valuesOf("id").head } ===
      Seq("1", "2"))
    val addArr = JsonUpdate.parse("""{'add':[{'id':'3'},{'id':'4'}]}""")
    assert(addArr.size === 2)
    // scalar delete incl. number stringification; delete arrays mix forms
    val dels = JsonUpdate.parse(
      """{'delete':'ID1','delete':42,'delete':['a',{'id':'b','_version_':7}]}""")
      .collect { case d: Delete => d }
    assert(dels.map(_.id) === Seq(Some("ID1"), Some("42"), Some("a"), Some("b")))
    assert(dels(3).version === Some(7L))
  }

  test("child documents and atomic-update extended values") {
    val cmds = JsonUpdate.parse(
      """{'add':{'doc':{
        |  'id':'p1',
        |  'count_i': {'inc': 3},
        |  'tags': {'add': ['x','y']},
        |  '_childDocuments_': [
        |     {'id':'c1','v':1},
        |     {'id':'c2','v':2,'_childDocuments_':[{'id':'g1'}]}
        |  ]}}}""".stripMargin)
    val add = cmds.collect { case a: Add => a }.head
    assert(add.doc.children.map(_.valuesOf("id").head) === Seq("c1", "c2"))
    assert(add.doc.children(1).children.head.valuesOf("id") === Seq("g1"))
    // atomic commands arrive as extendedInfo maps
    val inc = add.doc.entries.find(_.name == "count_i").get.value
    assert(inc === Map("inc" -> 3L))
    val tadd = add.doc.entries.find(_.name == "tags").get.value
    assert(tadd === Map("add" -> List("x", "y")))
  }

  test("command-mode arrays keep JSON nulls; null delete id is absent") {
    // JsonLoader.parseArrayFieldValue adds EVERY element including nulls
    val add = JsonUpdate.parse("""{'add':{'doc':{'f':['a',null,'b']}}}""")
      .collect { case a: Add => a }.head
    assert(add.doc.entries.find(_.name == "f").get.value ===
      List("a", null, "b"))
    // {'delete':{'id':null}} must not pass the id-or-query check as
    // Delete(Some(null)) — a null id counts as missing
    intercept[Exception] { JsonUpdate.parse("""{'delete':{'id':null}}""") }
  }

  test("errors: unknown command, delete without id or query, double doc") {
    intercept[Exception] { JsonUpdate.parse("""{'frobnicate':{}}""") }
    intercept[Exception] { JsonUpdate.parse("""{'delete':{'commitWithin':5}}""") }
    intercept[Exception] {
      JsonUpdate.parse("""{'add':{'doc':{'a':1},'doc':{'b':2}}}""")
    }
  }
}
