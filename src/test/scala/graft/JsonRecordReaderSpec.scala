package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JsonRecordReader

/** JsonRecordReader (Solr /update/json/docs split mode) at reference
  * golden parity — the TestJsonRecordReader vectors: one-level split,
  * wildcard and recursive-wildcard leaves, $FQN naming, whole-document
  * records, frame purging across sequential root values, typed scalars.
  */
class JsonRecordReaderSpec extends AnyFunSuite {

  private val json1 = """{
 "a":"A" ,
 "b":[
     {"c":"C","d":"D" ,"e": {
                         "s":"S",
                         "t":3}},
     {"c":"C1","d":"D1"},
     {"c":"C2","d":"D2"}
 ]
}"""

  test("one-level split with mapped leaves (testOneLevelSplit)") {
    val r = JsonRecordReader.getInst("/b", Seq(
      "a_s:/a", "c_s:/b/c", "d_s:/b/d", "e_s:/b/e/s", "e_i:/b/e/t"))
    val recs = r.getAllRecords(json1)
    assert(recs.size === 3)
    assert(recs(0)("e_i") === 3L)
    assert(recs(2)("d_s") === "D2")
    assert(!recs(1).contains("e_s") && !recs(2).contains("e_s"))
    assert(!recs(1).contains("e_i") && !recs(2).contains("e_i"))

    // unmapped paths collect nothing
    val r2 = JsonRecordReader.getInst("/b", Seq("a:/a", "d:/b/d",
      "s:/b/e/s", "t:/b/e/t"))
    assert(r2.getAllRecords(json1).forall(!_.contains("c")))
    val r3 = JsonRecordReader.getInst("/b", Seq("a:/a", "c:/b/c", "d:/b/d"))
    assert(r3.getAllRecords(json1).forall(m =>
      !m.contains("s") && !m.contains("t")))
    // an object-valued leaf without ** collects nothing
    val r4 = JsonRecordReader.getInst("/b", Seq("a_s:/a", "c_s:/b/c",
      "d_s:/b/d", "e:/b/e"))
    assert(r4.getAllRecords(json1).forall(m =>
      !m.contains("s") && !m.contains("t") && !m.contains("e")))
    // '*' wildcard: direct scalars under the path, named by their key
    val r5 = JsonRecordReader.getInst("/b", Seq("a_s:/a", "c_s:/b/c",
      "d_s:/b/d", "/b/e/*"))
    val recs5 = r5.getAllRecords(json1)
    assert(recs5(0)("t") === 3L && recs5(0)("s") === "S")
    assert(!recs5(1).contains("s") && !recs5(2).contains("s"))
  }

  private val json2 = """{
 "a":"A" ,
 "b":[
     {"c":"C","d":"D" ,"e": {
                         "s":"S",
                         "t":3 ,"u":{"v":3.1234,"w":false}}},
     {"c":"C1","d":"D1"},
     {"c":"C2","d":"D2"}
 ]
}"""

  test("recursive wildcard collects at any depth (testRecursiveWildCard)") {
    val r = JsonRecordReader.getInst("/b", Seq("/b/**"))
    val recs = r.getAllRecords(json2)
    assert(recs.size === 3)
    assert(recs(0)("t") === 3L)
    assert(recs(0)("s") === "S")
    assert(recs(0)("v") === 3.1234)
    assert(recs(0)("w") === false)
    assert(recs.forall(m => m.contains("c") && m.contains("d")))

    // split '/' = one record for the whole document; repeats become lists
    val r2 = JsonRecordReader.getInst("/", Seq("/**"))
    val whole = r2.getAllRecords(json2)
    assert(whole.size === 1)
    assert(whole(0)("c").asInstanceOf[Seq[_]].size === 3)
    assert(whole(0)("d").asInstanceOf[Seq[_]].size === 3)
    assert(whole(0)("t") === 3L)
    assert(whole(0)("s") === "S")
    assert(whole(0)("a") === "A")
    assert(whole(0)("w") === false)
  }

  private val exams = """{
  "first": "John",
  "last": "Doe",
  "grade": 8,
  "exams": [
      {
        "subject": "Maths",
        "test"   : "term1",
        "marks":90},
        {
         "subject": "Biology",
         "test"   : "term1",
         "marks":86}
      ]
}"""

  test("$FQN names and named-** collection (testRecursiveWildcard2)") {
    val r = JsonRecordReader.getInst("/exams", Seq("/**"))
    val recs = r.getAllRecords(exams)
    assert(recs.size === 2)
    for (m <- recs) {
      assert(m.size === 6)
      assert(m.contains("subject") && m.contains("test") && m.contains("marks"))
    }
    val rf = JsonRecordReader.getInst("/exams", Seq("$FQN:/**"))
    val fqn = rf.getAllRecords(exams)
    assert(fqn.size === 2)
    for (m <- fqn) {
      assert(m.size === 6)
      assert(m.contains("exams.subject") && m.contains("exams.test") &&
        m.contains("exams.marks"))
    }
    val rt = JsonRecordReader.getInst("/", Seq("txt:/**"))
    val txt = rt.getAllRecords(exams)
    assert(txt.size === 1)
    assert(txt(0)("txt").asInstanceOf[Seq[_]].size === 9)
  }

  test("nested split path below an object (testNestedJsonWithFloats)") {
    val json = """{
        "a_string" : "abc",
        "a_num" : 2.0,
        "a" : {
                "b" : [
                        {"id":"1", "title" : "test1"},
                        {"id":"2", "title" : "test2"}
                ]
        }
}"""
    val r = JsonRecordReader.getInst("/a/b", Seq("title_s:/a/b/title"))
    val recs = r.getAllRecords(json)
    assert(recs.size === 2)
    assert(recs.map(_("title_s")) === Seq("test1", "test2"))
  }

  test("fields purge across sequential roots (testClearPreviousRecordFields)") {
    val json = """{
'first': 'John',
'exams': [
{'subject': 'Maths', 'test'   : 'term1', 'marks':90},
{'subject': 'Biology', 'test'   : 'term1', 'marks':86}
]
}
{
'first': 'Bob',
'exams': [
{'subject': 'Maths', 'test': 'term1', 'marks': 95
}
,
{
'subject': 'Biology', 'test'   : 'term1', 'marks': 92}
]
}"""
    val r = JsonRecordReader.getInst("/exams", Seq("/**"))
    val recs = r.getAllRecords(json)
    assert(recs.size === 4)
    // no cross-document accumulation: every value stays a scalar
    for (m <- recs; (_, v) <- m) assert(!v.isInstanceOf[Seq[_]], m.toString)
    assert(recs(0)("first") === "John")
    assert(recs(2)("first") === "Bob")
  }

  test("nested split paths do not leak sibling fields across records") {
    // Deliberate deviation from the reference (JsonRecordReader.java:417):
    // Solr never pops its frame stack, so `sib`'s fields would register
    // against the CLOSED /a/b frame, escape /a's purge, and leak z into
    // the second /a record. We pop, so the second record is clean.
    val json =
      """[{"a": {"x": 1, "b": {"y": 2}, "sib": {"z": 3}}},
        | {"a": {"x": 10}}]""".stripMargin
    val r = JsonRecordReader.getInst("/a|/a/b",
      Seq("/a/x", "/a/b/y", "/a/sib/z"))
    val recs = r.getAllRecords(json)
    assert(recs.size === 3)
    assert(recs(0) === Map("x" -> 1L, "y" -> 2L))
    assert(recs(1) === Map("x" -> 1L, "z" -> 3L))
    assert(recs(2) === Map("x" -> 10L)) // no leaked z
  }

  test("typed scalars: long, double, big integer, boolean, null dropped") {
    val r = JsonRecordReader.getInst("/", Seq("/**"))
    val m = r.getAllRecords(
      """{"l": 42, "d": 1.5, "big": 123456789012345678901234567890,
         |"t": true, "n": null, "arr": [1, 2]}""".stripMargin).head
    assert(m("l") === 42L)
    assert(m("d") === 1.5)
    assert(m("big") === "123456789012345678901234567890")
    assert(m("t") === true)
    assert(!m.contains("n"))
    assert(m("arr").asInstanceOf[Seq[_]] === Seq(1L, 2L))
  }
}
