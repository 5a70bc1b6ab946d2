package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ExternalFile

/** FileFloatSource parse semantics
  * (solr/.../function/FileFloatSource.java:241-325). */
class ExternalFileSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def parse(lines: (Long, String)*): Map[String, Float] = {
    import spark.implicits._
    ExternalFile.parse(lines.toSeq.toDS()).collect()
      .map(r => r.getString(0) -> r.getFloat(1)).toMap
  }

  test("later lines overwrite earlier ones") {
    assert(parse((1L, "a=1.5"), (2L, "a=2.5")) === Map("a" -> 2.5f))
    assert(parse((2L, "a=1.5"), (1L, "a=2.5")) === Map("a" -> 1.5f))
  }

  test("unparsable floats are skipped and do not erase earlier values") {
    assert(parse((1L, "a=1.5"), (2L, "a=oops")) === Map("a" -> 1.5f))
    assert(parse((1L, "a=oops")) === Map.empty)
  }

  test("delimiter is the LAST '='; no-delimiter lines are skipped") {
    assert(parse((1L, "k=ey=3.5")) === Map("k=ey" -> 3.5f))
    assert(parse((1L, "garbage")) === Map.empty)
  }

  test("join applies defVal to docs missing from the file") {
    import spark.implicits._
    val docs = Seq(("d1", 1L), ("d2", 2L)).toDF("dockey", "doc_id")
    val parsed = ExternalFile.parse(Seq((1L, "d1=2.0")).toDS())
    val out = ExternalFile.joinValues(docs, "dockey", parsed, 0.25f)
      .select("doc_id", "ext").collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    assert(out === Map(1L -> 2.0f, 2L -> 0.25f))
  }
}
