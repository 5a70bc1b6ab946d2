package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.SnowballStemmers

/** Snowball stemmers vs the reference's full golden vocabularies —
  * the exact voc.txt/output.txt pairs TestSnowball asserts against
  * (analysis/snowball/TestSnowballVocabData.zip). */
class SnowballStemSpec extends AnyFunSuite {

  private def pairs(name: String): Vector[(String, String)] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val t = l.split('\t'); (t(0), if (t.length > 1) t(1) else "")
      }.toVector
    finally in.close()
  }

  private def check(name: String, stem: String => String, minWords: Int): Unit = {
    val vecs = pairs(name)
    assert(vecs.length >= minWords)
    var bad = 0
    val examples = Vector.newBuilder[String]
    vecs.foreach { case (w, want) =>
      val got = stem(w)
      if (got != want) {
        bad += 1
        if (bad <= 15) examples += s"$w -> $got (want $want)"
      }
    }
    assert(bad == 0, s"$bad/${vecs.length} mismatches; first: ${examples.result().mkString("; ")}")
  }

  test("Danish snowball: full reference vocabulary (23k pairs)") {
    check("/stems/dasnow.txt", SnowballStemmers.danish, 20000)
  }
  test("Dutch snowball: full reference vocabulary (45k pairs)") {
    check("/stems/nlsnow.txt", SnowballStemmers.dutch, 40000)
  }
  test("Romanian snowball: full reference vocabulary (22k pairs)") {
    check("/stems/rosnow.txt", SnowballStemmers.romanian, 20000)
  }
  test("Turkish snowball: full reference vocabulary (96k pairs)") {
    check("/stems/trsnow.txt", SnowballStemmers.turkish, 90000)
  }
  test("German snowball: full reference vocabulary (35k pairs)") {
    check("/stems/germansnow.txt", SnowballStemmers.german, 30000)
  }
  test("German2 snowball: full reference vocabulary (35k pairs)") {
    check("/stems/german2snow.txt", SnowballStemmers.german2, 30000)
  }
  test("Lovins: full reference vocabulary (30k pairs)") {
    check("/stems/lovinssnow.txt", graft.analysis.LovinsStemmer.stem, 25000)
  }

  test("Swedish snowball: full reference vocabulary (30k pairs)") {
    check("/stems/svsnow.txt", SnowballStemmers.swedish, 28000)
  }
  test("Norwegian snowball: full reference vocabulary (20k pairs)") {
    check("/stems/nosnow.txt", SnowballStemmers.norwegian, 19000)
  }


  test("Russian snowball: full reference vocabulary (49k pairs)") {
    check("/stems/rusnow.txt", SnowballStemmers.russian, 45000)
  }


  test("English Porter2 snowball: full reference vocabulary (29k pairs)") {
    check("/stems/ensnow.txt", SnowballStemmers.english2, 28000)
  }


  test("Spanish snowball: full reference vocabulary (28k pairs)") {
    check("/stems/essnow.txt", SnowballStemmers.spanish, 27000)
  }


  test("Portuguese snowball: full reference vocabulary (32k pairs)") {
    check("/stems/ptsnow.txt", SnowballStemmers.portugueseSnowball, 30000)
  }


  test("Italian snowball: full reference vocabulary (35k pairs)") {
    check("/stems/itsnow.txt", SnowballStemmers.italian, 33000)
  }


  test("French snowball: full reference vocabulary (20k pairs)") {
    check("/stems/frsnow.txt", SnowballStemmers.french, 19000)
  }


  test("Finnish snowball: full reference vocabulary (50k pairs)") {
    check("/stems/fisnow.txt", SnowballStemmers.finnish, 48000)
  }

}
