package graft.index

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic source-code corpus with the input_hint shape
  * (repo, path, commit, lang, content) — the stand-in for the reference's
  * benchmark content sources (lucene/benchmark/.../feeds/LineDocSource.java)
  * per FIXTURES.md §1. Row i is a pure function of (seed, i), so generation
  * is order-independent and parallel-safe at any partitioning.
  *
  * Guaranteed properties (FIXTURES.md §1 invariants):
  *  - Zipfian token draw with >=2 terms ("import", "return") at docFreq
  *    > 50% of docs (hot-term salting path);
  *  - per-lang rows (scala/java/py/en) exercising per-lang stop sets;
  *  - near-tie pairs: doc 2j/2j+1 for j % 17 == 3 share identical content
  *    (identical tf & dl => identical scores; tie-break docId asc);
  *  - rows with a >255-char token (maxTokenLength skip-but-count rule).
  */
object CorpusGen {

  private val langs = Array("scala", "java", "py", "en")
  private val hot = Array("import", "return")
  private val code = Array("def", "val", "class", "object", "public",
    "static", "void", "int", "string", "println", "spark", "dataset",
    "filter", "map", "reduce", "index", "query", "score", "merge", "block",
    "the", "of", "and", "to", "if", "for") // overlaps English stop set
  private val dotted = Array("org.apache.spark", "java.util.List",
    "scala.collection.Seq")

  def content(seed: Long, i: Long): (String, String) = {
    val rng = new scala.util.Random(seed * 0x9E3779B97F4A7C15L + i)
    val lang = langs((i % langs.length).toInt)
    val n = 20 + rng.nextInt(180)
    val sb = new StringBuilder(n * 8)
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      val r = rng.nextDouble()
      if (r < 0.18) sb.append(hot(rng.nextInt(hot.length)))
      else if (r < 0.55) sb.append(code(rng.nextInt(code.length)))
      else if (r < 0.62) sb.append(dotted(rng.nextInt(dotted.length)))
      else if (r < 0.70) sb.append(rng.nextInt(10000).toString)
      else sb.append(f"id${rng.nextInt(1000)}%03d")
      j += 1
    }
    if (i % 23 == 5) { // over-long token: skipped but counts a position
      sb.append(' ').append("x" * 300).append(' ').append("spark")
    }
    (lang, sb.toString)
  }

  /** Row i; near-tie pairs share content (see class doc). */
  def row(seed: Long, i: Long): DocInput = {
    val pairBase = if ((i / 2) % 17 == 3) i - (i % 2) else i
    val (lang, text) = content(seed, pairBase)
    DocInput(
      repo = f"org${(i % 50)}%03d/proj${(i % 7)}%02d",
      path = f"src/d${(i / 100)}%03d/f$i%06d.$lang%s",
      commit = f"${i * 2654435761L}%016x",
      lang = lang,
      content = text)
  }

  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
               parts: Int = 32): Dataset[DocInput] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).map(i => row(seed, i))
  }
}
