package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.analysis.{Analyzer, StopSets}

/** Column-level text functions shared by the training-data operators
  * (SURVEY.md §2 extensions: dedup / text-analysis / fingerprinting).
  *
  * The tokenizer itself is the one genuinely custom scalar op (the
  * reference's Analyzer chain, an inherently imperative DFA —
  * lucene/analysis/common/.../standard/StandardAnalyzer.java:87-113); it is
  * exposed as a UDF returning `array<string>` so everything downstream
  * (shingles, hashes, aggregations) stays in codegen'd built-in functions.
  */
object TextFns {

  /** Analysis chain WITHOUT stop removal: lowercase UAX#29 tokens in
    * reading order. Used by dedup/fingerprint ops, which must be
    * language-neutral. */
  val tokensAll = udf { (text: String) =>
    if (text == null) Array.empty[String]
    else Analyzer.analyze(text, Set.empty[String]).map(_.term).toArray
  }

  /** Full per-`lang` chain (lowercase + per-lang stop set), tokens only. */
  val tokensLang = udf { (text: String, lang: String) =>
    if (text == null) Array.empty[String]
    else Analyzer.analyze(text, StopSets.forLang(lang)).map(_.term).toArray
  }

  /** Word k-shingles from a token array, built with codegen'd collection
    * functions (no UDF): shingle i = tokens[i..i+k-1] joined by ' '. */
  def shingles(tokens: Column, k: Int): Column =
    when(size(tokens) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(tokens) - (k - 1)),
        i => array_join(slice(tokens, i, lit(k)), " ")))

  /** First 60 bits of md5 as a non-negative long (15 hex chars). Stable
    * across engines: DuckDB mirror is ('0x' || substr(md5(s),1,15))::BIGINT.
    * conv() parses hex; 60 bits cannot overflow. */
  def md5Bits60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** First 48 bits of md5 as a long (12 hex chars) — small enough that
    * per-bit shifts and sums stay exact in 64-bit. */
  def md5Bits48(s: Column): Column =
    conv(substring(md5(s), 1, 12), 16, 10).cast("long")

  /** Cosine similarity in double precision, formula-identical to DuckDB's
    * list_cosine_similarity: dot / (sqrt(dot_aa) * sqrt(dot_bb)), all sums
    * left-to-right. Inputs are float arrays; each element widens exactly. */
  /** Left-to-right double dot product (DuckDB list_dot_product mirror). */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
