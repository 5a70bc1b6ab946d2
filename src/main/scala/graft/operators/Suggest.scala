package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.Token

/** The reference suggest module's remaining lookups, re-expressed as
  * dictionary-Dataset scans (the already-shipped ones are infix, fuzzy and
  * free-text):
  *
  *  - AnalyzingSuggester (suggest/analyzing/AnalyzingSuggester.java:68):
  *    keys are ANALYZED forms (tokens joined by the  separator when
  *    PRESERVE_SEP is set), suggestions return the stored SURFACE form;
  *    duplicate surface forms collapse to their max weight; results order
  *    by weight desc with exact-analyzed matches first (EXACT_FIRST), ties
  *    by analyzed form (AnalyzingSuggester.java:93-96).
  *  - WFSTCompletionLookup (suggest/fst/WFSTCompletionLookup.java:63):
  *    plain surface-prefix completion; cost = MAX_VALUE - weight, so paths
  *    order by weight desc then surface bytes asc; exactFirst returns the
  *    exact key before higher-weighted completions.
  *  - BlendedInfixSuggester (suggest/analyzing/BlendedInfixSuggester.java:83):
  *    infix match (all query tokens must occur; the trailing token matches
  *    as a prefix), candidates = top num*numFactor by raw weight, then the
  *    weight is blended by the FIRST matched token position — LINEAR
  *    w*(1-0.10*p) or RECIPROCAL w/(1+p); a hit whose text starts with the
  *    raw query keeps coefficient 1 (BlendedInfixSuggester.java:218-226,
  *    296-320); final score is the (long) truncation.
  *  - SuggestStopFilter (suggest/analyzing/SuggestStopFilter.java:30):
  *    StopFilter that keeps a TRAILING stopword still being typed (its
  *    endOffset reaches the end of the input, i.e. no separator followed).
  *
  * Scale posture: every lookup is a sargable filter over a (surface/akey,
  * weight) dictionary Dataset + a k-row top-k — the dictionary can be
  * billions of rows; nothing is collected driver-side but the k results.
  * The FST the reference builds is the single-node analog of the sorted,
  * min/max-pruned parquet the dictionary lives in here.
  */
object Suggest {

  /** AnalyzingSuggester.SEP_LABEL (preserve-sep separator). */
  final val Sep = '\u001f'

  /** Analyzed key: analysis-chain tokens joined by Sep (PRESERVE_SEP). */
  def analyzedKey(tokens: Seq[String]): String = tokens.mkString(Sep.toString)

  /** AnalyzingSuggester lookup over dict(surface, akey, weight[, payload]).
    * `queryKey` must already be the analyzed form of the user's partial
    * input (same chain as the dictionary's akey column). */
  def analyzing(dict: DataFrame, queryKey: String, n: Int,
                exactFirst: Boolean = true): DataFrame = {
    val extra = dict.columns.filterNot(Set("surface", "akey", "weight")).toSeq
    // duplicate surface forms keep their max-weight entry (the reference
    // dedups surface forms per analyzed form, maxSurfaceFormsPerAnalyzedForm)
    val dedup = dict
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("surface")).orderBy(col("weight").desc, col("akey"))))
      .where(col("_rn") === 1).drop("_rn")
    val matches = dedup.where(col("akey").startsWith(queryKey))
    val exact = when(col("akey") === queryKey, lit(1)).otherwise(lit(0)).as("_exact")
    val ordered =
      if (exactFirst)
        matches.withColumn("_exact", exact)
          .orderBy(col("_exact").desc, col("weight").desc, col("akey"), col("surface"))
          .drop("_exact")
      else matches.orderBy(col("weight").desc, col("akey"), col("surface"))
    ordered.limit(n).select(("surface" +: "weight" +: extra).map(col): _*)
  }

  /** WFSTCompletionLookup over dict(surface, weight): surface-prefix
    * completion, weight desc (cost asc), ties by surface bytes. */
  def wfst(dict: DataFrame, prefix: String, n: Int,
           exactFirst: Boolean = true): DataFrame = {
    val matches = dict.where(col("surface").startsWith(prefix))
    val ordered =
      if (exactFirst)
        matches.orderBy((col("surface") === prefix).desc, col("weight").desc, col("surface"))
      else matches.orderBy(col("weight").desc, col("surface"))
    ordered.limit(n).select("surface", "weight")
  }

  /** BlendedInfixSuggester blender types. */
  sealed trait Blender { def coef(position: Column): Column }
  /** weight * (1 - 0.10*position) — BlenderType.POSITION_LINEAR. */
  case object PositionLinear extends Blender {
    def coef(p: Column): Column = lit(1.0) - lit(0.10) * p
  }
  /** weight / (1 + position) — BlenderType.POSITION_RECIPROCAL. */
  case object PositionReciprocal extends Blender {
    def coef(p: Column): Column = lit(1.0) / (p + lit(1.0))
  }

  /** BlendedInfixSuggester lookup over dict(surface, toks: array<string>,
    * weight[, payload...]). `queryToks` are the analyzed query tokens; the
    * LAST one matches as a token prefix (the user may still be typing it),
    * the rest must occur exactly. `rawQuery` is the un-analyzed input used
    * for the startsWith coefficient-1 short-circuit. */
  def blendedInfix(dict: DataFrame, rawQuery: String, queryToks: Seq[String],
                   n: Int, blender: Blender = PositionLinear,
                   numFactor: Int = 10): DataFrame = {
    require(queryToks.nonEmpty, "empty suggest query")
    val exactToks = queryToks.dropRight(1)
    val prefixTok = queryToks.last
    val hasAll = exactToks.map(t => array_contains(col("toks"), t))
      .foldLeft(lit(true))(_ && _)
    val prefixPos = array_position( // 1-based; 0 = no match
      transform(col("toks"), t => t.startsWith(prefixTok)), lit(true))
    val candidates = dict
      .where(hasAll && prefixPos > 0)
      .orderBy(col("weight").desc, col("surface"))
      .limit(n * numFactor)
    // first (closest) matched token position across exact + prefix matches
    val matchPositions = array_union(
      filter(transform(col("toks"), (t, i) =>
        when(exactToks.map(t === _).foldLeft(lit(false))(_ || _), i).otherwise(lit(-1))),
        p => p >= 0),
      array(prefixPos.cast("int") - 1))
    val firstPos = array_min(filter(matchPositions, p => p >= 0)).cast("double")
    val coefficient = when(col("surface").startsWith(rawQuery), lit(1.0))
      .otherwise(blender.coef(firstPos))
    candidates // (long)(weight*coef): double->long cast truncates, like the reference
      .withColumn("score", (col("weight") * coefficient).cast("long"))
      .orderBy(col("score").desc, col("surface"))
      .limit(n)
      .select("surface", "score")
  }

  /** SuggestStopFilter over a flat token vector: drop stopwords (leaving
    * position gaps) EXCEPT a trailing stopword whose endOffset reaches the
    * end of the input (no separator typed after it yet). */
  def suggestStop(toks: IndexedSeq[Token], stopWords: Set[String],
                  inputLen: Int): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var gap = 0
    toks.zipWithIndex.foreach { case (t, i) =>
      val isStop = stopWords.contains(t.term)
      val keepTrailing = isStop && i == toks.length - 1 && t.endOffset == inputLen
      if (!isStop || keepTrailing) {
        out += t.copy(posInc = t.posInc + gap,
          tokenType = if (keepTrailing) "KEYWORD" else t.tokenType)
        gap = 0
      } else gap += t.posInc
    }
    out.result()
  }
}
