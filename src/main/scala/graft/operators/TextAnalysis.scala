package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.StopSets
import graft.functions.TextFns

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All outputs
  * are deterministic pure functions of the row (SQL-oracle checkable);
  * every op is a narrow map + one hash aggregation — no all-pairs work.
  */
object TextAnalysis {

  /** The candidate languages and their stop sets (from the reference's
    * per-language analyzer resources — see graft.analysis.StopSets). */
  val Candidates: Seq[(String, Set[String])] = Seq(
    "de" -> StopSets.german, "en" -> StopSets.english,
    "es" -> StopSets.spanish, "fr" -> StopSets.french,
    "zh" -> StopSets.cjk)

  /** (lang, stopword) rows for joins; also the base of the SQL oracle. */
  def stopTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Candidates.flatMap { case (l, s) => s.toSeq.sorted.map(w => (l, w)) }
      .toDF("slang", "sterm")
  }

  /** Stopword-profile language ID: predicted lang = argmax over candidate
    * languages of (#tokens in that language's stop set), ties toward the
    * alphabetically first lang, no hits -> 'und'. A deliberately simple,
    * fully deterministic n-gram-free heuristic (the point is the Spark
    * shape: explode + broadcast join + two aggregations). */
  def langId(docs: DataFrame, id: String = "doc_id",
             text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(col(id).as("id"),
      explode(TextFns.tokensAll(col(text))).as("term"))
    val hits = toks.join(broadcast(stopTable(spark)), col("term") === col("sterm"))
      .groupBy(col("id"), col("slang")).agg(count(lit(1)).as("hits"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("hits").desc, col("slang").asc)))
      .where(col("rn") === 1)
      .select(col("id"), col("slang").as("pred_lang"), col("hits"))
    docs.select(col(id).as("id")).join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("hits"), lit(0L)).as("hits"))
  }

  /** Heuristic quality score in [0,1]:
    * 0.3*min(tokens/100,1) + 0.3*type_token_ratio
    * + 0.2*(1 - stop_ratio) + 0.2*min(avg_token_chars/8,1),
    * where stop_ratio uses the doc's own `lang` stop set. All terms are
    * exact integer ratios widened to double -> oracle-exact. */
  def quality(docs: DataFrame, id: String = "doc_id", text: String = "text",
              lang: String = "lang"): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(col(id).as("id"), col(lang).as("lang"),
        explode(TextFns.tokensAll(col(text))).as("term"))
    val st = stopTable(spark)
    val perDoc = toks
      .join(broadcast(st), col("lang") === col("slang") &&
        col("term") === col("sterm"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col("term")).as("n_distinct"),
        sum(when(col("sterm").isNotNull, 1L).otherwise(0L)).as("n_stop"),
        sum(length(col("term"))).as("sum_chars"))
    perDoc.select(col("id"),
      (lit(0.3) * least(col("n_tok") / 100.0, lit(1.0)) +
        lit(0.3) * (col("n_distinct").cast("double") / col("n_tok")) +
        lit(0.2) * (lit(1.0) - col("n_stop").cast("double") / col("n_tok")) +
        lit(0.2) * least(col("sum_chars").cast("double") / col("n_tok") / 8.0,
          lit(1.0))).as("quality"))
  }

  /** Token counting three ways: whitespace split, analyzer (regex-class)
    * tokens, and a bytes/4 BPE-cost estimate. */
  def tokenCounts(docs: DataFrame, id: String = "doc_id",
                  text: String = "text"): DataFrame =
    docs.select(col(id).as("id"),
      size(split(col(text), " ")).cast("long").as("ws_tokens"),
      size(TextFns.tokensAll(col(text))).cast("long").as("analyzer_tokens"),
      ceil(length(col(text)) / 4.0).cast("long").as("bpe_est"))

  /** Sliding-window chunking (RAG / long-context preprocessing): split a
    * doc's token stream into windows of `win` tokens advancing by
    * `win - overlap`; the final window is the (possibly short) remainder
    * and a doc shorter than `win` yields exactly one chunk. Pure per-row
    * explode — zero shuffle at any corpus size. Emits
    * (id, chunk, tok_start, tok_end, n_toks) in analyzer-token
    * coordinates. */
  def chunk(docs: DataFrame, win: Int, overlap: Int,
            id: String = "doc_id", text: String = "text"): DataFrame = {
    require(win > overlap && overlap >= 0, "need win > overlap >= 0")
    val step = win - overlap
    val n = size(TextFns.tokensAll(col(text))).cast("long")
    // chunk count: 1 + ceil(max(0, n - win) / step)
    val extra = greatest(n - win, lit(0L))
    val chunks = lit(1L) +
      ((extra + (step - 1)) / step).cast("long")
    docs.select(col(id).as("id"), n.as("n"), chunks.as("k"))
      .select(col("id"), col("n"),
        explode(sequence(lit(0L), col("k") - 1L)).as("chunk"))
      .select(col("id"), col("chunk"),
        (col("chunk") * step).as("tok_start"),
        least(col("chunk") * step + win, col("n")).as("tok_end"))
      .withColumn("n_toks", col("tok_end") - col("tok_start"))
  }

  /** GPT-style sequence packing: concatenate the corpus token stream in
    * (group, doc order) and cut it every `seqLen` tokens — no padding,
    * docs may SPAN a cut. Packing is per `group` (the per-shard packing
    * real pipelines run; a global order would serialize the cumsum).
    * Emits per doc: its token offset within the group stream, the first
    * and last sequence it lands in, and whether the doc is split across
    * a boundary. The cumsum window partitions by group — each group's
    * window is independent, so the shuffle is the groupBy's, nothing
    * global. */
  def pack(docs: DataFrame, seqLen: Int, group: String = "source",
           id: String = "doc_id", text: String = "text"): DataFrame = {
    val n = size(TextFns.tokensAll(col(text))).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.select(col(id).as("id"), col(group).as("grp"), n.as("n"))
      .withColumn("tok_start", coalesce(sum(col("n")).over(w), lit(0L)))
      .select(col("id"), col("grp"), col("n"), col("tok_start"),
        expr(s"tok_start div ${seqLen}L").as("seq_first"),
        // last token of the doc is tok_start + n - 1; an empty doc
        // stays in seq_first
        when(col("n") > 0L, expr(s"(tok_start + n - 1) div ${seqLen}L"))
          .otherwise(expr(s"tok_start div ${seqLen}L")).as("seq_last"))
      .withColumn("split", (col("seq_first") =!= col("seq_last")).cast("int"))
  }

  /** Canonical content fingerprint: md5 of the sorted distinct lowercase
    * token set (word-order / duplication insensitive — the classic
    * "fingerprint" clustering key). */
  def fingerprint(docs: DataFrame, id: String = "doc_id",
                  text: String = "text"): DataFrame =
    docs.select(col(id).as("id"),
      md5(array_join(array_sort(array_distinct(TextFns.tokensAll(col(text)))),
        " ")).as("fp"))

  /** Winnowing fingerprint (Schleimer, Wilkerson, Aiken — "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003): hash
    * every k-gram (rolling window of k tokens), slide a window of w
    * consecutive k-gram hashes, keep each window's minimum; the distinct
    * selected hashes are the document's fingerprint. Guarantees any
    * shared run of >= w+k-1 tokens yields a shared selected hash.
    * Output: (id, n_fp, fp) with fp = md5 over the sorted selected
    * hashes — entirely codegen'd column ops + one window function, so the
    * SQL oracle reproduces it exactly. */
  def winnow(docs: DataFrame, k: Int = 3, w: Int = 4,
             id: String = "doc_id", text: String = "text"): DataFrame = {
    val wins = winnowSelected(docs, k, w, id, text)
    docs.select(col(id).as("id"))
      .join(wins.groupBy("id")
        .agg(count(lit(1)).as("n_fp"),
          md5(array_join(array_sort(collect_list(col("wmin"))), ","))
            .as("fp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        coalesce(col("fp"), lit("")).as("fp"))
  }

  /** The winnowing SELECTION: distinct (id, wmin) selected-hash rows —
    * the reusable core of [[winnow]] and of substring-level dedup
    * (Dedup.substringPairs). Codegen'd columns + one window function. */
  def winnowSelected(docs: DataFrame, k: Int = 3, w: Int = 4,
                     id: String = "doc_id",
                     text: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = docs.select(col(id).as("id"),
        posexplode(TextFns.shingles(TextFns.tokensAll(col(text)), k))
          .as(Seq("pos", "shingle")))
      .select(col("id"), col("pos"), TextFns.md5Bits60(col("shingle")).as("h"))
    val nsh = sh.groupBy("id").agg(count(lit(1)).as("nsh"))
    sh.withColumn("wmin", min(col("h")).over(
        Window.partitionBy("id").orderBy("pos")
          .rowsBetween(Window.currentRow, w - 1)))
      .join(nsh, "id")
      .where(col("pos") <= col("nsh") - w) // complete windows only
      .select(col("id"), col("wmin")).distinct()
  }

  /** Benchmark decontamination: flag corpus docs sharing any word k-gram
    * with a benchmark/eval document set (the n-gram-overlap scrub LLM
    * training pipelines run against held-out eval sets). At real scale
    * the benchmark gram set is tiny next to the corpus (eval suites are
    * megabytes vs terabytes), so it broadcasts and the corpus side is
    * one exploded-gram scan + broadcast semi-join — no corpus shuffle.
    * Returns (doc_id, hits) = number of distinct shared k-grams, for
    * corpus docs (benchmark docs excluded) with hits > 0. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, k: Int = 8,
                    id: String = "doc_id",
                    text: String = "text"): DataFrame = {
    val grams = Dedup.docShingles(docs, k, id, text)
    val bg = Dedup.docShingles(benchmark, k, id, text)
      .select(col("shingle")).distinct()
    val bids = benchmark.select(col(id).as("id")).distinct()
    grams.join(broadcast(bg), "shingle")
      .join(broadcast(bids), Seq("id"), "left_anti")
      .groupBy(col("id").as(id)).agg(count(lit(1)).as("hits"))
  }

  /** Deterministic stratified sampling: per-class keep rates in permille,
    * keep rule = Knuth multiplicative hash of the id mod 1000 — the
    * data-mixture step of training-set assembly. Integer-exact, so the
    * sample is bit-stable across engines/runs, and it's a pure scan
    * predicate: no shuffle, no RNG state, pushes down to the source. */
  def sampleStratified(docs: DataFrame, permille: Map[String, Int],
                       id: String = "doc_id",
                       classCol: String = "lang"): DataFrame = {
    val rateCol = permille.foldLeft(lit(0)) { case (acc, (c, r)) =>
      when(col(classCol) === c, lit(r)).otherwise(acc)
    }
    // id is reduced mod a prime BEFORE the multiply: (1e9 * 2.65e9)
    // stays under Long.MaxValue, so the rule is overflow-free even at
    // 10^12-scale ids (DuckDB raises on BIGINT overflow; Spark wraps —
    // without the reduction the two engines would diverge)
    docs.where(
      ((col(id) % 1000000007L) * lit(2654435761L)) % 1000 < rateCol)
  }

  /** Deterministic domain mixing (pretraining data-recipe step, beyond
    * ref): choose per-class keep rates so the OUTPUT class mixture
    * matches `weights`, downsampling only. The output total is
    * maximized subject to keep-rate <= 1: with observed counts n_s and
    * normalized weights w_s, T = min_s(n_s / w_s) rows can be emitted
    * at the exact target mix; class s keeps ppm_s = floor(1e6 * w_s *
    * T / n_s) parts per million of its rows, selected by the same
    * overflow-free multiplicative hash as [[sampleStratified]], so the
    * subset is stable across runs and engines. Two jobs: one
    * class-count aggregate (class-cardinality bounded), one filtered
    * scan — no shuffle of the corpus.
    *
    * FP note: ppm is computed left-associated (((1e6 * w) * T) / n) in
    * ONE double expression on the driver; an oracle re-deriving it must
    * use the same association to stay bit-identical. */
  def mixDomains(docs: DataFrame, weights: Map[String, Double],
                 classCol: String = "source",
                 id: String = "doc_id"): DataFrame = {
    val counts = docs.groupBy(classCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wSum = weights.values.sum
    val present = weights.filter { case (c, w) => w > 0 && counts.contains(c) }
    require(present.nonEmpty, "no weighted class present in the data")
    val t = present.map { case (c, w) => counts(c) / (w / wSum) }.min
    val ppm = present.map { case (c, w) =>
      c -> math.floor(1000000.0 * (w / wSum) * t / counts(c)).toLong
    }
    val ppmCol = ppm.foldLeft(lit(0L)) { case (acc, (c, p)) =>
      when(col(classCol) === c, lit(p)).otherwise(acc)
    }
    docs.where(((col(id) % 1000000007L) * lit(2654435761L)) % 1000000L < ppmCol)
  }

  /** Blocklist scrub (the PII / badword redaction pass of a training
    * pipeline): replace regex matches with a redaction token and count
    * them. Email/phone/IP scrubbing is this same operator with the
    * corresponding patterns; one narrow codegen'd map, no shuffle. */
  def scrub(docs: DataFrame, pattern: String,
            token: String = "<SCRUBBED>", id: String = "doc_id",
            text: String = "text"): DataFrame =
    docs.select(col(id),
      regexp_replace(col(text), pattern, token).as("scrubbed"),
      regexp_count(col(text), lit(pattern)).cast("long").as("redactions"))

  /** Typed PII patterns for [[piiRedact]], applied in this order (email
    * first, then SSN before the phone pattern so the SSN's tail digits
    * can't be re-matched as a phone). Both regex dialects in play (Java
    * on the engine side, RE2 in the DuckDB oracle) agree on these
    * constructs — character classes, bounded repeats, \b. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\b[0-9]{3}-[0-9]{4}\\b", "<PHONE>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** PII redaction (the typed variant of [[scrub]] a training-data
    * pipeline actually ships): emails, SSNs, phone fragments, and IPv4
    * addresses replaced by typed placeholders, with per-type match
    * counts for audit. All codegen'd regexp columns — one scan, no
    * shuffle, at any corpus size. */
  def piiRedact(docs: DataFrame, id: String = "doc_id",
                text: String = "text"): DataFrame = {
    val redacted = PiiPatterns.foldLeft(col(text)) {
      case (c, (_, p, tok)) => regexp_replace(c, p, tok)
    }
    docs.select(col(id) +: redacted.as("redacted") +:
      PiiPatterns.map { case (name, p, _) =>
        regexp_count(col(text), lit(p)).cast("long").as(s"n_$name")
      }: _*)
  }

  /** Within-document repetition quality signals (the Gopher/"Scaling
    * Language Models" repetition filters, token-level analog): per doc,
    * the fraction of duplicate word bigrams and trigrams — 1 −
    * distinct/total. High values flag boilerplate/spam for removal
    * before training. Pure per-row collection functions: no explode, no
    * shuffle, pushes through a plain scan at any corpus size. */
  def repetition(docs: DataFrame, id: String = "doc_id",
                 text: String = "text"): DataFrame = {
    def dupFrac(toks: Column, k: Int) = {
      val sh = TextFns.shingles(toks, k)
      when(size(sh) > 0,
        round(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh), 6))
        .otherwise(lit(0.0))
    }
    val toks = TextFns.tokensAll(col(text))
    docs.select(col(id).as("id"),
      dupFrac(toks, 2).as("dup2_frac"),
      dupFrac(toks, 3).as("dup3_frac"))
  }

  /** Unigram-LM document scoring (the perplexity-proxy quality filter of
    * CCNet/RedPajama-style pipelines, with the corpus itself as the LM):
    * p(term) = ttf/Σttf over all docs; per doc emit token count and
    * Σ round(1e6·ln p(term)) in integer micro-nats, so cross-engine
    * comparison is exact (float additions never cross the shuffle in a
    * data-dependent order). Scale shape: the LM table is vocabulary-sized
    * → broadcast back onto one exploded-token scan; per-doc re-agg is the
    * only data-sized shuffle. */
  def lmLogProb(docs: DataFrame, id: String = "doc_id",
                text: String = "text",
                broadcastVocabLimit: Long = 1000000L): DataFrame = {
    val tok = docs.select(col(id).as("id"),
      explode(TextFns.tokensAll(col(text))).as("term"))
    val counts = tok.groupBy("term").agg(count(lit(1)).as("cnt")).cache()
    // one scalar collection stat, same posture as the index collStats
    val total = counts.agg(sum("cnt")).head().getLong(0)
    val lm = counts.select(col("term"),
      round(log(col("cnt").cast("double") / total) * 1e6).cast("long")
        .as("micro"))
    // broadcast only while the LM fits (results identical either way):
    // at the 10^8-term vocabulary SCALE.md projects, a vocabulary-sized
    // broadcast is multi-GB per executor — past the limit this becomes a
    // plain shuffle hash join on term (the token side is exploded and
    // shuffling anyway for the per-doc re-agg)
    val lmSide = if (counts.count() <= broadcastVocabLimit) broadcast(lm) else lm
    tok.join(lmSide, "term")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tok"), sum("micro").as("sum_micro"))
  }
}
