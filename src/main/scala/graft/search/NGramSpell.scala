package graft.search

import org.apache.spark.sql.{Dataset, SparkSession}

/** Classic n-gram SpellChecker — the engine behind Solr's
  * IndexBasedSpellChecker / FileBasedSpellChecker (reference
  * lucene/suggest/src/java/org/apache/lucene/search/spell/SpellChecker.java:
  * 69-585, SuggestWordQueue.java:31-80).
  *
  * Semantics replicated:
  *  - auxiliary n-gram index: per dictionary word of length L (words with
  *    L<3 are never indexed, SpellChecker.java:517), fields gramN (all
  *    N-grams, with term freqs), startN (first gram) and endN (last gram)
  *    for N in [getMin(L), getMax(L)] (createDocument/addGram,
  *    SpellChecker.java:569-603; bands :548-566);
  *  - candidate draw: boolean OR over the QUERY word's grams at its own
  *    band (duplicate grams stay duplicate clauses), start gram boosted
  *    2.0 and end gram 1.0 (:340-361), top 10*numSug by the spell index's
  *    default TFIDF similarity (no norms — StringField omits them), ties
  *    by insertion order = dictionary (term-sorted) order;
  *  - re-rank: StringDistance score with a DYNAMIC accuracy floor (once
  *    the queue is full, accuracy becomes the queue minimum — :396-401),
  *    the word itself skipped, and with a user index: freq gates
  *    (freq<1 always; goalFreq>freq under SUGGEST_MORE_POPULAR), plus the
  *    SUGGEST_WHEN_NOT_IN_INDEX short-circuit returning the word itself
  *    (:330-334). The dynamic floor is order-sensitive under the
  *    frequency comparator, so the loop is replayed verbatim, not reduced
  *    to a top-k.
  *
  * Spark shape: the candidate draw is two narrow passes over the
  * dictionary frame — one keyed agg for the matched grams' document
  * frequencies (the idf inputs), one flatMap+agg+bounded-top-k for the
  * candidate scores. Everything after runs on the <=10*numSug-row
  * driver-side slice. No full postings ever move; at cluster scale the
  * dictionary is the term-stats table (orders of magnitude smaller than
  * postings).
  */
object NGramSpell {

  final case class SuggestWord(string: String, score: Float, freq: Long)

  sealed trait Mode
  /** SuggestMode.SUGGEST_WHEN_NOT_IN_INDEX */ case object WhenNotInIndex extends Mode
  /** SuggestMode.SUGGEST_MORE_POPULAR */      case object MorePopular extends Mode
  /** SuggestMode.SUGGEST_ALWAYS */            case object Always extends Mode

  /** Length band (SpellChecker.java:548-566). */
  def getMin(l: Int): Int = if (l > 5) 3 else if (l == 5) 2 else 1
  def getMax(l: Int): Int = if (l > 5) 4 else if (l == 5) 3 else 2

  private def formGrams(text: String, ng: Int): Array[String] =
    Array.tabulate(math.max(0, text.length - ng + 1))(i => text.substring(i, i + ng))

  /** The query's boolean clauses: (field, gram, boost), duplicates kept
    * (SpellChecker.java:340-361 adds every gram occurrence). */
  def queryClauses(word: String): Seq[(String, String, Float)] = {
    val out = Seq.newBuilder[(String, String, Float)]
    val l = word.length
    var ng = getMin(l)
    while (ng <= getMax(l)) {
      val grams = formGrams(word, ng)
      if (grams.nonEmpty) {
        out += (("start" + ng, grams(0), 2.0f))
        out += (("end" + ng, grams(grams.length - 1), 1.0f))
        grams.foreach(g => out += (("gram" + ng, g, 1.0f)))
      }
      ng += 1
    }
    out.result()
  }

  /** What a dictionary word indexes: (field, gram) -> tf
    * (createDocument/addGram; gramN carries freqs, startN/endN are
    * single-valued). */
  def indexEntries(word: String): Map[(String, String), Int] = {
    val m = scala.collection.mutable.HashMap.empty[(String, String), Int]
    val l = word.length
    var ng = getMin(l)
    while (ng <= getMax(l)) {
      val grams = formGrams(word, ng)
      if (grams.nonEmpty) {
        m(("start" + ng, grams(0))) = 1
        m(("end" + ng, grams(grams.length - 1))) = 1
        grams.foreach { g =>
          val k = ("gram" + ng, g); m(k) = m.getOrElse(k, 0) + 1
        }
      }
      ng += 1
    }
    m.toMap
  }

  /** TFIDF candidate value (ClassicSimilarity, no norms; queryNorm is a
    * constant scale and is dropped): coord * sum over matched clauses of
    * sqrt(tf) * idf^2 * boost. Returns Float.MinValue when nothing
    * matches (the word is not a hit at all). */
  def candidateValue(entries: Map[(String, String), Int],
                     clauses: Seq[(String, String, Float)],
                     idf: Map[(String, String), Float]): Float = {
    var sum = 0f
    var overlap = 0
    clauses.foreach { case (f, g, b) =>
      entries.get((f, g)) match {
        case Some(tf) =>
          val i = idf.getOrElse((f, g), 1f)
          sum += math.sqrt(tf.toDouble).toFloat * i * i * b
          overlap += 1
        case None =>
      }
    }
    if (overlap == 0) Float.MinValue
    else sum * (overlap.toFloat / clauses.length)
  }

  /** idf exactly as TFIDFSimilarity: (float)(ln(maxDoc/(df+1)) + 1). */
  def idfOf(maxDoc: Long, df: Long): Float =
    (math.log(maxDoc.toDouble / (df + 1).toDouble) + 1.0).toFloat

  /** Replay of the suggestSimilar re-rank loop (SpellChecker.java:
    * 368-410) over candidates IN HIT ORDER. `userDf` None = ir==null =
    * SUGGEST_ALWAYS semantics. `byFrequency` selects
    * SuggestWordFrequencyComparator (freq, then score, then reversed
    * string) instead of the default score comparator. */
  def assemble(word: String, numSug: Int, candidates: Seq[String],
               mode: Mode, accuracy: Float,
               distance: (String, String) => Float,
               userDf: Option[String => Long],
               byFrequency: Boolean = false): Seq[SuggestWord] = {
    val effMode = if (userDf.isEmpty) Always else mode
    val wordFreq = userDf.map(f => f(word)).getOrElse(0L)
    if (effMode == WhenNotInIndex && wordFreq > 0)
      return Seq(SuggestWord(word, 0f, wordFreq))
    val goalFreq = if (effMode == MorePopular) wordFreq else 0L

    // SuggestWordQueue.lessThan via the chosen comparator (ties on
    // (score,freq) broken by REVERSED string compare in both).
    def cmp(a: SuggestWord, b: SuggestWord): Int = {
      val c1 =
        if (byFrequency) {
          val f = java.lang.Long.compare(a.freq, b.freq)
          if (f != 0) f else java.lang.Float.compare(a.score, b.score)
        } else {
          val s = java.lang.Float.compare(a.score, b.score)
          if (s != 0) s else java.lang.Long.compare(a.freq, b.freq)
        }
      if (c1 != 0) c1 else b.string.compareTo(a.string)
    }
    val pq = new scala.collection.mutable.PriorityQueue[SuggestWord]()(
      Ordering.fromLessThan[SuggestWord]((a, b) => cmp(a, b) > 0)) // head = least

    var acc = accuracy
    candidates.foreach { cand =>
      if (cand != word) {
        val score = distance(word, cand)
        if (score >= acc) {
          val freq = userDf.map(f => f(cand)).getOrElse(0L)
          val gateOk = userDf.isEmpty ||
            (freq >= 1 && !(effMode == MorePopular && goalFreq > freq))
          if (gateOk) {
            val sw = SuggestWord(cand, score, freq)
            if (pq.size < numSug) pq.enqueue(sw)
            else if (cmp(pq.head, sw) < 0) { pq.dequeue(); pq.enqueue(sw) }
            if (pq.size == numSug) acc = pq.head.score
          }
        }
      }
    }
    pq.dequeueAll.reverse.toSeq // least-first pop, reversed = best first
  }

  /** Pure local end-to-end (the spec surface; identical math to the
    * distributed path): dictionary (word, userFieldDf). */
  def suggestLocal(dict: Seq[(String, Long)], word: String, numSug: Int,
                   mode: Mode = Always, accuracy: Float = 0.5f,
                   distance: (String, String) => Float = StringDistances.levenshtein,
                   restrictToUserField: Boolean = false,
                   userField: Map[String, Long] = Map.empty,
                   byFrequency: Boolean = false): Seq[SuggestWord] = {
    val indexed = dict.collect { case (w, _) if w.length >= 3 => w }.distinct.sorted
    val clauses = queryClauses(word)
    val entries = indexed.map(w => w -> indexEntries(w))
    val clauseKeys = clauses.map(c => (c._1, c._2)).toSet
    val df = scala.collection.mutable.HashMap.empty[(String, String), Long]
    entries.foreach { case (_, e) =>
      e.keysIterator.filter(clauseKeys).foreach(k => df(k) = df.getOrElse(k, 0L) + 1)
    }
    val idf = df.map { case (k, d) => k -> idfOf(indexed.size.toLong, d) }.toMap
    val cands = entries
      .map { case (w, e) => (w, candidateValue(e, clauses, idf)) }
      .filter(_._2 != Float.MinValue)
      .sortBy { case (w, v) => (-v, w) } // ties -> insertion (term-sorted) order
      .take(10 * numSug)
      .map(_._1)
    // SUGGEST_ALWAYS nulls the user reader (SpellChecker.java:323-326).
    val userDf =
      if (restrictToUserField && mode != Always)
        Some((w: String) => userField.getOrElse(w, 0L))
      else None
    assemble(word, numSug, cands, mode, accuracy, distance, userDf, byFrequency)
  }

  /** Distributed candidate draw + driver-side re-rank. `dict` is the
    * spell dictionary with the USER FIELD's document frequency per word
    * (e.g. the term-stats frame); `restrictToUserField`=false is
    * SUGGEST_ALWAYS (ir==null). Two narrow dictionary passes; the
    * re-rank runs on <=10*numSug rows. */
  def suggest(spark: SparkSession, dict: Dataset[(String, Long)],
              word: String, numSug: Int, mode: Mode = Always,
              accuracy: Float = 0.5f,
              distance: (String, String) => Float = StringDistances.levenshtein,
              restrictToUserField: Boolean = false,
              byFrequency: Boolean = false): Seq[SuggestWord] = {
    import spark.implicits._
    val clauses = queryClauses(word)
    val clauseKeys = clauses.map(c => (c._1, c._2)).toSet
    val indexed = dict.filter(_._1.length >= 3)

    // Pass 1: df of each matched (field, gram) + maxDoc, one agg each.
    val maxDoc = indexed.map(_._1).distinct().count()
    val df = indexed
      .flatMap { case (w, _) =>
        indexEntries(w).keysIterator.filter(clauseKeys).map(k => (k._1, k._2))
      }
      .groupByKey(identity).count().collect()
      .map { case (k, d) => (k: (String, String)) -> d }.toMap
    val idf = df.map { case (k, d) => k -> idfOf(maxDoc, d) }
    val bIdf = spark.sparkContext.broadcast(idf)

    // Pass 2: candidate values, bounded top-k (ties -> word asc =
    // insertion order of a term-sorted dictionary build).
    val maxHits = 10 * numSug
    val cands = indexed
      .map { case (w, udf0) =>
        (w, udf0, candidateValue(indexEntries(w), clauses, bIdf.value))
      }
      .filter(_._3 != Float.MinValue)
      .toDF("word", "udf", "value")
      .orderBy(org.apache.spark.sql.functions.col("value").desc,
        org.apache.spark.sql.functions.col("word").asc)
      .limit(maxHits)
      .as[(String, Long, Float)]
      .collect()

    val userDfMap = cands.map(c => c._1 -> c._2).toMap
    // SUGGEST_ALWAYS nulls the user reader (SpellChecker.java:323-326).
    val restrict = restrictToUserField && mode != Always
    val wordUdf: Long =
      if (!restrict) 0L
      else dict.filter(_._1 == word).map(_._2).take(1).headOption.getOrElse(0L)
    val userDf =
      if (restrict)
        Some((w: String) => if (w == word) wordUdf else userDfMap.getOrElse(w, 0L))
      else None
    assemble(word, numSug, cands.map(_._1).toSeq, mode, accuracy, distance,
      userDf, byFrequency)
  }
}
