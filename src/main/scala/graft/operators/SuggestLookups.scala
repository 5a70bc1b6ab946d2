package graft.operators

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Legacy in-memory suggester lookups and the dictionary sources that feed
  * suggesters / spellcheckers:
  *
  *  - TSTLookup (reference suggest/tst/TSTLookup.java:55-150 +
  *    tst/TSTAutocomplete.java:40-165): ternary search trie built by
  *    median-first insertion over the UTF16-sorted key list
  *    (balancedTree), looked up by a stack-DFS whose pop order is
  *    hiKid, loKid, eqKid — a quirky, deterministic traversal order.
  *  - JaspellLookup (suggest/jaspell/JaspellLookup.java:103-140 +
  *    jaspell/JaspellTernarySearchTrie.java:694-705,857-905): matchPrefix
  *    = the first `count` prefix matches in LEXICOGRAPHIC order (in-order
  *    BST walk, structure-independent), where count = num for the plain
  *    mode but num*2 for onlyMorePopular — the popular mode ranks only
  *    that lexicographic head slice (kept quirk).
  *  - Lookup.LookupPriorityQueue (suggest/Lookup.java:153-178): weight-only
  *    lessThan; at capacity an equal-weight insert is REJECTED, so
  *    earlier-traversed keys survive ties.
  *  - HighFrequencyDictionary (spell/HighFrequencyDictionary.java:30-60):
  *    terms with df >= (int)(thresh * numDocs), weight = df.
  *  - FileDictionary (suggest/FileDictionary.java:108-214) /
  *    PlainTextDictionary (spell/PlainTextDictionary.java): line parsing
  *    with the reference's quirks (see fileDictionary).
  *  - DocumentDictionary (suggest/DocumentDictionary.java:60-150): one
  *    entry per live doc with a non-null suggest field.
  *
  * Spark-first shape: the dictionary lives distributed (at scale it is the
  * index term dictionary — a term-sorted, row-group-prunable parquet
  * range scan); a lookup pulls only the prefix-matched slice plus two
  * scalar aggregates and replays the reference's in-memory traversal on
  * that bounded slice. The TST traversal order depends on the GLOBAL
  * median-first insertion order; it is replayed exactly from
  * (N, rank-range) by a pruned median recursion — O(m·log N) driver work,
  * never a full-dictionary collect.
  */
object SuggestLookups {

  final case class Result(key: String, weight: Long)

  // ------------- Lookup.LookupPriorityQueue replica -------------

  /** Lucene PriorityQueue (1-based array heap) with the LookupResult
    * lessThan (weight only). insertWithOverflow rejects an element that
    * is not strictly greater than the current top. */
  final class LookupPQ(maxSize: Int) {
    private val heap = new Array[Result](maxSize + 1)
    private var sz = 0
    private def less(a: Result, b: Result): Boolean = a.weight < b.weight
    def insertWithOverflow(r: Result): Unit = {
      if (sz < maxSize) {
        sz += 1; heap(sz) = r; upHeap()
      } else if (sz > 0 && less(heap(1), r)) {
        heap(1) = r; downHeap()
      }
    }
    private def upHeap(): Unit = {
      var i = sz
      val node = heap(i)
      var j = i >>> 1
      while (j > 0 && less(node, heap(j))) { heap(i) = heap(j); i = j; j = j >>> 1 }
      heap(i) = node
    }
    private def downHeap(): Unit = {
      var i = 1
      val node = heap(i)
      var j = i << 1
      var k = j + 1
      if (k <= sz && less(heap(k), heap(j))) j = k
      while (j <= sz && less(heap(j), node)) {
        heap(i) = heap(j); i = j
        j = i << 1; k = j + 1
        if (k <= sz && less(heap(k), heap(j))) j = k
      }
      heap(i) = node
    }
    private def pop(): Result = {
      val top = heap(1); heap(1) = heap(sz); sz -= 1; downHeap(); top
    }
    /** Top results in DESCENDING weight order (Lookup.getResults). */
    def results(): Seq[Result] = {
      val out = new Array[Result](sz)
      var i = sz - 1
      while (i >= 0) { out(i) = pop(); i -= 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
  }

  // ------------- TSTAutocomplete replica -------------

  private final class Node(val splitchar: Char) {
    var lo: Node = null
    var eq: Node = null
    var hi: Node = null
    var token: String = null
    var weight: Long = 0L
  }

  /** TSTAutocomplete.insert (verbatim semantics, including the dummy
    * NUL-splitchar root that TSTLookup.build allocates — every
    * real key hangs off its hiKid). */
  private def insert(node0: Node, s: String, w: Long, x: Int): Node = {
    if (s.length <= x) return node0
    var node = node0
    if (node == null) {
      node = new Node(s.charAt(x))
      if (x < s.length - 1) node.eq = insert(node.eq, s, w, x + 1)
      else { node.token = s; node.weight = w }
    } else if (node.splitchar > s.charAt(x)) {
      node.lo = insert(node.lo, s, w, x)
    } else if (node.splitchar == s.charAt(x)) {
      if (x < s.length - 1) node.eq = insert(node.eq, s, w, x + 1)
      else { node.token = s; node.weight = w }
    } else {
      node.hi = insert(node.hi, s, w, x)
    }
    node
  }

  /** TSTAutocomplete.prefixCompletion: walk to the prefix-end node, then
    * stack-DFS its eqKid subtree (push eq, lo, hi -> pop hi, lo, eq). */
  private def prefixCompletion(root: Node, s: String): Seq[Result] = {
    var p = root
    var x = 0
    var break = false
    while (p != null && !break) {
      if (s.charAt(x) < p.splitchar) p = p.lo
      else if (s.charAt(x) == p.splitchar) {
        if (x == s.length - 1) break = true
        else { x += 1; p = p.eq }
      } else p = p.hi
    }
    val suggest = ArrayBuffer.empty[Result]
    if (p == null) return suggest.toSeq
    if (p.eq == null && p.token == null) return suggest.toSeq
    if (p.eq == null && p.token != null) {
      suggest += Result(p.token, p.weight)
      return suggest.toSeq
    }
    if (p.token != null) suggest += Result(p.token, p.weight)
    var st = List(p.eq)
    while (st.nonEmpty) {
      val top = st.head
      st = st.tail
      if (top.token != null) suggest += Result(top.token, top.weight)
      if (top.eq != null) st = top.eq :: st
      if (top.lo != null) st = top.lo :: st
      if (top.hi != null) st = top.hi :: st
    }
    suggest.toSeq
  }

  /** Global median-first insertion order (TSTAutocomplete.balancedTree:
    * insert mid, then the left half, then the right half) restricted to
    * sorted ranks [a, b) — the relative insertion order of a contiguous
    * key range, computed WITHOUT materializing the other N - (b-a) keys.
    * Pruned recursion: O((b-a) + log N) interval visits. */
  def medianOrder(n: Long, a: Long, b: Long): Seq[Long] = {
    val out = ArrayBuffer.empty[Long]
    def rec(lo: Long, hi: Long): Unit = {
      if (lo > hi || hi < a || lo >= b) return
      val mid = (lo + hi) / 2
      if (mid >= a && mid < b) out += mid
      rec(lo, mid - 1)
      rec(mid + 1, hi)
    }
    rec(0L, n - 1L)
    out.toSeq
  }

  /** Local TSTLookup replay over the FULL key list (keys must already be
    * sorted): build + lookup exactly as the reference. Spec surface and
    * the ground truth the distributed path is differential-tested
    * against. */
  def tstLookupLocal(sortedKeys: Seq[(String, Long)], prefix: String,
                     num: Int, onlyMorePopular: Boolean): Seq[Result] = {
    val root = new Node('\u0000')
    medianOrder(sortedKeys.length.toLong, 0L, sortedKeys.length.toLong)
      .foreach { r =>
        val (k, w) = sortedKeys(r.toInt)
        insert(root, k, w, 0)
      }
    finishTst(prefixCompletion(root, prefix), num, onlyMorePopular)
  }

  private def finishTst(list: Seq[Result], num: Int,
                        onlyMorePopular: Boolean): Seq[Result] =
    if (list.isEmpty) Nil
    else if (onlyMorePopular) {
      val pq = new LookupPQ(num)
      list.foreach(pq.insertWithOverflow)
      pq.results()
    } else list.take(math.min(num, list.length))

  /** Distributed TSTLookup: two scalar aggregates (N, rank of the prefix
    * range) + one bounded prefix-slice collect, then the exact driver
    * replay. The prefix-sharing keys form a contiguous sorted range, and
    * only they can populate the eqKid subtree the DFS traverses, so the
    * replay over the slice — inserted in the global median order of its
    * ranks — reproduces the full tree's answer bit-for-bit.
    *
    * Sort-order caveat: the reference sorts keys in UTF16 order; Spark
    * compares strings in code-point order. They agree outside the
    * surrogate range (all our dictionaries). `maxExpand` guards the
    * collect (TooManyClauses posture). */
  def tstLookup(dict: DataFrame, prefix: String, num: Int,
                onlyMorePopular: Boolean, maxExpand: Int = 100000): Seq[Result] = {
    val spark = dict.sparkSession
    import spark.implicits._
    val n = dict.count()
    val a = dict.where(col("term") < lit(prefix)).count()
    val matched = dict.where(col("term").startsWith(prefix))
      .orderBy("term")
      .select(col("term"), col("weight").cast("long"))
      .as[(String, Long)].collect()
    require(matched.length <= maxExpand,
      s"tstLookup: prefix '$prefix' expands to ${matched.length} > $maxExpand keys")
    val root = new Node('\u0000')
    medianOrder(n, a, a + matched.length).foreach { r =>
      val (k, w) = matched((r - a).toInt)
      insert(root, k, w, 0)
    }
    finishTst(prefixCompletion(root, prefix), num, onlyMorePopular)
  }

  // ------------- JaspellLookup replica -------------

  /** JaspellLookup.lookup (usePrefix = true, the default): matchPrefix
    * yields the first `count` prefix matches in lexicographic order
    * (count = num, or num*2 under onlyMorePopular), then the plain mode
    * returns that head directly while the popular mode weight-ranks ONLY
    * that slice through the LookupPriorityQueue. One ordered prefix
    * range scan + LIMIT — the trie walk's in-order traversal is
    * structure-independent, so no replay is needed. */
  def jaspellLookup(dict: DataFrame, prefix: String, num: Int,
                    onlyMorePopular: Boolean): Seq[Result] = {
    val spark = dict.sparkSession
    import spark.implicits._
    val count = if (onlyMorePopular) num * 2 else num
    val list = dict.where(col("term").startsWith(prefix))
      .orderBy("term")
      .select(col("term"), col("weight").cast("long"))
      .limit(count)
      .as[(String, Long)].collect()
      .map { case (k, w) => Result(k, w) }.toSeq
    if (list.isEmpty) Nil
    else if (onlyMorePopular) {
      val pq = new LookupPQ(num)
      list.foreach(pq.insertWithOverflow)
      pq.results()
    } else list.take(math.min(num, list.length))
  }

  /** Local ground truth for the spec: full in-order walk. */
  def jaspellLookupLocal(keys: Seq[(String, Long)], prefix: String,
                         num: Int, onlyMorePopular: Boolean): Seq[Result] = {
    val count = if (onlyMorePopular) num * 2 else num
    val list = keys.filter(_._1.startsWith(prefix)).sortBy(_._1)
      .take(count).map { case (k, w) => Result(k, w) }
    if (list.isEmpty) Nil
    else if (onlyMorePopular) {
      val pq = new LookupPQ(num)
      list.foreach(pq.insertWithOverflow)
      pq.results()
    } else list.take(math.min(num, list.length))
  }

  // ------------- FSTCompletionLookup replica -------------

  /** FSTCompletionLookup / FSTCompletion (reference suggest/fst/
    * FSTCompletionLookup.java:95-150 build, fst/FSTCompletion.java:150-230
    * lookup): weights are DISCRETIZED into `buckets` buckets — entries
    * sort by (weight asc, key asc); line L gets bucket L*buckets/N, and a
    * run of EQUAL weights inherits the run-start's bucket. Lookup returns
    * the BUCKET as the result value (the original weight is gone).
    * Popular mode walks buckets highest-first, lexicographic within a
    * bucket — i.e. (bucket desc, key asc) — and exactMatchFirst promotes
    * the exact key to the front (fetching its bucket from anywhere in the
    * structure if it wasn't in the top num). The alphabetical mode
    * re-sorts all matches by key and does NOT apply the exact-first
    * reorder (lookupSortedAlphabetically bypasses it).
    *
    * Distributed shape: bucket boundaries come from a per-DISTINCT-weight
    * frame (one row per distinct weight — a cumulative count over that
    * small frame, never over N); the prefix slice joins its buckets and
    * only `num` rows reach the driver. */
  def fstCompletion(dict: DataFrame, prefix: String, num: Int,
                    buckets: Int = 10, exactFirst: Boolean = true,
                    popular: Boolean = true): Seq[Result] = {
    val spark = dict.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val n = dict.count()
    if (n == 0) return Nil
    val wcnt = dict.groupBy(col("weight")).agg(count(lit(1)).as("c"))
    val cum = W.orderBy(col("weight"))
      .rowsBetween(W.unboundedPreceding, -1)
    val bucketF = wcnt
      .withColumn("runStart", coalesce(sum(col("c")).over(cum), lit(0L)))
      .select(col("weight"),
        expr(s"(runStart * $buckets) div ${n}L").cast("long").as("bucket"))
    val matched = dict.where(col("term").startsWith(prefix))
      .join(bucketF, "weight")
    val ordered =
      if (popular) matched.orderBy(col("bucket").desc, col("term").asc)
      else matched.orderBy(col("term").asc)
    var head = ordered.select(col("term"), col("bucket"))
      .limit(num).as[(String, Long)].collect().toSeq
    if (popular && exactFirst) {
      val at = head.indexWhere(_._1 == prefix)
      if (at >= 0) head = head(at) +: (head.take(at) ++ head.drop(at + 1))
      else {
        val exact = dict.where(col("term") === prefix).join(bucketF, "weight")
          .select(col("term"), col("bucket")).as[(String, Long)].collect()
        if (exact.nonEmpty) head = exact.head +: head.take(num - 1)
      }
    }
    head.map { case (t, b) => Result(t, b) }
  }

  // ------------- dictionary sources -------------

  /** HighFrequencyDictionary: terms of the field whose df >=
    * (int)(thresh * numDocs) — note the reference's int truncation —
    * weight = df. One predicate over the term-stats frame. */
  def highFrequency(termStats: DataFrame, numDocs: Long,
                    thresh: Float): DataFrame = {
    val minNumDocs = (thresh * numDocs.toFloat).toInt
    termStats.where(col("df") >= lit(minNumDocs.toLong))
      .select(col("term"), col("df").cast("long").as("weight"))
  }

  /** FileDictionary line parse (suggest/FileDictionary.java:108-214):
    * fields = line.split(delim regex); more than 3 fields is an error;
    * 3 = (term, weight, payload), 2 = (term, weight), 1 = term with
    * weight 1. Weight parses as a long, falling back to (long) of a
    * double parse ("keep reading floats for bw compat"). Payload quirks
    * kept: whether the dictionary HAS payloads is decided by the FIRST
    * line alone — later 3-field lines drop their payload if the first
    * line had fewer, and later short lines emit an EMPTY (not absent)
    * payload if the first line had three. */
  def fileDictionary(lines: Seq[String],
                     delim: String = "\t"): Seq[(String, Long, Option[String])] = {
    if (lines.isEmpty) return Nil
    def parse(line: String): (String, Long, Option[String]) = {
      val fields = line.split(delim)
      require(fields.length <= 3, "More than 3 fields in one line")
      def weightOf(s: String): Long =
        try s.toLong catch { case _: NumberFormatException => s.toDouble.toLong }
      fields.length match {
        case 3 => (fields(0), weightOf(fields(1)), Some(fields(2)))
        case 2 => (fields(0), weightOf(fields(1)), None)
        case _ => (fields(0), 1L, None)
      }
    }
    val first = parse(lines.head)
    val hasPayloads = first._3.isDefined
    lines.map { line =>
      val (t, w, p) = parse(line)
      if (hasPayloads) (t, w, Some(p.getOrElse(""))) else (t, w, None)
    }
  }

  /** PlainTextDictionary: one word per line, weight 1 (the
    * FileBasedSpellChecker source). */
  def plainText(lines: Seq[String]): Seq[(String, Long)] =
    lines.map((_, 1L))

  /** DocumentDictionary: one entry per live doc whose suggest `field` is
    * non-null; weight = the numeric `weightField` (0 when absent); when a
    * `payloadField` is configured, docs MISSING it are skipped entirely
    * (the reference `continue`s before emitting). Pure projection +
    * filters — fully distributed, feeds Suggest.analyzing/wfst. */
  def documentDictionary(docs: DataFrame, field: String,
                         weightField: Option[String],
                         payloadField: Option[String] = None): DataFrame = {
    val base = docs.where(col(field).isNotNull)
    val withPayload = payloadField match {
      case Some(p) => base.where(col(p).isNotNull)
        .select(col(field).as("surface"),
          weightField.map(w => coalesce(col(w).cast("long"), lit(0L)))
            .getOrElse(lit(0L)).as("weight"),
          col(p).cast("string").as("payload"))
      case None => base.select(col(field).as("surface"),
        weightField.map(w => coalesce(col(w).cast("long"), lit(0L)))
          .getOrElse(lit(0L)).as("weight"))
    }
    withPayload
  }
}
