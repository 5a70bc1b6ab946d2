package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Solr AnalyticsComponent (solr/contrib/analytics) re-expressed on
  * Spark: per-request statistics over value sources with an expression
  * algebra on top, computed for the whole matched set ("no facet"), per
  * field-facet bucket, per range-facet bucket, or per query-facet bucket.
  *
  * Reference semantics reproduced exactly:
  *  - `MinMaxStatsCollector.java:30-90` — count = number of EXISTING
  *    values, missing counted separately; min/max over any comparable
  *    source (numeric or string).
  *  - `NumericStatsCollector.java:28-58` — sum, sumofsquares,
  *    mean = sum/count (0 when count==0), stddev = POPULATION form
  *    sqrt(sumOfSquares/count - mean*mean) and 0.0 when count <= 1
  *    (contrast StatsComponent's sample stddev).
  *  - `UniqueStatsCollector.java` — distinct value count.
  *  - `util/MedianCalculator.java:38-50` — with size = n-1:
  *    firstIdx = floor(.5*size), secondIdx = firstIdx+1 when size is odd
  *    else firstIdx, median = .5*sorted[firstIdx] + .5*sorted[secondIdx];
  *    0 for an empty list.
  *  - `util/PercentileCalculator.java:38-53` — SELECTION, not
  *    interpolation: result = sorted[round(p*n - .5)] = sorted[floor(p*n)]
  *    (0-based); null for an empty list.
  *  - `expression/ExpressionFactory.java:40-139` — the grammar:
  *    stat(source), percentile(P,source) (the P is split off the FIRST
  *    comma of the whole expression), const_num/const_str, neg/abs/rev
  *    single-delegates, add/mult/concat multi-delegates, div/pow/log
  *    dual-delegates (log(a,b) = ln(a)/ln(b),
  *    `DualDelegateExpression.java:64-70`); null propagates through every
  *    operator. Escapes: `\(`, `\)`, `\,` inside an argument list
  *    (`ExpressionFactory.getArguments:113-135`).
  *  - `accumulator/FacetingAccumulator.java:330-355` — field-facet
  *    buckets sort by one named expression (ties keep the TreeMap's
  *    facet-value order — sort is stable), then offset/limit apply.
  *  - `util/RangeEndpointCalculator.java:75-150` — the gap LIST cycles
  *    forward one bucket at a time and the last gap repeats; without
  *    hardend the END EXTENDS to the last bucket's high edge (and the
  *    extended end is what `after`/`between` and the EDGE include flag
  *    see); include flags lower/upper/edge/outer/all decide per-bucket
  *    boundary closedness exactly as Solr facet.range.
  *
  * Scale shape: one groupBy per (bucket keys) computes every
  * counter-style stat map-side-combined; median/percentile use a
  * distributed rank selection — a (bucket, value) histogram, cumulative
  * counts to [lo,hi] rank runs, and an equi-join of the O(#buckets x
  * #wanted-stats) rank targets against the run holding each rank. For
  * NUMERIC sources the selection is two-phase so a continuous source
  * (distinct ~ n) never funnels a whole bucket through one window task:
  * a coarse per-(bucket, 16-bit monotone value-range) histogram locates
  * the range holding each wanted rank (cumulative window over <= 65536
  * rows per bucket), then the exact pass runs over only the located
  * ranges, partitioned by (bucket, range). No per-bucket list is ever
  * materialized.
  */
object Analytics {

  // ---------- expression AST (ExpressionFactory.java:40-139) ----------

  sealed trait AExpr
  final case class Stat(stat: String, source: String) extends AExpr
  /** percentile(P, source); `label` keeps the raw P text (the reference's
    * stat key is "percentile_"+raw — AnalyticsParams.STAT_PERCENTILE). */
  final case class Pctl(label: String, p: Double, source: String) extends AExpr
  final case class ConstNum(v: Double) extends AExpr
  final case class ConstStr(v: String) extends AExpr
  /** const_date(ISO-8601) — ConstantDateExpression (TrieDateField parse). */
  final case class ConstDate(iso: String) extends AExpr
  /** date_math(date, mathStr...) — DateMathExpression: the math strings
    * apply successively to the date value (DateMathParser.parseMath). */
  final case class DateMathE(as: Seq[AExpr]) extends AExpr
  final case class Neg(a: AExpr) extends AExpr
  final case class Abs(a: AExpr) extends AExpr
  final case class Rev(a: AExpr) extends AExpr
  final case class Add(as: Seq[AExpr]) extends AExpr
  final case class Mult(as: Seq[AExpr]) extends AExpr
  final case class ConcatE(as: Seq[AExpr]) extends AExpr
  final case class Div(a: AExpr, b: AExpr) extends AExpr
  final case class Pow(a: AExpr, b: AExpr) extends AExpr
  final case class LogE(a: AExpr, b: AExpr) extends AExpr

  private val StatNames = Set("count", "missing", "sum", "sumofsquares",
    "stddev", "mean", "unique", "median", "percentile", "min", "max")

  /** `ExpressionFactory.create`: top operation = text before the first
    * '(', operands = text inside the OUTERMOST parens. */
  def parse(expression: String): AExpr = {
    val e = expression.trim
    val paren = e.indexOf('(')
    require(paren > 0, s"expression [$e] has no arguments")
    val top = e.substring(0, paren).trim
    val operands = e.substring(paren + 1, e.lastIndexOf(')')).trim
    if (StatNames.contains(top)) {
      if (top == "percentile") {
        // the P operand is split off the FIRST comma of the WHOLE
        // expression, the rest is the value-source string verbatim
        // (ExpressionFactory.java:59-61)
        val raw = e.substring(e.indexOf('(') + 1, e.indexOf(',')).trim
        val src = e.substring(e.indexOf(',') + 1, e.lastIndexOf(')')).trim
        Pctl(raw, raw.toDouble / 100.0, src)
      } else Stat(top, operands)
    } else top match {
      case "const_num" => ConstNum(operands.toDouble)
      // const_str keeps operands VERBATIM (no trim — :88-90 re-slices)
      case "const_str" =>
        ConstStr(e.substring(paren + 1, e.lastIndexOf(')')))
      case "const_date" => ConstDate(operands)
      case _ =>
        val args = getArguments(operands).map(parse)
        (top, args) match {
          case ("neg", Seq(a))    => Neg(a)
          case ("abs", Seq(a))    => Abs(a)
          case ("rev", Seq(a))    => Rev(a)
          case ("add", as)        => Add(as)
          case ("mult", as)       => Mult(as)
          case ("concat", as)     => ConcatE(as)
          case ("date_math", as) if as.size >= 2 => DateMathE(as)
          case ("div", Seq(a, b)) => Div(a, b)
          case ("pow", Seq(a, b)) => Pow(a, b)
          case ("log", Seq(a, b)) => LogE(a, b)
          case _ => throw new IllegalArgumentException(
            s"$top: wrong argument count or unsupported")
        }
    }
  }

  /** Comma split at paren depth 0 with `\(` `\)` `\,` escapes
    * (ExpressionFactory.getArguments:113-135). */
  def getArguments(operands: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var stack = 0; var start = 0; var i = 0
    def unesc(s: String) =
      s.replace("\\(", "(").replace("\\)", ")").replace("\\,", ",").trim
    while (i < operands.length) {
      operands.charAt(i) match {
        case ',' if stack == 0 =>
          out += unesc(operands.substring(start, i)); start = i + 1
        case '('  => stack += 1
        case ')'  => stack -= 1
        case '\\' => i += 1 // skip the escaped char
        case _    =>
      }
      i += 1
    }
    out += unesc(operands.substring(start))
    out.result()
  }

  /** Every (stat, source) and (percentile-label, source) leaf under `e`. */
  def leaves(e: AExpr): Seq[AExpr] = e match {
    case s: Stat => Seq(s)
    case p: Pctl => Seq(p)
    case Neg(a) => leaves(a); case Abs(a) => leaves(a); case Rev(a) => leaves(a)
    case Add(as) => as.flatMap(leaves)
    case Mult(as) => as.flatMap(leaves)
    case ConcatE(as) => as.flatMap(leaves)
    case DateMathE(as) => as.flatMap(leaves)
    case Div(a, b) => leaves(a) ++ leaves(b)
    case Pow(a, b) => leaves(a) ++ leaves(b)
    case LogE(a, b) => leaves(a) ++ leaves(b)
    case _ => Nil
  }

  /** Compile an expression to a Column over a statsFrame row. Null
    * propagation is Spark-native (any null operand nulls the result),
    * which is exactly the reference's early-return-null. */
  def compile(e: AExpr): Column = e match {
    case Stat(st, src)     => col(statCol(src, st))
    case Pctl(lbl, _, src) => col(statCol(src, s"percentile_$lbl"))
    case ConstNum(v)       => lit(v)
    case ConstStr(v)       => lit(v)
    case ConstDate(iso) =>
      lit(java.sql.Timestamp.from(java.time.Instant.parse(iso)))
    // date_math compiles the math strings (compile-time constants) into
    // date_trunc / interval column ops — DateMathParser semantics over
    // the session (UTC) calendar
    case DateMathE(as) =>
      as.tail.foldLeft(compile(as.head)) { (c, m) =>
        applyDateMath(c, constString(m).getOrElse(throw
          new IllegalArgumentException(
            "date_math math operand must be a constant string")))
      }
    case Neg(a)            => -compile(a).cast("double")
    case Abs(a)            => abs(compile(a).cast("double"))
    case Rev(a)            => reverse(compile(a).cast("string"))
    case Add(as)  => as.map(compile(_).cast("double")).reduce(_ + _)
    case Mult(as) => as.map(compile(_).cast("double")).reduce(_ * _)
    case ConcatE(as) => concat(as.map(compile(_).cast("string")): _*)
    case Div(a, b) => compile(a).cast("double") / compile(b).cast("double")
    case Pow(a, b) => pow(compile(a).cast("double"), compile(b).cast("double"))
    // log(a,b) = ln(a)/ln(b) — DualDelegateExpression.java:64-70
    case LogE(a, b) => log(compile(a).cast("double")) / log(compile(b).cast("double"))
  }

  /** Constant-fold a string-valued expression tree (const_str / rev /
    * concat over constants); None when any leaf is non-constant. */
  def constString(e: AExpr): Option[String] = e match {
    case ConstStr(v) => Some(v)
    case Rev(a)      => constString(a).map(_.reverse)
    case ConcatE(as) =>
      val parts = as.map(constString)
      if (parts.forall(_.isDefined)) Some(parts.flatten.mkString) else None
    case _ => None
  }

  /** One DateMathParser math string (`/DAY+8HOURS-1MINUTE` …) as column
    * ops: `/UNIT` -> date_trunc, `±n UNIT` -> interval arithmetic. The
    * token grammar and unit table are graft.search.DateMath's — ONE
    * parser serves NOW-expressions and this compiler. */
  def applyDateMath(c0: Column, math: String): Column = {
    import graft.search.DateMath
    DateMath.parseOps(math).foldLeft(c0) {
      case (c, DateMath.Floor(u)) => date_trunc(DateMath.sparkUnitName(u), c)
      case (c, DateMath.Offset(s, n, u)) =>
        val iv = expr(s"INTERVAL $n ${DateMath.sparkUnitName(u).toUpperCase}")
        if (s > 0) c + iv else c - iv
    }
  }

  /** Column name carrying stat `st` of source `src` in a statsFrame.
    * Source strings may contain arbitrary chars; sanitize to a flat name. */
  def statCol(src: String, st: String): String =
    src.replaceAll("[^A-Za-z0-9]", "_") + "__" + st

  /** One value source: `name` is the source string used in expressions,
    * `column` the Spark column computing it, `numeric` selects the
    * NumericStatsCollector surface (sum/sumofsquares/mean/stddev and
    * rank stats) vs the MinMax surface (count/missing/min/max/unique). */
  final case class Source(name: String, column: Column, numeric: Boolean = true,
                          medianWanted: Boolean = false,
                          percentiles: Seq[(String, Double)] = Nil)

  /** Compute every requested stat for every source, one output row per
    * bucket. `buckets` are (name, expr) grouping keys; pass an empty seq
    * for the whole-set ("no facet") single row. */
  def statsFrame(df: DataFrame, buckets: Seq[(String, Column)],
                 sources: Seq[Source]): DataFrame = {
    // constant-key fallback so the no-facet case is still one groupBy row
    val bs = if (buckets.nonEmpty) buckets else Seq("__all" -> lit("all"))
    val bNames = bs.map(_._1)
    val srcName = sources.map(s => s.name -> statCol(s.name, "v")).toMap
    val base = df.select(
      bs.map { case (n, c) => c.as(n) } ++
        sources.map(s => s.column.as(srcName(s.name))): _*)

    val aggs = sources.flatMap { s =>
      val v = col(srcName(s.name))
      def a(st: String, c: Column) = c.as(statCol(s.name, st))
      val common = Seq(
        a("count", count(v)),
        a("missing", count(lit(1)) - count(v)),
        a("min", min(v)), a("max", max(v)),
        a("unique", countDistinct(v)))
      if (s.numeric) common ++ Seq(
        a("sum", sum(v.cast("double"))),
        a("sumofsquares", sum(v.cast("double") * v.cast("double"))))
      else common
    }
    var g = base.groupBy(bNames.map(col): _*).agg(aggs.head, aggs.tail: _*)
    for (s <- sources if s.numeric) {
      val cnt = col(statCol(s.name, "count"))
      val mean = when(cnt === 0, lit(0.0))
        .otherwise(col(statCol(s.name, "sum")) / cnt)
      g = g.withColumn(statCol(s.name, "mean"), mean)
        .withColumn(statCol(s.name, "stddev"),
          when(cnt <= 1, lit(0.0)).otherwise(
            sqrt(col(statCol(s.name, "sumofsquares")) / cnt -
              col(statCol(s.name, "mean")) * col(statCol(s.name, "mean")))))
    }
    // distributed rank selection for median/percentiles
    for (s <- sources if s.medianWanted || s.percentiles.nonEmpty) {
      val sel = rankSelect(base, bNames, srcName(s.name), s)
      g = g.join(sel, bNames, "left")
      if (s.medianWanted) // empty list -> 0 (MedianCalculator.java:41-43)
        g = g.withColumn(statCol(s.name, "median"),
          coalesce(col(statCol(s.name, "median")), lit(0.0)))
    }
    g
  }

  /** Monotone 16-bit range id of a double: the IEEE-754 total-order bit
    * trick (flip all bits for negatives, flip the sign bit for
    * positives), top 16 bits. Data-independent, order-preserving and
    * exponent-aware, so skewed/heavy-tailed continuous sources still
    * split into many ranges (a linear [min,max] binning would collapse
    * under one outlier). Runs only on DISTINCT-value histogram rows. */
  private val rangeOf16 = udf { (d: Double) =>
    val bits = java.lang.Double.doubleToLongBits(d)
    val key = if (bits < 0) ~bits else bits ^ Long.MinValue
    (key >>> 48).toInt
  }

  /** Rank-selected order stats for one source: a (bucket, value)
    * histogram, cumulative counts to [lo, hi] rank runs, and a join of
    * the wanted ranks against the run holding each rank.
    *
    * Numeric sources use a TWO-PHASE selection so no window partition
    * ever holds a whole bucket's distinct set (a continuous double
    * source has ~n distinct values — a single per-bucket window would be
    * the classic single-task scale-killer): phase 1 aggregates per
    * (bucket, 16-bit monotone value range) counts — the per-bucket
    * cumulative window runs over <= 65536 range rows — and locates the
    * range holding each wanted rank; phase 2 re-runs the exact
    * cumulative count over ONLY the located ranges' values, partitioned
    * by (bucket, range). Non-numeric sources keep the single-phase path
    * (their histogram is bounded by the string vocabulary). */
  private def rankSelect(base: DataFrame, bNames: Seq[String], vCol: String,
                         s: Source): DataFrame = {
    val v = col(vCol)
    val hist = base.where(v.isNotNull)
      .groupBy((bNames :+ vCol).map(col): _*).agg(count(lit(1)).as("__c"))
    // n re-derives from the histogram (sum of per-value counts) — no
    // second scan of the base relation
    val n = hist.groupBy(bNames.map(col): _*).agg(sum("__c").as("__n"))
    // wanted (tag, 1-based rank) rows, a pure function of the bucket's n
    val nn = col("__n")
    val med =
      if (!s.medianWanted) Nil
      else {
        // size = n-1; firstIdx = floor(.5*size); secondIdx = firstIdx +
        // (size odd ? 1 : 0)  (MedianCalculator.java:44-47)
        val first = floor(lit(0.5) * (nn - 1).cast("double")).cast("long")
        val second = first + when(((nn - 1) % 2) === 1, 1L).otherwise(0L)
        Seq(struct(lit("m1").as("tag"), (first + 1).as("rank")),
          struct(lit("m2").as("tag"), (second + 1).as("rank")))
      }
    val pcts = s.percentiles.map { case (lbl, p) =>
      // idx = round(p*n - .5) = floor(p*n)  (PercentileCalculator.java:46)
      struct(lit(s"p_$lbl").as("tag"),
        (floor(lit(p) * nn.cast("double")).cast("long") + 1).as("rank"))
    }
    val ranks = n.select(bNames.map(col) :+
      explode(array(med ++ pcts: _*)).as("__tr"): _*)
      .select(bNames.map(col) :+ col("__tr.tag").as("__tag") :+
        col("__tr.rank").as("__rank"): _*)
    // rename the histogram side's bucket columns so the self-lineage
    // join resolves unambiguously
    def renamed(df: DataFrame): DataFrame =
      bNames.zipWithIndex.foldLeft(df) { case (d, (b, i)) =>
        d.withColumnRenamed(b, s"__b$i")
      }
    val bEq = bNames.zipWithIndex.map { case (b, i) => col(b) === col(s"__b$i") }
      .reduceOption(_ && _).getOrElse(lit(true))
    val joined =
      if (!s.numeric) {
        // string vocabulary bounds the histogram: single-phase is safe
        val w = Window.partitionBy(bNames.map(col): _*).orderBy(v)
        val cum = hist.withColumn("__hi", sum("__c").over(w))
          .withColumn("__lo", col("__hi") - col("__c") + 1)
        ranks.join(renamed(cum),
          bEq && col("__rank").between(col("__lo"), col("__hi")))
          .select(bNames.map(col) :+ col("__tag") :+ v.as("__v"): _*)
      } else {
        // phase 1: coarse range histogram (<= 65536 rows per bucket in
        // the cumulative window, whatever the source cardinality), then
        // locate the range holding each wanted rank
        val histR = hist.withColumn("__r", rangeOf16(v.cast("double")))
        val rc = histR.groupBy((bNames :+ "__r").map(col): _*)
          .agg(sum("__c").as("__rc"))
        val wr = Window.partitionBy(bNames.map(col): _*).orderBy(col("__r"))
        val rcum = rc.withColumn("__rhi", sum("__rc").over(wr))
          .withColumn("__rlo", col("__rhi") - col("__rc") + 1)
        val located = ranks.join(renamed(rcum),
          bEq && col("__rank").between(col("__rlo"), col("__rhi")))
          .select(bNames.map(col) :+ col("__tag") :+ col("__rank") :+
            col("__r") :+ col("__rlo"): _*)
        // phase 2: exact cumulative ranks over ONLY the located ranges'
        // values; the located-range list is tiny (<= #buckets x #wanted
        // stats rows), so it broadcasts into the narrowing join
        val wanted = broadcast(
          renamed(located.select(bNames.map(col) :+ col("__r") :+
            col("__rlo"): _*)).withColumnRenamed("__r", "__wr").distinct())
        val nar = histR.join(wanted, bEq && col("__r") === col("__wr"))
        val w2 = Window.partitionBy((bNames :+ "__r").map(col): _*).orderBy(v)
        val cum2 = nar
          .withColumn("__hi", col("__rlo") - 1 + sum("__c").over(w2))
          .withColumn("__lo", col("__hi") - col("__c") + 1)
        val cum2R = renamed(cum2.select(bNames.map(col) :+
          col("__r").as("__cr") :+ v :+ col("__lo") :+ col("__hi"): _*))
        located.join(cum2R,
          bEq && col("__r") === col("__cr") &&
            col("__rank").between(col("__lo"), col("__hi")))
          .select(bNames.map(col) :+ col("__tag") :+ v.as("__v"): _*)
      }
    val tagAggs =
      (if (s.medianWanted)
        Seq((sum(when(col("__tag") === "m1", col("__v").cast("double")))
          * 0.5 +
          sum(when(col("__tag") === "m2", col("__v").cast("double")))
            * 0.5).as(statCol(s.name, "median")))
      else Nil) ++
        s.percentiles.map { case (lbl, _) =>
          max(when(col("__tag") === s"p_$lbl", col("__v")))
            .as(statCol(s.name, s"percentile_$lbl"))
        }
    joined.groupBy(bNames.map(col): _*).agg(tagAggs.head, tagAggs.tail: _*)
  }

  // ---------- range facet layout (RangeEndpointCalculator.java) -------

  final case class FacetRange(name: String, lower: Option[Double],
                              upper: Option[Double],
                              incLower: Boolean, incUpper: Boolean)

  /** Bucket layout for a numeric range facet. `include` ⊆ {lower, upper,
    * edge, outer, all}; `others` ⊆ {before, after, between, all, none}.
    * The gap list advances one bucket at a time, the LAST gap repeats;
    * without hardend the end EXTENDS to the final bucket's high edge and
    * the extended end is what after/between and EDGE see
    * (RangeEndpointCalculator.getRanges:75-150). */
  def rangeLayout(start: Double, end0: Double, gaps: Seq[Double],
                  hardEnd: Boolean, include: Set[String],
                  others: Set[String]): Seq[FacetRange] = {
    require(end0 >= start && gaps.nonEmpty)
    def inc(fs: String*) = fs.exists(include.contains)
    var end = end0
    var low = start
    var gi = 0
    var gap = gaps.head
    val out = Seq.newBuilder[FacetRange]
    while (low < end) {
      if (gi < gaps.length) { gap = gaps(gi); gi += 1 }
      var high = low + gap
      if (end < high) { if (hardEnd) high = end else end = high }
      require(high > low, "range facet infinite loop")
      out += FacetRange(fmt(low), Some(low), Some(high),
        inc("all", "lower") || (inc("edge") && low == start),
        inc("all", "upper") || (inc("edge") && high == end))
      low = high
    }
    if (others.nonEmpty && !others.contains("none")) {
      val all = others.contains("all")
      if (all || others.contains("before"))
        out += FacetRange("before", None, Some(start), incLower = false,
          incUpper = inc("outer", "all") || !inc("lower", "edge"))
      if (all || others.contains("after"))
        out += FacetRange("after", Some(end), None,
          incLower = inc("outer", "all") || !inc("upper", "edge"),
          incUpper = false)
      if (all || others.contains("between"))
        out += FacetRange("between", Some(start), Some(end),
          incLower = inc("lower", "edge", "all"),
          incUpper = inc("upper", "edge", "all"))
    }
    out.result()
  }

  private def fmt(d: Double): String =
    if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString

  /** Assign each row to every range bucket it falls in (a boundary value
    * can land in two adjacent closed buckets, and before/after/between
    * overlap the main buckets by design): one broadcast array literal of
    * the layout, exploded and predicate-filtered in a single scan. */
  def rangeBucket(valueCol: Column, ranges: Seq[FacetRange]): Column = {
    val entries = ranges.map { r =>
      val loOk = r.lower.map(lo =>
        if (r.incLower) valueCol >= lit(lo) else valueCol > lit(lo))
        .getOrElse(lit(true))
      val hiOk = r.upper.map(hi =>
        if (r.incUpper) valueCol <= lit(hi) else valueCol < lit(hi))
        .getOrElse(lit(true))
      when(loOk && hiOk, lit(r.name)).otherwise(lit(null: String))
    }
    filter(array(entries: _*), _.isNotNull)
  }
}
