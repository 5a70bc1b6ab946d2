package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.operators.Analytics._

/** Solr AnalyticsComponent semantics (solr/contrib/analytics): the
  * expression grammar (ExpressionFactory.java), the stat math incl. the
  * population-stddev / selection-percentile / split-median quirks
  * (NumericStatsCollector.java, MedianCalculator.java,
  * PercentileCalculator.java), and the range-facet layout with gap-list
  * cycling and soft-end extension (RangeEndpointCalculator.java).
  * Engine results are checked against a direct local port of the
  * reference math over randomized data.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // ---- local reference port (the oracle for the distributed path) ----
  private def refMedian(xs: Seq[Double]): Double = {
    // MedianCalculator.getMedian:38-50
    val sorted = xs.sorted
    val size = sorted.length - 1
    if (size == -1) 0.0
    else {
      val first = math.floor(0.5 * size).toInt
      val second = if (first <= size && size % 2 == 1) first + 1 else first
      sorted(first) * 0.5 + sorted(second) * 0.5
    }
  }
  private def refPctl(xs: Seq[Double], p: Double): Option[Double] = {
    // PercentileCalculator.getPercentiles:38-53
    if (xs.isEmpty) None
    else Some(xs.sorted.apply(math.round(p * xs.length - 0.5).toInt))
  }
  private def refStddev(xs: Seq[Double]): Double = {
    // NumericStatsCollector.compute:52-55 (population form, 0 if n<=1)
    val n = xs.length
    if (n <= 1) 0.0
    else {
      val mean = xs.sum / n
      math.sqrt(xs.map(x => x * x).sum / n - mean * mean)
    }
  }

  test("expression parser covers the ExpressionFactory grammar") {
    assert(parse("sum(n)") === Stat("sum", "n"))
    assert(parse("percentile(20,n)") === Pctl("20", 0.2, "n"))
    assert(parse("add(sum(n),const_num(10))") ===
      Add(Seq(Stat("sum", "n"), ConstNum(10.0))))
    assert(parse("div(sum(n),count(n))") ===
      Div(Stat("sum", "n"), Stat("count", "n")))
    assert(parse("log(mean(n),const_num(2))") ===
      LogE(Stat("mean", "n"), ConstNum(2.0)))
    assert(parse("neg(abs(const_num(-3)))") === Neg(Abs(ConstNum(-3.0))))
    assert(parse("concat(const_str(ab),rev(max(s)))") ===
      ConcatE(Seq(ConstStr("ab"), Rev(Stat("max", "s")))))
    // const_str keeps its operand verbatim (no trim)
    assert(parse("const_str( x,y )") === ConstStr(" x,y "))
    // escaped comma splits nothing (getArguments:113-135)
    assert(getArguments("a\\,b,c") === Seq("a,b", "c"))
    assert(getArguments("f(a,b),g(c)") === Seq("f(a,b)", "g(c)"))
  }

  test("statsFrame matches the reference math on randomized buckets") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map { i =>
      val bucket = "b" + rnd.nextInt(5)
      val v: java.lang.Double =
        if (rnd.nextInt(10) == 0) null
        else java.lang.Double.valueOf(rnd.nextInt(50).toDouble)
      (i.toLong, bucket, v)
    }
    import spark.implicits._
    val df = rows.toDF("id", "bucket", "v")
    val out = Analytics.statsFrame(df, Seq("bucket" -> col("bucket")),
      Seq(Source("v", col("v"), numeric = true, medianWanted = true,
        percentiles = Seq("20" -> 0.2, "50" -> 0.5, "99" -> 0.99))))
      .collect().map(r => r.getAs[String]("bucket") -> r).toMap

    for (b <- rows.map(_._2).distinct) {
      val xs = rows.filter(_._2 == b).flatMap(r => Option(r._3).map(_.doubleValue))
      val miss = rows.count(r => r._2 == b && r._3 == null)
      val r = out(b)
      assert(r.getAs[Long](statCol("v", "count")) === xs.length, s"count $b")
      assert(r.getAs[Long](statCol("v", "missing")) === miss, s"missing $b")
      assert(r.getAs[Long](statCol("v", "unique")) === xs.distinct.length)
      assert(math.abs(r.getAs[Double](statCol("v", "sum")) - xs.sum) < 1e-9)
      assert(math.abs(r.getAs[Double](statCol("v", "sumofsquares")) -
        xs.map(x => x * x).sum) < 1e-9)
      assert(math.abs(r.getAs[Double](statCol("v", "mean")) -
        xs.sum / xs.length) < 1e-9)
      assert(math.abs(r.getAs[Double](statCol("v", "stddev")) -
        refStddev(xs)) < 1e-9, s"stddev $b")
      assert(r.getAs[Double](statCol("v", "min")) === xs.min)
      assert(r.getAs[Double](statCol("v", "max")) === xs.max)
      assert(math.abs(r.getAs[Double](statCol("v", "median")) -
        refMedian(xs)) < 1e-9, s"median $b")
      for (p <- Seq("20" -> 0.2, "50" -> 0.5, "99" -> 0.99)) {
        assert(r.getAs[Double](statCol("v", s"percentile_${p._1}")) ===
          refPctl(xs, p._2).get, s"pct ${p._1} $b")
      }
    }
  }

  test("high-cardinality continuous source: two-phase selection is exact") {
    // ~20k DISTINCT doubles per bucket (heavy-tailed: exponentiated
    // gaussians spanning many exponents) — the case where a single
    // per-bucket cumulative window would hold the whole distinct set and
    // where a linear [min,max] binning would collapse; the 16-bit
    // IEEE-range phase-1 must still locate every rank exactly.
    val rnd = new scala.util.Random(7)
    val rows = (1 to 40000).map { i =>
      val bucket = "b" + (i % 2)
      val v = math.exp(rnd.nextGaussian() * 8) *
        (if (rnd.nextBoolean()) 1 else -1)
      (i.toLong, bucket, v)
    }
    import spark.implicits._
    val df = rows.toDF("id", "bucket", "v").repartition(8)
    val out = Analytics.statsFrame(df, Seq("bucket" -> col("bucket")),
      Seq(Source("v", col("v"), numeric = true, medianWanted = true,
        percentiles = Seq("01" -> 0.01, "50" -> 0.5, "999" -> 0.999))))
      .collect().map(r => r.getAs[String]("bucket") -> r).toMap
    for (b <- Seq("b0", "b1")) {
      val xs = rows.filter(_._2 == b).map(_._3)
      assert(xs.distinct.length > 19000) // genuinely continuous
      val r = out(b)
      assert(math.abs(r.getAs[Double](statCol("v", "median")) -
        refMedian(xs)) < 1e-9, s"median $b")
      for (p <- Seq("01" -> 0.01, "50" -> 0.5, "999" -> 0.999))
        assert(r.getAs[Double](statCol("v", s"percentile_${p._1}")) ===
          refPctl(xs, p._2).get, s"pct ${p._1} $b")
    }
  }

  test("median/percentile edge cases: empty, single, duplicate-heavy") {
    import spark.implicits._
    // single value: median = the value; stddev = 0 (count<=1)
    val one = Seq((1L, "a", 7.0)).toDF("id", "bucket", "v")
    val r1 = Analytics.statsFrame(one, Seq("bucket" -> col("bucket")),
      Seq(Source("v", col("v"), medianWanted = true,
        percentiles = Seq("50" -> 0.5)))).collect().head
    assert(r1.getAs[Double](statCol("v", "median")) === 7.0)
    assert(r1.getAs[Double](statCol("v", "stddev")) === 0.0)
    assert(r1.getAs[Double](statCol("v", "percentile_50")) === 7.0)

    // all-null bucket: count 0, median 0 (MedianCalculator empty-list rule)
    val nulls = Seq((1L, "a", null: java.lang.Double),
      (2L, "a", null: java.lang.Double)).toDF("id", "bucket", "v")
    val r2 = Analytics.statsFrame(nulls, Seq("bucket" -> col("bucket")),
      Seq(Source("v", col("v"), medianWanted = true))).collect().head
    assert(r2.getAs[Long](statCol("v", "count")) === 0L)
    assert(r2.getAs[Double](statCol("v", "median")) === 0.0)
    assert(r2.getAs[Double](statCol("v", "mean")) === 0.0)

    // duplicate-heavy: rank runs span the wanted ranks
    val dups = (1 to 100).map(i => (i.toLong, "a", (i % 3).toDouble))
      .toDF("id", "bucket", "v")
    val xs = (1 to 100).map(i => (i % 3).toDouble)
    val r3 = Analytics.statsFrame(dups, Seq("bucket" -> col("bucket")),
      Seq(Source("v", col("v"), medianWanted = true,
        percentiles = Seq("25" -> 0.25, "75" -> 0.75)))).collect().head
    assert(r3.getAs[Double](statCol("v", "median")) === refMedian(xs))
    assert(r3.getAs[Double](statCol("v", "percentile_25")) === refPctl(xs, 0.25).get)
    assert(r3.getAs[Double](statCol("v", "percentile_75")) === refPctl(xs, 0.75).get)
  }

  test("expressions evaluate with reference null propagation") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.0), (2L, "a", 4.0), (3L, "b", 6.0))
      .toDF("id", "bucket", "v")
    val stats = Analytics.statsFrame(df, Seq("bucket" -> col("bucket")),
      Seq(Source("v", col("v"))))
    val out = stats.select(col("bucket"),
      compile(parse("add(sum(v),const_num(10))")).as("e1"),
      compile(parse("div(sum(v),count(v))")).as("e2"),
      compile(parse("pow(count(v),const_num(2))")).as("e3"),
      compile(parse("log(const_num(8),const_num(2))")).as("e4"),
      compile(parse("mult(neg(const_num(2)),mean(v))")).as("e5"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getDouble(1) === 16.0)
    assert(out("a").getDouble(2) === 3.0)
    assert(out("a").getDouble(3) === 4.0)
    assert(math.abs(out("a").getDouble(4) - 3.0) < 1e-12)
    assert(out("a").getDouble(5) === -6.0)
    assert(out("b").getDouble(1) === 16.0 || out("b").getDouble(1) === 16.0)
  }

  test("date expressions: const_date, date_math chains, month clamping") {
    assert(parse("const_date(2024-03-31T23:59:58Z)") ===
      ConstDate("2024-03-31T23:59:58Z"))
    assert(parse("date_math(min(ts),const_str(+2MONTHS),const_str(/DAY))") ===
      DateMathE(Seq(Stat("min", "ts"), ConstStr("+2MONTHS"),
        ConstStr("/DAY"))))
    assert(constString(ConcatE(Seq(ConstStr("+2"), Rev(ConstStr("YAD"))))) ===
      Some("+2DAY"))
    import spark.implicits._
    val df = Seq(Tuple1(1)).toDF("x")
    def ep(e: String): Long = df.select(unix_timestamp(compile(parse(e)))
      .cast("long")).collect().head.getLong(0)
    def iso(s: String): Long = java.time.Instant.parse(s).getEpochSecond
    assert(ep("date_math(const_date(2024-03-31T23:59:58Z),const_str(+1MONTH))")
      === iso("2024-04-30T23:59:58Z")) // month-end clamp
    assert(ep("date_math(const_date(2024-01-15T10:30:45Z),const_str(/DAY+8HOURS-30MINUTES))")
      === iso("2024-01-15T07:30:00Z"))
    assert(ep("date_math(const_date(2024-02-28T00:00:00Z),const_str(+1DAY))")
      === iso("2024-02-29T00:00:00Z")) // leap year
  }

  test("range layout: gap cycling, soft end extension, include/other flags") {
    // gaps 5,10 then 10 repeating over [0, 32): buckets 0-5, 5-15, 15-25,
    // 25-35 and WITHOUT hardend the end extends to 35
    val rs = rangeLayout(0, 32, Seq(5, 10), hardEnd = false,
      include = Set("lower", "edge"), others = Set("all"))
    val names = rs.map(_.name)
    assert(names === Seq("0", "5", "15", "25", "before", "after", "between"))
    val b25 = rs(3)
    assert(b25.upper === Some(35.0)) // extended, not clamped
    assert(b25.incUpper) // edge: high == (extended) end
    val after = rs.find(_.name == "after").get
    assert(after.lower === Some(35.0)) // after starts at the EXTENDED end
    assert(!after.incLower) // edge includes upper already
    val before = rs.find(_.name == "before").get
    assert(!before.incUpper) // lower/edge already claim the start edge
    val between = rs.find(_.name == "between").get
    assert(between.lower === Some(0.0) && between.upper === Some(35.0))
    assert(between.incLower && between.incUpper)

    // hardend clamps the last bucket and the end stays 32
    val hard = rangeLayout(0, 32, Seq(5, 10), hardEnd = true,
      include = Set("upper"), others = Set("none", "before"))
    assert(hard.map(_.name) === Seq("0", "5", "15", "25"))  // none wins
    assert(hard.last.upper === Some(32.0))
    assert(!hard.head.incLower && hard.head.incUpper)
  }

  test("rangeBucket assigns boundary values to every matching bucket") {
    import spark.implicits._
    val rs = rangeLayout(0, 20, Seq(10), hardEnd = true,
      include = Set("lower", "upper"), others = Set.empty)
    // value 10 belongs to [0,10] AND [10,20]
    val df = Seq(10.0, 3.0, 20.0, 25.0).toDF("v")
      .select(col("v"), explode(rangeBucket(col("v"), rs)).as("bucket"))
    val got = df.collect().map(r => (r.getDouble(0), r.getString(1))).toSet
    assert(got === Set((10.0, "0"), (10.0, "10"), (3.0, "0"),
      (20.0, "10")))
  }

  test("string sources: min/max/unique over MinMax surface") {
    import spark.implicits._
    val df = Seq((1L, "x", "pear"), (2L, "x", "apple"), (3L, "x", "plum"),
      (4L, "x", null: String)).toDF("id", "bucket", "s")
    val r = Analytics.statsFrame(df, Seq("bucket" -> col("bucket")),
      Seq(Source("s", col("s"), numeric = false))).collect().head
    assert(r.getAs[String](statCol("s", "min")) === "apple")
    assert(r.getAs[String](statCol("s", "max")) === "plum")
    assert(r.getAs[Long](statCol("s", "count")) === 3L)
    assert(r.getAs[Long](statCol("s", "missing")) === 1L)
    assert(r.getAs[Long](statCol("s", "unique")) === 3L)
  }
}
