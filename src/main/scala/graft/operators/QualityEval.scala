package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Search-quality evaluation — the reference's relevance-judgment
  * benchmark (lucene/benchmark/src/java/org/apache/lucene/benchmark/
  * quality/QualityStats.java:28-233, trec/TrecJudge.java:34-110,
  * QualityBenchmark.java:60-130): walk a ranked run against a judgment
  * set and produce per-query precision/recall stats plus the averaged
  * row.
  *
  * Faithful details:
  *  - P@n for n beyond the result-list end extrapolates as
  *    numPoints * p(numPoints) / n (QualityStats.getPrecisionAt:104-110);
  *  - MRR counts only a first relevant hit at rank <= 5
  *    (QualityStats.addResult:86-88);
  *  - AvP = sum of precisions at relevant ranks / maxGoodPoints
  *    (getAvp:121-123); recall falls back to the running precision when
  *    a query has no judged-relevant docs (addResult:99);
  *  - average() divides quality measures by the count of queries WITH
  *    positive judgments only, and averages the EXTRAPOLATED P@n values
  *    (QualityStats.average:195-232).
  *
  * Spark shape: one left join run<-judgments (judgments are k rows per
  * query — broadcast), one rank-window cumulative sum, one keyed agg.
  * Queries are independent partitions; nothing driver-side.
  */
object QualityEval {

  /** `run`: (query_id, rank, doc_name) with dense ranks 1..N per query.
    * `judgments`: (query_id, doc_name) relevant pairs (dups tolerated).
    * Returns one row per query plus an `average` row, with columns
    * num_points, num_good_points, max_good_points, recall, mrr, avp and
    * p_at_<n> for each requested point. */
  def evaluate(run: DataFrame, judgments: DataFrame,
               pAtPoints: Seq[Int] = Seq(1, 5, 10, 20)): DataFrame = {
    val j = judgments.select(col("query_id").as("jqid"),
      col("doc_name").as("jdoc")).distinct()
    val maxGood = j.groupBy("jqid").agg(count("*").cast("double").as("max_good"))

    val marked = run
      .join(broadcast(j),
        run("query_id") === col("jqid") && run("doc_name") === col("jdoc"), "left")
      .withColumn("good", when(col("jdoc").isNotNull, 1.0).otherwise(0.0))
      .select(run("query_id"), col("rank"), col("good"))
    val w = Window.partitionBy("query_id").orderBy("rank")
    val cum = marked
      .withColumn("cum_good", sum("good").over(w))
      .withColumn("p", col("cum_good") / col("rank"))

    val aggs: Seq[org.apache.spark.sql.Column] = Seq(
      sum("good").as("num_good_points"),
      sum(when(col("good") === 1.0, col("p")).otherwise(0.0)).as("prel_sum"),
      min(when(col("good") === 1.0 && col("rank") <= 5, col("rank"))).as("first5"),
      max_by(col("p"), col("rank")).as("last_p")) ++
      pAtPoints.map(n => max(when(col("rank") === n, col("p"))).as(s"p_raw_$n"))
    val per0 = cum.groupBy("query_id").agg(
      max("rank").cast("double").as("num_points"), aggs: _*)

    val per = per0
      .join(maxGood, per0("query_id") === maxGood("jqid"), "left")
      .withColumn("max_good_points", coalesce(col("max_good"), lit(0.0)))
      .withColumn("recall",
        when(col("max_good_points") <= 0.0, col("last_p"))
          .otherwise(col("num_good_points") / col("max_good_points")))
      .withColumn("mrr",
        coalesce(lit(1.0) / col("first5").cast("double"), lit(0.0)))
      .withColumn("avp",
        when(col("max_good_points") === 0.0, 0.0)
          .otherwise(col("prel_sum") / col("max_good_points")))
    val withPAt = pAtPoints.foldLeft(per) { (df, n) =>
      df.withColumn(s"p_at_$n",
        when(col("num_points") >= n, col(s"p_raw_$n"))
          .otherwise(col("num_points") * col("last_p") / n))
    }
    val outCols = Seq("num_points", "num_good_points", "max_good_points",
      "recall", "mrr", "avp") ++ pAtPoints.map(n => s"p_at_$n")
    val perQuery = withPAt.select(col("query_id").cast("string").as("query_id") +:
      outCols.map(col): _*)

    // QualityStats.average: only queries with positive judgments count.
    val avgRow = perQuery.where(col("max_good_points") > 0.0)
      .agg(avg(outCols.head).as(outCols.head),
        outCols.tail.map(c => avg(c).as(c)): _*)
      .select(lit("average").as("query_id") +: outCols.map(col): _*)

    perQuery.unionByName(avgRow)
  }
}
