package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.{Analyzer, StopSets}

/** Document classification — the reference's classification module
  * (lucene/classification/src/java/org/apache/lucene/classification/
  * SimpleNaiveBayesClassifier.java and KNearestNeighborClassifier.java):
  * assign a class-field value to a document from the index's term
  * statistics.
  *
  * Spark-first shape: the class-conditional model (per-class priors,
  * per-(class, term) counts, vocabulary size) is a handful of small
  * aggregate relations — broadcast-joined against the data-sized
  * (doc, term) frame, so classification of the whole corpus is one
  * broadcast hash join + one aggregation, no shuffle of the model and no
  * driver-side loops. At 100 TB the model side stays kilobytes-to-
  * megabytes (classes x vocabulary) while the doc side streams.
  */
object Classify {

  /** Multinomial Naive Bayes with add-one smoothing, trained and applied
    * on the same corpus (resubstitution — the reference classifier also
    * reads its model straight from the index it classifies against):
    *
    *   score(d, c) = ln(n_c / n)
    *               + sum over tokens w of d: tf_d(w) * ln((tf(w,c) + 1) /
    *                                                      (T_c + V))
    *
    * mirroring SimpleNaiveBayesClassifier.getWordFreqForClass's add-one
    * smoothing over the class's token total plus vocabulary size.
    * Prediction = argmax over classes, ties to the lexicographically
    * smaller class (scores compared at 6 decimals: double associativity
    * differences across engines are ~1e-12, real class gaps are >> 1e-6).
    *
    * Returns (doc_id, pred) for every doc with at least one analyzed
    * token.
    */
  def naiveBayes(docs: DataFrame, id: String = "doc_id",
                 text: String = "text",
                 classCol: String = "lang"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(id).cast("long"), col(text), col(classCol))
      .as[(Long, String, String)]
      .flatMap { case (d, t, lang) =>
        Analyzer.analyze(t, StopSets.forLang(lang)).map(tp => (d, tp.term))
      }.toDF(id, "term")
      // consumed by the class-conditional counts, the vocab count, and
      // the per-doc term counts — cache so the corpus tokenizes once
      .cache()
    // model relations: all tiny (classes, classes x vocab, scalars)
    val cls = docs.groupBy(col(classCol).as("c")).agg(count("*").as("nc"))
    val n = docs.count().toDouble
    val tl = toks.join(docs.select(col(id), col(classCol).as("c")), id)
      .groupBy(col("c"), col("term")).agg(count("*").as("ctf"))
    val tc = tl.groupBy("c").agg(sum("ctf").as("tot"))
    val vocab = toks.select("term").distinct().count().toDouble
    // data-sized side: per-doc term counts, crossed with the class list
    val dt = toks.groupBy(col(id), col("term")).agg(count("*").as("tfd"))
    val ll = dt.crossJoin(broadcast(cls.select("c")))
      .join(broadcast(tl), Seq("c", "term"), "left")
      .join(broadcast(tc), "c")
      .groupBy(col(id), col("c"))
      .agg(sum(col("tfd") *
        log((coalesce(col("ctf"), lit(0L)) + lit(1.0)) /
          (col("tot") + lit(vocab)))).as("ll"))
    val scored = ll.join(broadcast(cls), "c")
      .withColumn("score", col("ll") + log(col("nc") / lit(n)))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col(id))
          .orderBy(round(col("score"), 6).desc, col("c").asc)))
      .where(col("rn") === 1)
      .select(col(id), col("c").as("pred"))
  }

  /** k-NN vote histogram (KNearestNeighborClassifier.assignClass): given
    * the target doc's nearest neighbors (already ranked by the MLT-style
    * BM25 search), count class votes. The prediction is the first row
    * (max votes, ties to the smaller class value). */
  def knnVotes(neighbors: DataFrame, docs: DataFrame,
               id: String = "doc_id",
               classCol: String = "lang"): DataFrame =
    neighbors.join(docs.select(col(id), col(classCol)), id)
      .groupBy(col(classCol)).agg(count("*").as("votes"))
      .orderBy(col("votes").desc, col(classCol).asc)
}
