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

  /** Trained BooleanPerceptronClassifier state: per-term Long weights (the
    * reference materializes them as an FST) + decision threshold. */
  final case class PerceptronModel(weights: Map[String, Long],
                                   threshold: Double)

  /** BooleanPerceptronClassifier training (classification/
    * BooleanPerceptronClassifier.java:120-193): weights initialize to each
    * term's total term frequency over the training corpus; the automatic
    * threshold is sumDocFreq/2 (:140-150); docs are visited in index
    * order, classified against the last PUBLISHED weights snapshot (the
    * FST, :98-113), and on a misclassification every term of the doc gets
    * `weight = snapshot(term) + modifier * inDocFreq` where modifier =
    * correct.compareTo(assigned) (:185-188, :217-229); the snapshot
    * republishes when `batchCount % batchSize == 0` (:188).
    *
    * The reference walks a shared mutable model over the index
    * sequentially — inherently a single-pass, order-dependent train — so
    * this runs on the driver over the BOUNDED training sample the caller
    * collected; classification of the corpus distributes via
    * [[booleanPerceptronClassify]]'s broadcast of the (vocabulary-sized)
    * weights map. */
  def trainBooleanPerceptron(train: Seq[(Seq[String], Boolean)],
                             threshold: Option[Double] = None,
                             batchSize: Int = 1): PerceptronModel = {
    val weights = scala.collection.mutable.HashMap.empty[String, Long]
    train.foreach(_._1.foreach(t =>
      weights.update(t, weights.getOrElse(t, 0L) + 1L)))
    val sumDocFreq = train.iterator.map(_._1.distinct.size.toLong).sum
    // reference: an explicit 0 threshold also falls back to the automatic
    val thr = threshold.filter(_ != 0d).getOrElse(sumDocFreq / 2.0)
    var fst: Map[String, Long] = weights.toMap
    var batchCount = 0
    train.foreach { case (tokens, correct) =>
      val output = tokens.iterator.map(t => fst.getOrElse(t, 0L)).sum
      val assigned = output >= thr
      val modifier = java.lang.Boolean.compare(correct, assigned)
      if (modifier != 0) {
        tokens.groupBy(identity).foreach { case (t, occ) =>
          weights.update(t, fst.getOrElse(t, 0L) + modifier.toLong * occ.size)
        }
        if (batchCount % batchSize == 0) fst = weights.toMap
      }
      batchCount += 1
    }
    PerceptronModel(fst, thr)
  }

  /** assignClass for one analyzed token stream (:93-114): sum the weights
    * of the tokens present in the model; class = output >= threshold. */
  def perceptronAssign(model: PerceptronModel,
                       tokens: Seq[String]): (Boolean, Long) = {
    val out = tokens.iterator.map(t => model.weights.getOrElse(t, 0L)).sum
    (out >= model.threshold, out)
  }

  /** Distributed inference: broadcast the weights map, one map-side pass
    * over the docs frame — no shuffle, no driver loop over the corpus. */
  def booleanPerceptronClassify(docs: DataFrame, model: PerceptronModel,
                                id: String = "doc_id",
                                text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bw = spark.sparkContext.broadcast(model.weights)
    val thr = model.threshold
    docs.select(col(id).cast("long"), col(text), col("lang"))
      .as[(Long, String, String)]
      .map { case (d, t, lang) =>
        val out = Analyzer.analyze(t, StopSets.forLang(lang))
          .iterator.map(tp => bw.value.getOrElse(tp.term, 0L)).sum
        (d, out >= thr, out)
      }.toDF(id, "assigned", "score")
  }
}
