package graft

import java.util.Locale

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classify

/** BooleanPerceptronClassifier semantics (classification/
  * BooleanPerceptronClassifier.java:59-243 + its
  * BooleanPerceptronClassifierTest corpus): totalTermFreq weight init,
  * sumDocFreq/2 automatic threshold, index-order sequential training
  * against the last PUBLISHED snapshot, modifier = correct.compareTo
  * (assigned) scaled by in-doc freq, batch-gated snapshot refresh. */
class BooleanPerceptronSpec extends AnyFunSuite {

  /** MockAnalyzer(random()) defaults: whitespace tokens, lowercased. */
  private def ws(s: String): Seq[String] =
    s.split("\\s+").toSeq.filter(_.nonEmpty).map(_.toLowerCase(Locale.ROOT))

  // ---- hand-computed micro trajectories ----

  test("hand-traced trajectory: init, threshold, misclassification update") {
    val train = Seq(
      (Seq("a", "a", "b"), true),  // out 8 >= 3 -> correct, no update
      (Seq("b", "c"), false),      // out 5 >= 3 -> wrong: b,c lose 1 each
      (Seq("a", "c", "c"), true))  // out 7 >= 3 -> correct
    val m = Classify.trainBooleanPerceptron(train)
    assert(m.threshold == 3.0) // sumDocFreq 6 / 2
    assert(m.weights == Map("a" -> 3L, "b" -> 1L, "c" -> 2L))
    assert(Classify.perceptronAssign(m, Seq("b")) == ((false, 1L)))
    assert(Classify.perceptronAssign(m, Seq("a", "b")) == ((true, 4L)))
    // unknown terms contribute nothing (FST miss is skipped)
    assert(Classify.perceptronAssign(m, Seq("zz", "b")) == ((false, 1L)))
  }

  test("in-doc frequency scales the update") {
    // one wrong doc with a repeated term: weight drops by the full freq
    val m = Classify.trainBooleanPerceptron(
      Seq((Seq("x", "x", "x"), false))) // out 9 >= 1.5 -> wrong, x -= 3
    assert(m.weights == Map("x" -> 0L))
  }

  test("batchSize gates the snapshot the NEXT doc reads (and the model)") {
    // two wrong docs: with batchSize=1 both updates publish (a: 2->1->0);
    // with batchSize=2 the second update happens over the published a=1
    // but is never republished, so the model still reads a=1
    val train = Seq((Seq("a"), false), (Seq("a"), false))
    val m1 = Classify.trainBooleanPerceptron(train, batchSize = 1)
    assert(m1.weights == Map("a" -> 0L))
    assert(Classify.perceptronAssign(m1, Seq("a")) == ((false, 0L)))
    val m2 = Classify.trainBooleanPerceptron(train, batchSize = 2)
    assert(m2.weights == Map("a" -> 1L))
    assert(Classify.perceptronAssign(m2, Seq("a")) == ((true, 1L)))
  }

  test("explicit threshold used verbatim; explicit 0 falls back to auto") {
    val train = Seq((Seq("a"), true))
    assert(Classify.trainBooleanPerceptron(train,
      threshold = Some(100d)).threshold == 100d)
    assert(Classify.trainBooleanPerceptron(train,
      threshold = Some(0d)).threshold == 0.5)
  }

  // ---- the reference test's own corpus ----

  private val corpus = Seq(
    ("The traveling press secretary for Mitt Romney lost his cool and " +
      "cursed at reporters who attempted to ask questions of the " +
      "Republican presidential candidate in a public plaza near the Tomb " +
      "of the Unknown Soldier in Warsaw Tuesday.", true),
    ("Mitt Romney seeks to assure Israel and Iran, as well as Jewish " +
      "voters in the United States, that he will be tougher against " +
      "Iran's nuclear ambitions than President Barack Obama.", true),
    ("And there's a threshold question that he has to answer for the " +
      "American people and that's whether he is prepared to be " +
      "commander-in-chief,\" she continued. \"As we look to the past " +
      "events, we know that this raises some questions about his " +
      "preparedness and we'll see how the rest of his trip goes.\"", true),
    ("Still, when it comes to gun policy, many congressional Democrats " +
      "have \"decided to keep quiet and not go there,\" said Alan " +
      "Lizotte, dean and professor at the State University of New York " +
      "at Albany's School of Criminal Justice.", true),
    ("Standing amongst the thousands of people at the state Capitol, " +
      "Jorstad, director of technology at the University of " +
      "Wisconsin-La Crosse, documented the historic moment and shared " +
      "it with the world through the Internet.", false),
    ("So, about all those experts and analysts who've spent the past " +
      "year or so saying Facebook was going to make a phone. A new " +
      "expert has stepped forward to say it's not going to happen.", false),
    ("More than 400 million people trust Google with their e-mail, and " +
      "50 million store files in the cloud using the Dropbox service. " +
      "People manage their bank accounts, pay bills, trade stocks and " +
      "generally transfer or store huge volumes of personal data " +
      "online.", false))

  private val TechnologyInput =
    "Much is made of what the likes of Facebook, Google and Apple know " +
    "about users. Truth is, Amazon may know more."

  test("reference corpus: TECHNOLOGY_INPUT classifies false (auto threshold)") {
    val m = Classify.trainBooleanPerceptron(
      corpus.map { case (t, c) => (ws(t), c) })
    assert(Classify.perceptronAssign(m, ws(TechnologyInput))._1 == false)
  }

  test("reference corpus: TECHNOLOGY_INPUT classifies false (threshold 100)") {
    val m = Classify.trainBooleanPerceptron(
      corpus.map { case (t, c) => (ws(t), c) }, threshold = Some(100d))
    assert(Classify.perceptronAssign(m, ws(TechnologyInput))._1 == false)
  }

  // ---- distributed inference matches the driver-side assign ----

  test("broadcast classify matches perceptronAssign per doc") {
    val spark = SparkSuite.spark
    import spark.implicits._
    import graft.analysis.{Analyzer, StopSets}
    val docs = Seq(
      (1L, "merge sort merge quick", "en"),
      (2L, "the quick brown fox", "en"),
      (3L, "ein kleiner brauner fuchs", "de")
    ).toDF("doc_id", "text", "lang")
    val train = Seq((Seq("merge", "sort"), true), (Seq("fox", "brown"), false))
    val m = Classify.trainBooleanPerceptron(train)
    val got = Classify.booleanPerceptronClassify(docs, m)
      .as[(Long, Boolean, Long)].collect().sortBy(_._1).toSeq
    val want = docs.as[(Long, String, String)].collect().toSeq.map {
      case (d, t, lang) =>
        val toks = Analyzer.analyze(t, StopSets.forLang(lang)).map(_.term)
        val (a, s) = Classify.perceptronAssign(m, toks)
        (d, a, s)
    }.sortBy(_._1)
    assert(got == want)
  }
}
