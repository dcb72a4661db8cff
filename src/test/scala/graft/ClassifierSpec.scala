package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** Trained quality classifier: planted two-class separation, exact
  * layout-independence of the learned weights (the golden-pinnability
  * law), and scoring-surface sanity.
  */
class ClassifierSpec extends SparkSuite {
  import spark.implicits._

  // two linearly separable vocabularies: "curated" prose vs keyboard junk
  private def corpus = {
    val good = (0 until 30).map(i =>
      (i.toLong, 1.0, s"the quick brown fox jumps over the lazy dog again $i"))
    val junk = (0 until 30).map(i =>
      (100L + i, 0.0, s"zxqv wkpj qqnn zzzz hjkl vbnm xswd eeee rrrr tttt $i"))
    (good ++ junk).toDF("id", "y", "text")
  }

  test("logreg separates planted classes on the training set") {
    val feats = Classifier.hashedFeatures(
      corpus, col("id"), col("text"), col("y"), buckets = 256).localCheckpoint()
    val w = Classifier.trainLogReg(feats, buckets = 256, iters = 30, lr = 2.0)
    val scored = Classifier.scoreLogReg(feats, w).collect()
    assert(scored.length == 60)
    val correct = scored.count(r =>
      (r.getDouble(2) >= 0.5) == (r.getDouble(1) == 1.0))
    assert(correct == 60, s"training accuracy $correct/60")
    // scores are probabilities
    assert(scored.forall(r => r.getDouble(2) > 0.0 && r.getDouble(2) < 1.0))
  }

  test("learned weights are bit-identical under any partition layout") {
    val a = Classifier.trainLogReg(
      Classifier.hashedFeatures(corpus.repartition(7), col("id"), col("text"),
        col("y"), buckets = 128).localCheckpoint(),
      buckets = 128, iters = 10, lr = 1.0)
    val b = Classifier.trainLogReg(
      Classifier.hashedFeatures(corpus.coalesce(1), col("id"), col("text"),
        col("y"), buckets = 128).localCheckpoint(),
      buckets = 128, iters = 10, lr = 1.0)
    assert(a.sameElements(b), "weights must be a pure function of the corpus")
  }

  test("token-free and null documents are absent; zero iterations = zero weights") {
    val df = Seq((1L, 1.0, "real words here"), (2L, 0.0, "!!! ..."),
      (3L, 0.0, null: String)).toDF("id", "y", "text")
    val feats = Classifier.hashedFeatures(df, col("id"), col("text"), col("y"), 64)
    assert(feats.select("id").as[Long].collect().toSeq == Seq(1L))
    val w0 = Classifier.trainLogReg(feats, 64, iters = 0)
    assert(w0.forall(_ == 0.0))
  }
}
