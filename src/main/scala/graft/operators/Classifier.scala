package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A trained, fastText-style document-quality CLASSIFIER — the supervised
  * component of the CCNet/LLaMA-lineage pipelines (a linear classifier
  * over hashed n-gram features, trained to separate a curated slice from
  * the raw crawl, then used to score everything): batch logistic
  * regression, trained BY Spark jobs — one full-batch gradient step per
  * iteration — with the learned weights living on the driver (`buckets`
  * doubles, ~8 KB).
  *
  * Where [[TextAnalysis.dsirWeights]] is the GENERATIVE scorer of this
  * family (Naive-Bayes log-odds in closed form), this is the
  * DISCRIMINATIVE one: trained weights minimize log-loss directly, the
  * standard quality-classifier construction.
  *
  * Scale (100 TB): the feature frame is built once (per-row primitive
  * hashing, one narrow checkpoint) and every iteration is ONE job over
  * it — per-doc sigmoid via an ordered fold, then a `buckets`-bounded
  * gradient aggregation (map-side partial combine; only B rows reach the
  * driver). Iterations are sequential by nature (each needs the previous
  * weights), but each is a full corpus pass — 20 iterations = 20 passes,
  * not 20 shuffle pyramids.
  *
  * Determinism (what makes the driver golden pinnable): the per-doc dot
  * product folds the SORTED sparse feature array sequentially (array
  * order is part of the frame, so the double result is independent of
  * partition layout); each gradient contribution is rounded through
  * DECIMAL(28,12) BEFORE the order-free exact DECIMAL sum; the weight
  * update itself is driver arithmetic. The learned weights are a pure
  * function of (corpus, labels, hyperparameters) — ClassifierSpec's
  * layout-independence law asserts bit-equality.
  */
object Classifier {

  /** One row per document: label (0/1 double) and the SORTED sparse
    * hashed unigram+bigram feature vector `array<struct<_1: bucket int,
    * _2: weight double>>`, weights = bucket count / total feature count
    * (normalized TF — the fastText convention). Same bytes hashed as
    * [[TextAnalysis.dsirWeights]] (token, "a b" bigram → 60-bit md5 mod
    * buckets), so the two scorers see the same feature space. Token-free
    * documents are absent (no evidence to classify).
    */
  def hashedFeatures(
      df: DataFrame, id: Column, text: Column, label: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive (got $buckets)")
    val featUdf = udf { (toks: Seq[String]) =>
      if (toks == null || toks.isEmpty) Array.empty[(Int, Double)]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val counts = scala.collection.mutable.HashMap.empty[Int, Long]
        val n = toks.length
        var i = 0
        while (i < n) {
          val b = (Dedup.hash60Local(md, toks(i)) % buckets).toInt
          counts.update(b, counts.getOrElse(b, 0L) + 1L)
          i += 1
        }
        var j = 0
        while (j < n - 1) {
          val b = (Dedup.hash60Local(md, toks(j) + " " + toks(j + 1)) % buckets).toInt
          counts.update(b, counts.getOrElse(b, 0L) + 1L)
          j += 1
        }
        val total = (2 * n - 1).toDouble
        counts.toArray.sortBy(_._1).map { case (b, c) => (b, c / total) }
      }
    }
    df.filter(text.isNotNull)
      .select(id.as("id"), label.cast("double").as("y"),
        featUdf(Dedup.tokens(text)).as("feats"))
      .filter(size(col("feats")) > 0)
  }

  /** Train logistic-regression weights by full-batch gradient descent:
    * w ← w − lr/n · Σ_d x_d (σ(w·x_d) − y_d), `iters` times. `featDf`
    * is a [[hashedFeatures]] frame; pass it CHECKPOINTED when training
    * (each iteration re-reads it). Returns the weight vector.
    */
  def trainLogReg(
      featDf: DataFrame, buckets: Int, iters: Int = 20,
      lr: Double = 1.0): Array[Double] = {
    require(iters >= 0, s"iters must be >= 0 (got $iters)")
    val n = featDf.count().toDouble
    val w = new Array[Double](buckets)
    if (n == 0) return w
    var it = 0
    while (it < iters) {
      val p = probUdf(w.clone())
      val grad = featDf
        .withColumn("_p", p(col("feats")))
        .select(col("_p"), col("y"), explode(col("feats")).as("f"))
        .select(col("f._1").as("b"),
          // contribution rounded per row, THEN summed exactly: a plain
          // double SUM depends on partition/merge order and would unpin
          // the golden under a different layout
          ((col("_p") - col("y")) * col("f._2"))
            .cast(DecimalType(28, 12)).as("g"))
        .groupBy("b").agg(sum(col("g")).as("g"))
        .collect()
      grad.foreach { r =>
        w(r.getInt(0)) -= lr * r.getDecimal(1).doubleValue() / n
      }
      it += 1
    }
    w
  }

  /** σ(w·x) per document over a [[hashedFeatures]] frame: (id, y, score).
    * The dot product folds the sorted feature array sequentially — the
    * double is a pure function of (doc, w), independent of layout.
    */
  def scoreLogReg(featDf: DataFrame, weights: Array[Double]): DataFrame =
    featDf.select(col("id"), col("y"),
      probUdf(weights.clone())(col("feats")).as("score"))

  private def probUdf(w: Array[Double]) = udf { (feats: Seq[Row]) =>
    var z = 0.0
    feats.foreach(f => z += f.getDouble(1) * w(f.getInt(0)))
    1.0 / (1.0 + math.exp(-z))
  }
}
