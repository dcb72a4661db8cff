package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer TRAINING — the other major
  * subword family beside [[Bpe]] (Kudo 2018, "Subword Regularization"):
  * instead of growing merges bottom-up, start from a large candidate
  * piece inventory and fit piece probabilities by EM, where each word's
  * likelihood is its best (Viterbi) segmentation under the current
  * model. The T5/ALBERT/XLNet lineage trains exactly this.
  *
  * Distribution shape mirrors the production SentencePiece trainer: the
  * corpus pays ONE explode+groupBy (the word-frequency dictionary); the
  * seed inventory is a substring explode over DISTINCT words (top
  * `seedCap` by exact count, plus every single character for coverage);
  * each EM iteration broadcasts the piece table (bounded by seedCap —
  * the MODEL is small by construction, the CORPUS never is), runs
  * Viterbi per distinct word on executors, and reduces exact
  * freq-weighted piece counts via groupBy. The M-step normalizes on the
  * driver.
  *
  * Determinism: counts are exact longs; probabilities are count/total
  * doubles; Viterbi breaks cost ties by preferring the LONGER piece at
  * each boundary (strict > on double costs computed identically
  * everywhere); seed and final pruning order by (count|prob desc, piece
  * asc). The learned inventory is a pure function of the corpus —
  * golden-pinnable (the vamana_graph convention: an iterative EM is not
  * SQL-replayable).
  */
object UnigramLm {

  /** A fitted model: piece → probability (sums to 1 over the inventory). */
  final case class Model(pieces: Map[String, Double]) {
    require(pieces.nonEmpty, "empty piece inventory")
    /** -ln p with an unknown-piece floor (half the smallest prob). */
    private[operators] val costs: Map[String, Double] =
      pieces.map { case (p, pr) => p -> -math.log(pr) }
    private[operators] val unkCost: Double =
      -math.log(pieces.values.min / 2.0)
    private[operators] val maxLen: Int = pieces.keys.map(_.length).max
  }

  /** Viterbi best segmentation of `word` under `model`: minimize total
    * -ln p over pieces; unknown single characters cost `unkCost` (so
    * every word segments). Cost ties resolve deterministically: at each
    * position the LONGEST piece ending there is tried first and a
    * replacement needs strictly smaller cost, so the longer final piece
    * wins ("abc" under uniform a/b/c/ab/bc → [a, bc]).
    */
  private[graft] def viterbi(word: String, model: Model): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val best = Array.fill(n + 1)(Double.MaxValue)
    val back = new Array[Int](n + 1) // piece start for the best path ending at i
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - model.maxLen)
      while (j < i) {
        val piece = word.substring(j, i)
        val c = model.costs.getOrElse(piece,
          if (i - j == 1) model.unkCost else Double.MaxValue)
        if (c < Double.MaxValue && best(j) != Double.MaxValue) {
          val cand = best(j) + c
          // j ascends, so the LONGEST piece ending at i is tried first;
          // replacement needs a strictly smaller cost — the longest
          // equal-cost piece wins, deterministically
          if (cand < best(i)) { best(i) = cand; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    var pos = n
    val stack = scala.collection.mutable.ArrayBuffer.empty[String]
    while (pos > 0) {
      val j = back(pos)
      stack += word.substring(j, pos)
      pos = j
    }
    stack.reverse.toSeq
  }

  /** Train on the corpus: seed inventory → `emIters` EM rounds → prune
    * to `vocabSize` (single characters always retained for coverage).
    */
  def train(df: DataFrame, text: Column,
      vocabSize: Int = 200, maxPieceLen: Int = 6, emIters: Int = 3,
      seedCap: Int = 2000, minCount: Long = 2L): Model = {
    require(vocabSize > 0 && maxPieceLen > 0 && emIters >= 1 && seedCap > 0,
      "train parameters must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val words = Bpe.wordCounts(df, text)
      .filter(col("cnt") >= minCount)
      .as[(String, Long)].persist()
    require(words.count() > 0, "no words above minCount — corpus too small")
    // seed: substring counts over distinct words, freq-weighted
    val maxL = maxPieceLen
    val subCounts = words.flatMap { case (w, c) =>
        for {
          i <- 0 until w.length
          l <- 1 to math.min(maxL, w.length - i)
        } yield (w.substring(i, i + l), c)
      }
      .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .map { case (p, c) => (p, c) }
      .collect()
    val chars = subCounts.filter(_._1.length == 1)
    val multi = subCounts.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }.take(seedCap)
    var counts: Seq[(String, Long)] = (chars ++ multi).toSeq
    var model = normalize(counts)
    // EM: E-step = Viterbi per distinct word (freq-weighted piece counts,
    // exact longs); M-step = renormalize on the driver
    for (_ <- 1 to emIters) {
      val m = model
      val pieceCounts = words.flatMap { case (w, c) =>
          viterbi(w, m).map(p => (p, c))
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case (p, c) => (p, c) }
        .collect()
      // coverage: single chars survive even when the E-step stops using
      // them (prob floor one count), so unseen words stay segmentable
      val seen = pieceCounts.map(_._1).toSet
      val keepChars = chars.filter { case (p, _) => !seen.contains(p) }
        .map { case (p, _) => (p, 1L) }
      counts = (pieceCounts ++ keepChars).toSeq
      model = normalize(counts)
    }
    words.unpersist()
    // prune: top vocabSize by (count desc, piece asc), chars always kept
    val (prunedChars, prunedMulti) = counts.partition(_._1.length == 1)
    val kept = prunedChars ++ prunedMulti
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - prunedChars.size))
    normalize(kept)
  }

  private def normalize(counts: Seq[(String, Long)]): Model = {
    val total = counts.map(_._2).sum.toDouble
    Model(counts.map { case (p, c) => p -> (c / total) }.toMap)
  }

  /** Persist the fitted inventory as a parquet artifact (piece, prob) —
    * the serving handoff, symmetric with [[Bpe.saveMerges]].
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    model.pieces.toSeq.sortBy(_._1).toDF("piece", "prob")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a [[save]]d artifact back into a serving model. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    import spark.implicits._
    Model(spark.read.parquet(dir).select("piece", "prob")
      .as[(String, Double)].collect().toMap)
  }

  /** Tokenize each row's text: per-token Viterbi under the model, pieces
    * re-concatenated per doc in token order. Output (id, pieces
    * array<string>, n_pieces).
    */
  def tokenize(df: DataFrame, id: Column, text: Column, model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = model
    df.filter(text.isNotNull && id.isNotNull)
      .select(id.cast("long").as("id"), Dedup.tokens(text).as("toks"))
      .as[(Long, Seq[String])]
      .map { case (i, toks) => (i, toks.flatMap(w => viterbi(w, m))) }
      .map { case (i, ps) => (i, ps, ps.length) }
      .toDF("id", "pieces", "n_pieces")
  }
}
