package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING and encoding — the step the
  * [[TextAnalysis.vocabulary]] doc calls "the tokenizer-training
  * precursor": this operator is the tokenizer training itself.
  *
  * Classic byte-pair-encoding (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" §3.2) trains on
  * the WORD-FREQUENCY DICTIONARY, not the raw corpus: state is one row
  * per distinct word (symbols + count), which is what makes the algorithm
  * distribute —
  *
  *   1. word counts: one explode + groupBy over the corpus (the only
  *      corpus-sized pass; map-side partial aggregation absorbs stop-word
  *      heat exactly as vocabulary() does);
  *   2. each merge round runs over the DICT frame only: count adjacent
  *      symbol pairs weighted by word count (explode + groupBy — pair
  *      count is a sum of longs, exact and order-free), pick the argmax
  *      with a deterministic tiebreak (count desc, then pair string asc —
  *      a TakeOrdered, never a global window), apply the merge with a
  *      primitive left-to-right loop, localCheckpoint the new dict (eager
  *      — truncates the per-round lineage so round r does not replay
  *      rounds 1..r−1; no CacheManager entry).
  *
  * At 100 TB the dict is ~10⁷–10⁸ rows where the corpus is ~10¹¹ — each
  * round shuffles vocabulary-sized data, and round count = merge count by
  * construction. `minWordCount` prunes the dict's long tail BEFORE
  * training (the standard large-corpus trick); `minPairCount` stops
  * training when no pair clears the support floor.
  *
  * Everything is deterministic: exact long counts, total tiebreak order,
  * order-insensitive merge application — the learned merge table is a
  * pure function of the corpus, which is what lets the driver queries pin
  * value goldens (the vamana_graph / pq_adc_topk convention; DuckDB
  * cannot replay an iterative argmax loop).
  */
object Bpe {

  /** Terminal word marker (its own symbol, the Sennrich formulation) —
    * distinguishes "st" inside a word from "st" ending one. Contains
    * non-alphanumeric chars, so it can never collide with corpus symbols
    * (tokens are letter/digit runs).
    */
  val EndMark = "</w>"

  /** Pair-key separator for the counting stage. U+0001 cannot appear in
    * any symbol: base symbols are single alphanumeric code points plus
    * [[EndMark]], and merged symbols are concatenations of those.
    */
  private val Sep = '\u0001'

  private def symbolsOf(w: String): Seq[String] =
    w.map(_.toString) :+ EndMark

  /** Left-to-right non-overlapping replacement of the adjacent pair
    * (a, b) by the fused symbol a+b — the merge application both training
    * rounds and encoding share.
    */
  private[operators] def applyMerge(
      syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Encode ONE word under a learned merge table: repeatedly apply the
    * lowest-rank merge present among the word's adjacent pairs until none
    * applies (the standard BPE encode loop). Pure function — shared by
    * [[encode]]'s distinct-word UDF and the specs' hand checks.
    */
  private[graft] def encodeWord(
      w: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = symbolsOf(w)
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var at = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; at = i }
        }
        i += 1
      }
      if (at < 0) done = true
      else {
        syms = applyMerge(syms, syms(at), syms(at + 1))
        done = syms.length < 2
      }
    }
    syms
  }

  /** The word-frequency dict: one row per distinct token with its corpus
    * count — BPE training's entire input.
    */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.filter(text.isNotNull)
      .select(explode(Dedup.tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Learn up to `numMerges` merges. Returns the ranked merge table
    * driver-side (it IS driver-sized: one (left, right) pair per merge —
    * a 50k-merge vocabulary is 50k tiny rows; the DICT the rounds iterate
    * over stays distributed throughout).
    *
    * Round latency: one Spark job per merge round is the honest
    * distributed shape, but a production 32k–50k-merge vocabulary would
    * make it a multi-hour driver-coordinated loop. After `minWordCount`
    * pruning the dict is usually driver-sized (one row per DISTINCT
    * word — ~10⁷ at 100 TB where the corpus is ~10¹¹), so when it fits
    * `driverDictBudget` rows the merge loop finishes IN ONE PASS
    * driver-side over the collected dict — same exact long counts, same
    * (count desc, pair-bytes asc) tiebreak (UTF-8 byte order, matching
    * Spark's UTF8String comparison), bit-identical merge table (BpeSpec
    * law). The corpus still pays only the one distributed word-count
    * pass; set the budget to 0 to force the per-round distributed loop
    * (a dict too large to collect).
    */
  def learnMerges(
      df: DataFrame, text: Column, numMerges: Int,
      minPairCount: Long = 2L, minWordCount: Long = 1L,
      driverDictBudget: Long = 2000000L): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0 (got $numMerges)")
    val symUdf = udf { (w: String) => symbolsOf(w) }
    val pairUdf = udf { (syms: Seq[String]) =>
      if (syms.length < 2) Array.empty[String]
      else Array.tabulate(syms.length - 1)(i => syms(i) + Sep + syms(i + 1))
    }
    var dict = wordCounts(df, text)
      .filter(col("cnt") >= minWordCount)
      .select(symUdf(col("w")).as("syms"), col("cnt"))
      .localCheckpoint()
    if (numMerges > 0 && driverDictBudget > 0 && dict.count() <= driverDictBudget) {
      val rows = dict.collect()
        .map(r => (r.getSeq[String](0), r.getLong(1)))
      return learnMergesDriver(rows, numMerges, minPairCount)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = numMerges > 0
    while (continue && merges.length < numMerges) {
      val best = dict
        .select(col("cnt"), explode(pairUdf(col("syms"))).as("p"))
        .groupBy("p").agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("p").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(1) < minPairCount) continue = false
      else {
        val key = best(0).getString(0)
        val cut = key.indexOf(Sep.toInt)
        val (a, b) = (key.substring(0, cut), key.substring(cut + 1))
        merges += ((a, b))
        val applyUdf = udf { (syms: Seq[String]) => applyMerge(syms, a, b) }
        val next = dict.select(applyUdf(col("syms")).as("syms"), col("cnt"))
          .localCheckpoint()
        dict = next
      }
    }
    merges.toSeq
  }

  /** The driver-side merge loop over a collected word-frequency dict —
    * semantics IDENTICAL to the distributed per-round loop: exact long
    * pair counts, argmax by (count desc, pair-key bytes asc). The key
    * comparison is over UTF-8 BYTES (unsigned), not Java chars: Spark's
    * `orderBy(col("p").asc)` compares UTF8String binary, and the two
    * orders diverge for non-ASCII symbols — a char-wise compare here
    * would silently break the BpeSpec driver≡distributed law on
    * non-Latin corpora.
    */
  private[operators] def learnMergesDriver(
      dict0: Seq[(Seq[String], Long)], numMerges: Int,
      minPairCount: Long): Seq[(String, String)] = {
    var words = dict0.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = syms(i) + Sep + syms(i + 1)
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      var bestKey: String = null
      var bestBytes: Array[Byte] = null
      var bestCount = Long.MinValue
      counts.foreach { case (k, c) =>
        if (c > bestCount) {
          bestKey = k; bestBytes = null; bestCount = c
        } else if (c == bestCount) {
          if (bestBytes == null) bestBytes = bestKey.getBytes("UTF-8")
          val kb = k.getBytes("UTF-8")
          if (java.util.Arrays.compareUnsigned(kb, bestBytes) < 0) {
            bestKey = k; bestBytes = kb
          }
        }
      }
      if (bestKey == null || bestCount < minPairCount) continue = false
      else {
        val cut = bestKey.indexOf(Sep.toInt)
        val (a, b) = (bestKey.substring(0, cut), bestKey.substring(cut + 1))
        merges += ((a, b))
        words = words.map { case (syms, c) => (applyMerge(syms, a, b), c) }
      }
    }
    merges.toSeq
  }

  /** The learned merge table as a DataFrame (rank, left, right) — the
    * artifact a serving tokenizer loads.
    */
  def mergesFrame(
      spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("rank", "left", "right")
  }

  /** Persist the learned merge table as a parquet artifact (rank, left,
    * right) — the tokenizer a serving layer ships. Driver-sized by
    * construction (one row per merge).
    */
  def saveMerges(
      spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], dir: String): Unit =
    mergesFrame(spark, merges).coalesce(1)
      .write.mode("overwrite").parquet(dir)

  /** Load a [[saveMerges]] artifact, rank order restored. */
  def loadMerges(
      spark: org.apache.spark.sql.SparkSession, dir: String): Seq[(String, String)] =
    spark.read.parquet(dir).orderBy("rank")
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Tokenize: the actual per-document subword sequence (what a training
    * pipeline feeds the model), not just counts. Same shape as [[encode]]:
    * the merge loop runs ONCE per distinct word; a token-keyed equi-join
    * fans each word's subword array back onto its positioned occurrences,
    * and the per-document reassembly is an id-bounded aggregation ordered
    * by word position (array_sort over (pos, subs) structs — never a
    * global window).
    */
  def tokenize(
      df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val ranks = merges.zipWithIndex.map { case ((a, b), r) => (a, b) -> r }.toMap
    val subUdf = udf { (w: String) => encodeWord(w, ranks) }
    val occ = df.filter(text.isNotNull)
      .select(id.as("id"), posexplode(Dedup.tokens(text)).as(Seq("pos", "w")))
    val wsub = occ.select("w").distinct()
      .withColumn("_subs", subUdf(col("w")))
    occ.join(wsub, "w")
      .groupBy("id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("_subs")))),
        s => s.getField("_subs"))).as("bpe_tokens"))
  }

  /** Per-document BPE token counts under a learned merge table. The
    * encode loop runs ONCE per distinct word (groupBy first), then a
    * token-keyed equi-join fans the subword counts back onto the
    * occurrences — at 100 TB the expensive loop is vocabulary-sized while
    * the corpus-sized side is one join + one id-bounded aggregation (AQE
    * broadcasts the encoded-vocab side when it is small enough).
    */
  def encode(
      df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val ranks = merges.zipWithIndex.map { case ((a, b), r) => (a, b) -> r }.toMap
    val nSubUdf = udf { (w: String) => encodeWord(w, ranks).length.toLong }
    val occ = df.filter(text.isNotNull)
      .select(id.as("id"), explode(Dedup.tokens(text)).as("w"))
    val wlen = occ.select("w").distinct()
      .withColumn("n_sub", nSubUdf(col("w")))
    occ.join(wlen, "w")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_bpe_tokens"))
  }
}
