package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group best-k selection — the "keep the N best documents per
  * domain/source/language" curation step (the per-bucket quality cap in
  * RefinedWeb/FineWeb-style pipelines). The naive shape is a
  * `row_number()` window partitioned by the group — which shuffles EVERY
  * row into its group's partition and sorts there: for a handful of
  * groups over 100 TB that is skew by construction (and exactly what
  * PlanLintSpec's bounded-window lint exists to forbid). Here the
  * selection is [[Similarity.TopKAgg]] — the bounded-buffer typed
  * aggregator — so the map-side partial reduces each input partition to
  * ≤ k rows per group BEFORE the exchange; the shuffle carries
  * O(partitions × k) rows whatever the corpus size, and a single hot
  * group costs k rows per upstream partition, not its whole membership.
  *
  * Ordering contract: (score desc|asc, id asc) — identical to
  * `row_number() OVER (ORDER BY score DESC, id)` with ties broken by id,
  * so any SQL engine replays the exact selection (the gate oracles it on
  * an integer-exact score).
  */
object Curation {

  /** The k best rows of each group by `score`. Output:
    * (group string, id long, score double, rank int 1-based).
    * Null group/id/score rows are skipped (they can't rank).
    */
  def topKPerGroup(df: DataFrame, group: Column, id: Column, score: Column,
      k: Int, largest: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val idDt = df.select(id).schema.head.dataType
    require(idDt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"id must be numeric (got $idDt) — attach a long surrogate for string ids")
    val spark = df.sparkSession
    import spark.implicits._
    val ordered = df
      .filter(group.isNotNull && id.isNotNull && score.isNotNull)
      .select(group.cast("string").as("_g"),
        (if (largest) negate(score.cast("double")) else score.cast("double")).as("_d"),
        id.cast("long").as("_id"))
      .as[(String, Double, Long)]
    ordered
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new Similarity.TopKAgg(k).toColumn.name("topk"))
      .flatMap { case (g, buf) =>
        // 0.0 - x (not unary minus) so a stored -0.0 surfaces as +0.0 —
        // numerically equal but hash-distinct in the driver's compare
        (0 until buf.n).map(j =>
          (g, buf.ids(j), if (largest) 0.0 - buf.ds(j) else buf.ds(j), j + 1))
      }
      .toDF("group", "id", "score", "rank")
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998):
    * greedily pick k results maximizing λ·relevance − (1−λ)·max cosine
    * similarity to what's already picked — the diversity post-stage a
    * near-dup-heavy corpus needs after `near` (top-k alone returns the
    * duplicate cluster k times). Runs DRIVER-SIDE over the candidate
    * frame, which is legitimate by construction: candidates come from a
    * top-N search and are bounded by its limit — `maxCandidates` fails
    * fast if a caller points it at a corpus. Deterministic: fixed scan
    * order, ties broken by lower id, O(k·n) with running max-sim state.
    *
    * @param candidates (id, relevance, vector) rows; higher relevance =
    *                   better (negate a distance before calling)
    * @return (id, rank, objective) — rank 1-based in selection order
    */
  def mmr(candidates: DataFrame, id: Column, rel: Column, vec: Column,
      k: Int, lambda: Double, maxCandidates: Int = 10000): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1] (got $lambda)")
    require(maxCandidates > 0, s"maxCandidates must be positive (got $maxCandidates)")
    val spark = candidates.sparkSession
    import spark.implicits._
    val rows = candidates
      .filter(id.isNotNull && rel.isNotNull && vec.isNotNull)
      // NaN relevance (or a NaN vector component) would poison the argmax
      // (NaN > -Inf is false, leaving best = -1) — exclude such rows here
      .filter(!isnan(rel.cast("double")) &&
        !exists(vec.cast("array<double>"), x => isnan(x)))
      .select(id.cast("long").as("id"), rel.cast("double").as("rel"),
        vec.cast("array<double>").as("v"))
      .as[(Long, Double, Seq[Double])]
      .collect()
      .sortBy(r => (-r._2, r._1)) // deterministic scan order
    require(rows.length <= maxCandidates,
      s"${rows.length} candidates exceed maxCandidates=$maxCandidates — " +
        "MMR is a post-stage over a bounded top-N, not a corpus operator")
    val vs = rows.map(_._3.toArray)
    val norms = vs.map(v => math.sqrt(v.map(x => x * x).sum))
    def cos(a: Int, b: Int): Double = {
      val denom = norms(a) * norms(b)
      if (denom == 0.0) 0.0
      else vs(a).zip(vs(b)).map { case (x, y) => x * y }.sum / denom
    }
    val n = rows.length
    val picked = Array.newBuilder[(Long, Int, Double)]
    val used = new Array[Boolean](n)
    val maxSim = Array.fill(n)(0.0)
    var step = 0
    while (step < math.min(k, n)) {
      var best = -1; var bestObj = Double.NegativeInfinity
      for (i <- 0 until n if !used(i)) {
        val obj = if (step == 0) rows(i)._2
          else lambda * rows(i)._2 - (1.0 - lambda) * maxSim(i)
        // strict > with (-rel, id)-sorted scan order = lower-id tiebreak
        if (obj > bestObj) { best = i; bestObj = obj }
      }
      require(best >= 0, "MMR argmax found no candidate — unreachable after NaN prefilter")
      used(best) = true
      picked += ((rows(best)._1, step + 1, bestObj))
      for (i <- 0 until n if !used(i)) {
        val s = cos(i, best)
        if (s > maxSim(i)) maxSim(i) = s
      }
      step += 1
    }
    picked.result().toSeq.toDF("id", "rank", "objective")
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009): merge
    * ranked lists from heterogeneous retrievers — BM25, vector near,
    * anything that emits (id, rank) — by Σ_lists 1/(k + rank), the
    * score-calibration-free fusion that consistently beats learned
    * weights in TREC settings (and the standard alternative to the
    * engine's weighted score-sum hybrid, which needs comparable score
    * scales). Shape: a fold of full-outer equi-joins on id — lists are
    * top-N bounded by their retrievers, so every join is broadcast-size;
    * the contribution sum is an explicit left fold over the (static)
    * list sequence, giving the bit-exact cross-engine result integer
    * ranks always do.
    *
    * @param lists ranked frames, each with columns (id, rank), rank
    *              1-based; absent ids contribute 0 from that list
    * @return (id, rrf_score, n_lists) sorted by (score desc, id)
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k >= 0, s"k must be non-negative (got $k)")
    val prepped = lists.zipWithIndex.map { case (df, li) =>
      // a duplicate id inside one list would fan out through the chained
      // full-outer joins and double-count the OTHER lists' contributions;
      // collapse to the best (lowest) rank per id first
      df.select(col("id").cast("long").as("id"),
          col("rank").cast("long").as(s"_r$li"))
        .groupBy("id").agg(min(col(s"_r$li")).as(s"_r$li"))
    }
    val joined = prepped.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val contribs = lists.indices.map(li =>
      coalesce(lit(1.0) / (lit(k.toDouble) + col(s"_r$li")), lit(0.0)))
    val present = lists.indices.map(li =>
      when(col(s"_r$li").isNotNull, 1).otherwise(0))
    joined.select(
        col("id"),
        contribs.reduce(_ + _).as("rrf_score"),
        present.reduce(_ + _).as("n_lists"))
      .orderBy(col("rrf_score").desc, col("id"))
  }
}
