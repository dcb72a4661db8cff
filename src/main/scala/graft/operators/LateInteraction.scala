package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Late-interaction retrieval scoring (the ColBERT family, Khattab &
  * Zaharia 2020): a document is a BAG of vectors (per-token or per-chunk
  * embeddings) and its score for a multi-vector query is
  * Σ_q max_{v ∈ doc} cos(q, v) — each query vector independently finds
  * its best match inside the document, which is what lets one relevant
  * passage carry a long document where single-vector pooling drowns it.
  *
  * Spark shape: the query vectors are LITERALS folded into per-row
  * Column chains (explicit left folds, the repo's cross-engine IEEE
  * contract — any engine replaying the chain gets the bit-identical
  * cosine), the per-document `max` is an ordinary order-free aggregate
  * on the group key, and the final Σ over query vectors is an explicit
  * small sum — so the whole operator is one scan + one bounded groupBy,
  * no explosion of (doc × query-token) pairs beyond the row itself.
  */
object LateInteraction {

  /** Scores each group (document) of `corpus` against `queries`.
    * @param queries the query's vectors (each length dIn), driver-side
    * @return (group long, score double) — Σ_q max_v cos(q,v); groups
    *         whose vectors are all zero-norm are skipped
    */
  def maxSimScore(corpus: DataFrame, group: Column, vec: Column,
      queries: Seq[Seq[Double]], dIn: Int): DataFrame = {
    require(queries.nonEmpty, "need at least one query vector")
    require(dIn > 0, s"dIn must be positive (got $dIn)")
    queries.foreach(q => require(q.length == dIn,
      s"query vector length ${q.length} != dIn $dIn"))
    val qNorms = queries.map(q => math.sqrt(q.map(x => x * x).sum))
    qNorms.foreach(nq => require(nq > 0, "zero-norm query vector"))
    // try_element_at, not element_at: Catalyst may reorder the n2 > 0
    // predicate next to the size guard, evaluating the chain on a
    // too-short row — ANSI element_at then ERRORS where try_ yields null
    // (and null n2 fails n2 > 0, which is the right outcome)
    def el(i: Int): Column = try_element_at(vec, lit(i + 1)).cast("double")
    // self-dot chain (explicit left fold), inlined wherever needed so
    // the value is one deterministic expression, not a renamed column
    val n2 = (0 until dIn).map(i => el(i) * el(i)).reduce(_ + _)
    val sims = queries.zipWithIndex.map { case (q, qi) =>
      val dot = (0 until dIn).map(i => el(i) * lit(q(i))).reduce(_ + _)
      (dot / (sqrt(n2) * lit(qNorms(qi)))).as(s"_s$qi")
    }
    val maxes = queries.indices.map(qi => max(col(s"_s$qi")).as(s"_m$qi"))
    corpus
      .filter(group.isNotNull && vec.isNotNull &&
        org.apache.spark.sql.functions.size(vec) >= dIn)
      .filter(n2 > 0)
      .select((group.cast("long").as("group") +: sims): _*)
      .groupBy("group")
      .agg(maxes.head, maxes.tail: _*)
      .select(col("group"),
        queries.indices.map(qi => col(s"_m$qi")).reduce(_ + _).as("score"))
  }
}
