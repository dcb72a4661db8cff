package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Distances
import graft.model.IndexKind.Metric

/** Similarity-search operators beyond single-query `near`:
  *
  *  - [[knnJoin]] — batch k-nearest-neighbors: every query row gets its
  *    top-k corpus rows. The query side is broadcast (it is the small
  *    side by construction) so the corpus never shuffles for the join;
  *    the only shuffle is the per-query top-k window, keyed by query id.
  *  - [[signBuckets]] / [[ivfSearch]] — a deterministic IVF-style coarse
  *    quantizer: bucket = sign bits of the first `nBits` dimensions.
  *    Search probes the query's bucket plus all hamming-1 neighbors
  *    (`nprobe` buckets), trading recall for a ~2^nBits scan reduction.
  *    At 100 TB the bucket is the partition key: writing the corpus
  *    partitioned by bucket turns every probe into partition pruning.
  *    (A learned k-means IVF drops in by swapping the bucket expression;
  *    the sign quantizer is used for the oracle because it is
  *    deterministic across engines.)
  */
object Similarity {

  /** For each row of `queries`, the `k` nearest `corpus` rows by `metric`.
    * Output: (query_id, corpus_id, distance, rank).
    */
  def knnJoin(
      queries: DataFrame, qId: Column, qVec: Column,
      corpus: DataFrame, cId: Column, cVec: Column,
      k: Int, metric: Metric): DataFrame = {
    val q = queries.select(qId.as("query_id"), qVec.as("_qv"))
    val c = corpus.select(cId.as("corpus_id"), cVec.as("_cv"))
    val joined = c.crossJoin(broadcast(q))
      .withColumn("distance", Distances.distance(metric, col("_cv"), col("_qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("distance").asc, col("corpus_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "distance", "rank")
  }

  /** Sign-bit coarse bucket of the first `nBits` vector dimensions. */
  def signBucket(vec: Column, nBits: Int): Column =
    (0 until nBits).map { i =>
      when(element_at(vec, i + 1) > 0f, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Assign every corpus row its bucket (the IVF "index build"). */
  def signBuckets(corpus: DataFrame, vec: Column, nBits: Int): DataFrame =
    corpus.withColumn("bucket", signBucket(vec, nBits))

  /** ANN search: scan only the query's bucket and, when `probeNeighbors`,
    * its hamming-1 neighbor buckets.
    */
  def ivfSearch(
      corpus: DataFrame, cId: Column, cVec: Column,
      queryVec: Seq[Float], k: Int, metric: Metric,
      nBits: Int, probeNeighbors: Boolean = true): DataFrame = {
    val qBucket = (0 until nBits).map(i => if (queryVec(i) > 0f) 1 << i else 0).sum
    val probes = qBucket +: (if (probeNeighbors) (0 until nBits).map(i => qBucket ^ (1 << i)) else Nil)
    signBuckets(corpus, cVec, nBits)
      .filter(col("bucket").isin(probes: _*))
      .select(cId.as("id"), col("bucket"),
        Distances.distanceToQuery(metric, cVec, queryVec).as("distance"))
      .orderBy(col("distance").asc, col("id").asc)
      .limit(k)
  }
}
