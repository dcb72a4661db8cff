package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.IndexKind.Metric

/** The six distance kernels (reference distance/distance.go:14–67).
  * All are "lower is closer" and operate on float vectors:
  *
  *   euclidean — SQUARED L2 (monotonic, no sqrt, like the reference)
  *   dot       — negated inner product
  *   cosine    — 1 − inner product (assumes pre-normalized inputs)
  *   haversine — great-circle meters between [lat, lon] degree pairs
  *   hamming   — popcount of XOR after binarizing both sides at 0.5
  *   jaccard   — 1 − |a∧b| / |a∨b| after binarizing at 0.5
  *
  * The float→bit contract for hamming/jaccard matches the reference's
  * silent binary-quantizer routing (shard/vectorstore/vectorstore.go:56–67).
  *
  * Implementation note: accumulation is in Double for cross-engine
  * determinism, result surfaced as Float like the reference. Hot paths can
  * swap in the codegen Expression (see VectorDistanceExpr) — the Column
  * API below is the stable surface.
  */
object Distances {

  private val EarthRadiusM = 6371000.0

  /** Distance between a vector column and a literal query vector. */
  def distanceToQuery(metric: Metric, v: Column, query: Seq[Float]): Column =
    distance(metric, v, lit(query.toArray))

  /** Distance between two array<float> columns — routed through the native
    * codegen expression; [[distanceBuiltins]] is the pure-builtin
    * formulation kept as a cross-check in tests.
    */
  def distance(metric: Metric, a: Column, b: Column): Column =
    VectorDistance(a, b, metric)

  /** Built-in (higher-order-function) formulation of the same kernels. */
  def distanceBuiltins(metric: Metric, a: Column, b: Column): Column = metric match {
    case Metric.Euclidean =>
      sumAgg(zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }))
    case Metric.Dot =>
      -sumAgg(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
    case Metric.Cosine =>
      lit(1.0) - sumAgg(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
    case Metric.Haversine =>
      val lat1 = radians(element_at(a, 1).cast("double"))
      val lon1 = radians(element_at(a, 2).cast("double"))
      val lat2 = radians(element_at(b, 1).cast("double"))
      val lon2 = radians(element_at(b, 2).cast("double"))
      val dLat = lat2 - lat1
      val dLon = lon2 - lon1
      val h = pow(sin(dLat / 2), 2) + cos(lat1) * cos(lat2) * pow(sin(dLon / 2), 2)
      lit(2 * EarthRadiusM) * asin(sqrt(h))
    case Metric.Hamming =>
      sumAgg(zip_with(a, b, (x, y) =>
        when((x > 0.5f) =!= (y > 0.5f), 1.0d).otherwise(0.0d)))
    case Metric.Jaccard =>
      val inter = sumAgg(zip_with(a, b, (x, y) =>
        when((x > 0.5f) && (y > 0.5f), 1.0d).otherwise(0.0d)))
      val union = sumAgg(zip_with(a, b, (x, y) =>
        when((x > 0.5f) || (y > 0.5f), 1.0d).otherwise(0.0d)))
      when(union === 0.0d, lit(0.0d)).otherwise(lit(1.0d) - inter / union)
  }

  /** True cosine distance (normalizes both sides) — used by the dedup /
    * similarity extras where inputs are not pre-normalized. Distinct from
    * `Metric.Cosine`, which replicates the reference's 1−dot contract.
    */
  def cosineDistanceNormalized(a: Column, b: Column): Column = {
    val dot = sumAgg(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
    val na = sqrt(sumAgg(transform(a, x => x.cast("double") * x.cast("double"))))
    val nb = sqrt(sumAgg(transform(b, x => x.cast("double") * x.cast("double"))))
    // a zero vector would divide 0/0 into NaN, which silently fails every
    // threshold filter — define it as maximally distant instead
    when(na * nb === 0.0, lit(1.0))
      .otherwise(lit(1.0) - dot / (na * nb))
  }

  def cosineSimilarityNormalized(a: Column, b: Column): Column =
    lit(1.0) - cosineDistanceNormalized(a, b)

  private def sumAgg(arr: Column): Column =
    aggregate(arr, lit(0.0d), (acc, x) => acc + x)
}
