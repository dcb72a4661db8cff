package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join as an EQUI-join — "which interval(s)
  * contain this value" with no equality key at all (drop the key and the
  * as-of/stream-interval joins don't apply). Spark's planner, given only
  * `p.v BETWEEN i.lo AND i.hi`, falls back to BroadcastNestedLoopJoin —
  * O(|points|·|intervals|) comparisons, the shape PlanLint exists to
  * forbid. The classic fix (used by every spatial/temporal engine;
  * 1-D grid binning) is bucketization: chop the value domain into
  * fixed-width buckets, explode each interval over the buckets it
  * touches, tag each point with its one bucket, and equi-join on the
  * bucket with the BETWEEN as a residual. Each qualifying pair meets in
  * EXACTLY one bucket (the point's), so no dedup pass is needed.
  *
  * Scale: the join is hash/sort-merge on a derived integer key;
  * per-bucket load is bounded by value-density × width, not corpus size.
  * `bucketWidth` trades explode fan-out (an interval costs
  * span/width + 1 rows) against residual selectivity — pick it near the
  * typical interval span. `maxBucketsPerInterval` fails fast (at plan
  * input, executor-side) when an outlier interval would explode
  * pathologically, instead of silently materializing 10^6 rows for it.
  *
  * Domain is integral (long) — timestamps enter via unix_micros; floor
  * division is computed with `pmod` so negative values land in the
  * correct bucket (SQL `div` truncates toward zero).
  */
object RangeJoin {

  /** Pairs (point_id, interval_id, v, lo, hi) for every point value
    * inside [lo, hi] (both inclusive). Null values/bounds never match;
    * inverted intervals (lo > hi) are empty by definition and dropped.
    */
  def pointInInterval(
      points: DataFrame, pId: Column, pVal: Column,
      intervals: DataFrame, iId: Column, iLo: Column, iHi: Column,
      bucketWidth: Long, maxBucketsPerInterval: Int = 100000): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive (got $bucketWidth)")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive (got $maxBucketsPerInterval)")
    val w = bucketWidth
    // floor division via pmod: (x - pmod(x, w)) is the largest multiple
    // of w at or below x; SQL `div` keeps the whole computation in LONG
    // (a double round-trip would corrupt values past 2^53)
    def floorDiv(name: String): Column = expr(s"($name - pmod($name, ${w}L)) div ${w}L")
    val p = points.filter(pId.isNotNull && pVal.isNotNull)
      .select(pId.cast("long").as("point_id"), pVal.cast("long").as("v"))
      .withColumn("_b", floorDiv("v"))
    val i0 = intervals.filter(iId.isNotNull && iLo.isNotNull && iHi.isNotNull)
      .select(iId.cast("long").as("interval_id"),
        iLo.cast("long").as("lo"), iHi.cast("long").as("hi"))
      .filter(col("lo") <= col("hi"))
      .withColumn("_b0", floorDiv("lo"))
      .withColumn("_b1", floorDiv("hi"))
    val guarded = i0.withColumn("_span", col("_b1") - col("_b0") + 1)
      .withColumn("_b", explode(sequence(col("_b0"),
        // executor-side fail-fast BEFORE the explode materializes rows
        when(col("_span") <= maxBucketsPerInterval, col("_b1"))
          .otherwise(raise_error(concat(
            lit(s"interval wider than maxBucketsPerInterval=$maxBucketsPerInterval buckets: id="),
            col("interval_id")))))))
      .select("interval_id", "lo", "hi", "_b")
    p.join(guarded,
        p("_b") === guarded("_b") && col("v") >= col("lo") && col("v") <= col("hi"))
      .select("point_id", "interval_id", "v", "lo", "hi")
  }
}
