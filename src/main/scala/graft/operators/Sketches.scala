package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) as a DataFrame program. The scale story: exact token counting
  * shuffles a VOCABULARY-sized frame (every distinct token is a shuffle
  * key); the sketch pass shuffles at most `depth × width` rows no
  * matter how large the corpus — map-side combine collapses each
  * partition's contribution to the sketch cells it touched, so the
  * exchange is bounded by the sketch, not the data. Estimates obey the
  * classic one-sided bound: est ≥ true always (counters only ever
  * over-count on collisions), and est ≤ true + εN with probability
  * 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  *
  * Hash rows are `xxhash64(token, row-seed)` with FIXED seeds — the
  * sketch is a pure function of the corpus multiset (layout- and
  * order-independent), which is what lets the driver gate pin its
  * output as a golden.
  */
object Sketches {

  /** Build the sketch: one row per touched cell, `(d, bucket, cnt)`,
    * at most `depth × width` rows total. `items` is any column of
    * string items (tokens, urls, keys) — pre-exploded by the caller so
    * the sketch composes with every tokenizer in the engine.
    */
  def countMinSketch(items: DataFrame, item: Column, width: Int, depth: Int): DataFrame = {
    require(width > 0 && depth > 0, s"bad sketch dims ($width, $depth)")
    items
      .select(item.cast("string").as("_it"))
      .filter(col("_it").isNotNull)
      .select(col("_it"), explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select(col("d"),
        pmod(xxhash64(col("_it"), col("d")), lit(width.toLong)).cast("int").as("bucket"))
      .groupBy("d", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate each candidate item against a sketch:
    * `est(x) = min_d cnt[d, h_d(x)]` — the min over rows bounds the
    * collision inflation. The sketch side is at most depth×width rows,
    * so the join broadcasts; a candidate whose buckets were never
    * touched estimates 0 (cannot happen for items that were in the
    * corpus).
    */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame, item: Column,
      width: Int, depth: Int): DataFrame = {
    val cand = candidates.select(item.cast("string").as("item"))
      // the sketch never counted nulls (countMinSketch filters them), and
      // xxhash64(null, d) degenerates to a hash of the seed alone — an
      // unfiltered null candidate would collide into a REAL cell and
      // report a spurious nonzero estimate
      .filter(col("item").isNotNull)
      .distinct()
      .select(col("item"), explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select(col("item"), col("d"),
        pmod(xxhash64(col("item"), col("d")), lit(width.toLong)).cast("int").as("bucket"))
    cand
      .join(broadcast(sketch), Seq("d", "bucket"), "left_outer")
      .groupBy("item")
      // every depth row must contribute: a missing cell means count 0
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** One-pass heavy hitters: sketch the corpus, then rank a candidate
    * set by its estimates and keep the top `k` (estimate-descending,
    * item ascending on ties — deterministic). `candidates` defaults to
    * the distinct items themselves; at 100 TB pass a sampled or
    * domain-known candidate frame instead — the SKETCH is the
    * bounded-memory single pass, candidate enumeration is the caller's
    * recall/cost dial (a candidate absent from the frame is never
    * reported, exactly the sketch's streaming contract).
    */
  def heavyHitters(items: DataFrame, item: Column, width: Int, depth: Int, k: Int,
      candidates: Option[DataFrame] = None): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val sketch = countMinSketch(items, item, width, depth)
    val cand = candidates.getOrElse(items.select(item.cast("string").as("item")))
    cmsEstimate(sketch, cand, col("item"), width, depth)
      .orderBy(col("est").desc, col("item"))
      .limit(k)
  }
}
