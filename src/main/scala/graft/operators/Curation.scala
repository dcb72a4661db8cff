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
}
