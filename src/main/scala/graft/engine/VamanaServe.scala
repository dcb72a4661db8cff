package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Distances
import graft.model.IndexKind.Metric

/** Engine-side beam search over a [[VamanaVectorIndex]] serving frame —
  * the batch-engine face of the reference's greedy graph search
  * (reference shard/index/vamana/search.go:9–102).
  *
  * The traversal is HOP-BATCHED: instead of expanding one nearest
  * unexpanded node per step (the single-node serving loop,
  * [[graft.operators.VamanaBuild.greedySearch]]), every unexpanded pool
  * member expands in the same round — one distributed lookup fetches all
  * their adjacency lists, one more scores all unseen neighbors with the
  * codegen distance kernel, and the driver merges the ≤ searchSize pool.
  * Rounds ≈ graph hops to the query's neighborhood (tens), not beam
  * steps (hundreds); the batched frontier explores a superset of the
  * sequential beam's nodes per round, so pool quality is never worse.
  *
  * Scale (100 TB): driver state is bounded by the pool + visited set
  * (≤ searchSize · maxHops ids); each round's two scans are id-equality
  * restrictions over the persisted NARROW artifact — on a bucketed
  * artifact these are partition-pruned point lookups, the batch analogue
  * of the reference's bbolt page reads. A latency-serving layer would
  * hold the same artifact in a keyed store; this face exists so a JSON
  * `"approx": true` query is answerable entirely inside the engine.
  *
  * Determinism: every round collects its complete frontier/neighbor set
  * before merging, the pool orders by (distance, id), and the graph
  * artifact itself is a pure function of the corpus (VamanaBuild's
  * sorted-rank construction) — the candidate set is layout-independent.
  */
object VamanaServe {

  /** The final beam pool (graph ids, ≤ searchSize) for `query`, walked
    * from `entry`. Empty when the artifact is empty.
    */
  def beamCandidateGids(
      art: DataFrame, metric: Metric, query: Seq[Float],
      searchSize: Int, entry: Long, maxHops: Int = 64): Seq[Long] = {
    require(searchSize > 0, s"searchSize must be positive (got $searchSize)")
    val spark = art.sparkSession
    import spark.implicits._
    def score(ids: Seq[Long]): Seq[(Long, Double)] =
      art.filter(col("_gid").isin(ids: _*))
        .select(col("_gid"),
          Distances.distanceToQuery(metric, col("_vec"), query).cast("double"))
        .as[(Long, Double)].collect().toSeq
    val init = score(Seq(entry))
    if (init.isEmpty) return Seq.empty
    val seen = scala.collection.mutable.Set[Long](entry)
    val expanded = scala.collection.mutable.Set[Long]()
    var pool = scala.collection.immutable.SortedSet[(Double, Long)](
      init.map { case (id, d) => (d, id) }: _*)
    var hops = 0
    var frontier = Seq(entry)
    while (frontier.nonEmpty && hops < maxHops) {
      expanded ++= frontier
      val nbrs = art.filter(col("_gid").isin(frontier: _*))
        .select(explode(col("_nbrs")).as("_n")).distinct()
        .as[Long].collect().toSeq
        .filterNot(seen)
      if (nbrs.nonEmpty) {
        seen ++= nbrs
        pool ++= score(nbrs).map { case (id, d) => (d, id) }
        if (pool.size > searchSize) pool = pool.take(searchSize)
      }
      hops += 1
      frontier = pool.iterator.collect {
        case (_, id) if !expanded(id) => id
      }.toSeq
    }
    pool.toSeq.map(_._2)
  }
}
