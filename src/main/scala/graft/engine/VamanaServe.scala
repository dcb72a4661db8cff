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
      searchSize: Int, entry: Long, maxHops: Int = 64): Seq[Long] =
    walk(art, metric, query, searchSize, entry, maxHops, matchArt = None)

  /** FILTERED beam candidates — the reference's optimistic filtered
    * search (vamana/search.go:27–51, 93–95) re-expressed:
    *
    *   - the search SEEDS with the first `searchSize` in-filter points in
    *     ascending id order (the bitmap-iterator order): when the filter
    *     matches ≤ searchSize points they are ALL seeded, so the filtered
    *     result is exact by construction — the reference's own
    *     too-selective extreme case;
    *   - navigation stays UNFILTERED (removing out-of-filter nodes would
    *     break the graph's navigability);
    *   - a separate result set collects every EXPANDED node that passes
    *     the filter (one id-restricted membership probe per round),
    *     capped at `searchSize` by (distance, id).
    *
    * `matchArt` is the artifact restricted to the filter set (the caller
    * applies the compiled filter — an id semi-join, pushdown-able).
    * Returned gids are in-filter by construction.
    */
  def beamCandidateGidsFiltered(
      art: DataFrame, matchArt: DataFrame, metric: Metric, query: Seq[Float],
      searchSize: Int, entry: Long, maxHops: Int = 64): Seq[Long] =
    walk(art, metric, query, searchSize, entry, maxHops, matchArt = Some(matchArt))

  private def walk(
      art: DataFrame, metric: Metric, query: Seq[Float],
      searchSize: Int, entry: Long, maxHops: Int,
      matchArt: Option[DataFrame]): Seq[Long] = {
    require(searchSize > 0, s"searchSize must be positive (got $searchSize)")
    val spark = art.sparkSession
    import spark.implicits._
    def score(frame: DataFrame, ids: Seq[Long]): Seq[(Long, Double)] =
      frame.filter(col("_gid").isin(ids: _*))
        .select(col("_gid"),
          Distances.distanceToQuery(metric, col("_vec"), query).cast("double"))
        .as[(Long, Double)].collect().toSeq
    val ord = implicitly[Ordering[(Double, Long)]]
    // seeds: the first searchSize in-filter ids ascending (scored), the
    // reference's bitmap-iterator seeding
    val seeds: Seq[(Long, Double)] = matchArt match {
      case None => Nil
      case Some(m) =>
        val ids = m.select(col("_gid")).orderBy(col("_gid").asc)
          .limit(searchSize).as[Long].collect().toSeq
        if (ids.isEmpty) Nil else score(art, ids)
    }
    val init = score(art, Seq(entry))
    if (init.isEmpty && seeds.isEmpty) return Seq.empty
    val seen = scala.collection.mutable.Set[Long]((entry +: seeds.map(_._1)): _*)
    val expanded = scala.collection.mutable.Set[Long]()
    // the in-filter membership verdicts gathered so far (seeds known true)
    val okKnown = scala.collection.mutable.Map[Long, Boolean](
      seeds.map(_._1 -> true): _*)
    var pool = scala.collection.immutable.SortedSet[(Double, Long)](
      (init ++ seeds).map { case (id, d) => (d, id) }: _*)
    // filtered mode: result set of in-filter EXPANDED-or-seeded nodes
    var result = scala.collection.immutable.SortedSet[(Double, Long)](
      seeds.map { case (id, d) => (d, id) }: _*)(ord)
    var hops = 0
    var frontier = pool.iterator.map(_._2).filterNot(expanded).toSeq
    while (frontier.nonEmpty && hops < maxHops) {
      expanded ++= frontier
      // filtered mode: probe membership of newly expanded nodes and admit
      // the passing ones to the result set (reference search.go:93–95)
      matchArt.foreach { m =>
        val unknown = frontier.filterNot(okKnown.contains)
        if (unknown.nonEmpty) {
          val ok = m.filter(col("_gid").isin(unknown: _*))
            .select(col("_gid")).as[Long].collect().toSet
          unknown.foreach(id => okKnown(id) = ok(id))
        }
        val dist = pool.iterator.map { case (d, id) => id -> d }.toMap
        result ++= frontier.collect {
          case id if okKnown(id) && dist.contains(id) => (dist(id), id)
        }
        if (result.size > searchSize) result = result.take(searchSize)
      }
      val nbrs = art.filter(col("_gid").isin(frontier: _*))
        .select(explode(col("_nbrs")).as("_n")).distinct()
        .as[Long].collect().toSeq
        .filterNot(seen)
      if (nbrs.nonEmpty) {
        seen ++= nbrs
        pool ++= score(art, nbrs).map { case (id, d) => (d, id) }
        if (pool.size > searchSize) pool = pool.take(searchSize)
      }
      hops += 1
      frontier = pool.iterator.collect {
        case (_, id) if !expanded(id) => id
      }.toSeq
    }
    matchArt match {
      case None => pool.toSeq.map(_._2)
      case Some(_) => result.toSeq.map(_._2)
    }
  }
}
