package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Distances
import graft.model.IndexKind.Metric

/** Batch Vamana/DiskANN graph construction.
  *
  * The reference builds its graph point-at-a-time (greedy search → robust
  * prune → bidirectional patch, vamana/insert.go:16–68) — inherently
  * sequential. The batch variant replaces search-based candidate
  * generation with NN-Descent-style rounds, which is how DiskANN-family
  * systems build at scale:
  *
  *   1. init: a deterministic ring over the id order (guarantees strong
  *      connectivity from round zero);
  *   2. each round: candidates = current edges ∪ reversed edges ∪
  *      neighbors-of-neighbors (one self-join of the edge list), distances
  *      via the codegen kernel, then per-node α-robust pruning (reference
  *      search.go:106–138 semantics) over the collected candidate list;
  *   3. the final edge set is the pruned graph ∪ the ring backbone — one
  *      extra edge per node buys unconditional BFS connectivity (the
  *      reference re-attaches stragglers to the start node instead,
  *      vamana.go:136–263).
  *
  * Everything distributes: rounds are joins + groupBy on node id; the only
  * per-node sequential piece is the prune over ≤ ~R² candidates, which
  * runs inside an aggregation UDF. Output: (id, neighbors array<long>),
  * the index artifact a serving layer consumes.
  */
object VamanaBuild {

  final case class Params(
      degreeBound: Int = 64,
      alpha: Double = 1.2,
      iterations: Int = 2,
      ringDegree: Int = 4,
      randomDegree: Int = 8,
      /** Per-node candidate-list cap per round (the DiskANN "L" list):
        * bounds the prune UDF to O(L²) and the shuffle to L vectors per
        * node; neighbor-of-neighbor fan-out is quadratic without it.
        */
      maxCandidates: Int = 128,
      /** Per-node sample of the undirected adjacency fed into the
        * neighbor-of-neighbor self-join (NN-Descent's ρK sampling): the
        * join fan-out is sampleDegree² per node instead of degree², which
        * is the round's dominant cost. Deterministic md5-ranked sample.
        */
      sampleDegree: Int = 24)

  /** α-robust prune (reference vamana/search.go:106–138): walk candidates
    * by ascending distance; keep the closest remaining; drop any later
    * candidate j with α·dist(kept, j) < dist(node, j); stop at the degree
    * bound. The α margin is applied sign-safely: distances can be
    * negative under the dot metric, where a plain multiply would INVERT
    * α's semantics (α>1 must always make pruning harder, not easier).
    */
  def robustPrune(
      cands: Seq[(Double, Long, Array[Float])],
      alpha: Double, degreeBound: Int, metric: Metric): Seq[Long] = {
    val sorted = cands.sortBy(c => (c._1, c._2)).toArray
    val removed = new Array[Boolean](sorted.length)
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < sorted.length && kept.length < degreeBound) {
      if (!removed(i)) {
        val (_, id, vec) = sorted(i)
        kept += id
        var j = i + 1
        while (j < sorted.length) {
          if (!removed(j)) {
            val (dj, _, vj) = sorted(j)
            val d = dist(metric, vec, vj)
            val scaled = if (d >= 0) alpha * d else d / alpha
            if (scaled < dj) removed(j) = true
          }
          j += 1
        }
      }
      i += 1
    }
    kept.toSeq
  }

  /** The shared scalar kernel (co-located with the codegen kernel in
    * VectorDistanceExpr.scala, so the formulations cannot drift apart) —
    * the prune compares this against candidate distances computed by the
    * codegen kernel, so the two must be commensurable.
    */
  private def dist(metric: Metric, a: Array[Float], b: Array[Float]): Double =
    graft.functions.VectorDistance.scalarDistance(metric, a, b)

  /** Build the graph. `df` must expose a LONG id and an array<float>
    * vector; output is (id, neighbors array<long>) — one row for EVERY
    * input node (a singleton corpus yields its node with [] neighbors).
    */
  def build(
      df: DataFrame, id: Column, vec: Column,
      metric: Metric, params: Params = Params()): DataFrame = {
    val spark = df.sparkSession
    val vecs = df.select(id.cast("long").as("id"), vec.as("vec")).persist()

    // init = ring over the rank order (connectivity backbone) + per-node
    // deterministic pseudo-random LONG-RANGE links (md5-derived offsets).
    // NN-Descent needs the long links: with only local init the
    // neighbor-of-neighbor rounds explore an id-local neighborhood and
    // recall collapses as n grows (measured: 0.98 @500 nodes → 0.32 @2000
    // with ring-only init; random links restore global mixing).
    //
    // Ranks are assigned with RDD sortBy(id) + zipWithIndex (range
    // partitioning, per-partition counts, one tiny driver reduce) — NOT a
    // global Window.orderBy, which would pull every id into a single
    // partition and wall at 10⁹ nodes. The sort makes the rank order — and
    // therefore the ring, the md5-derived long links, and the whole built
    // artifact — a pure function of the CORPUS, independent of partition
    // layout: the same ids built under any split planning yield the
    // byte-identical graph (every downstream stage is already
    // order-insensitive: cappedCandidates ranks by (distance, dst),
    // robustPrune sorts its candidate list, toAdjacency sorts neighbor
    // arrays). One build-time sort shuffle buys a deterministic,
    // goldenable artifact — the driver entry hash-compares it.
    val ranked = {
      import spark.implicits._
      vecs.select(col("id")).as[Long].rdd
        .sortBy(identity)
        .zipWithIndex()
        .toDF("id", "_r")
        .persist()
    }
    val n = ranked.count()
    // Ring and long-range links share one explode + ONE rank join: `ranked`
    // is corpus-sized (a row per node), so a second n·degree join against it
    // is a second corpus-sized shuffle for no information — _k ≤ ringDegree
    // rows step by _k (the ring), the rest by the md5-derived offset (keyed
    // on _k − ringDegree, so the edge set — and the pinned golden — is
    // byte-identical to the former two-join form). n ≤ ringDegree+1 keeps
    // ring edges only (every random offset would self-loop or duplicate).
    val initDegree =
      if (n <= params.ringDegree + 1) params.ringDegree
      else params.ringDegree + params.randomDegree
    val initAll = ranked.select(col("id").as("src"), col("_r"),
        explode(sequence(lit(1), lit(initDegree))).as("_k"))
      .withColumn("_step",
        when(col("_k") <= params.ringDegree, col("_k").cast("long"))
          .otherwise(
            conv(substring(md5(concat(col("_r"), lit("#"),
                col("_k") - params.ringDegree)), 1, 15), 16, 10)
              .cast("long") % (n - 1) + 1))
      .withColumn("_tr", (col("_r") + col("_step")) % n)
      .join(ranked.select(col("id").as("dst"), col("_r").as("_tr")), "_tr")
      .select("src", "dst", "_k")
      .filter(col("src") =!= col("dst")) // n <= ringDegree would self-loop
    val ring = initAll.filter(col("_k") <= params.ringDegree).select("src", "dst")
    val init = initAll.select("src", "dst").distinct()

    val pruneUdf = mkPruneUdf(metric, params)

    var edges = init
    var prevRound: Option[DataFrame] = None
    for (_ <- 1 to params.iterations) {
      val undirected = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      // deterministic ρK sample of each node's adjacency for the n-of-n
      // expansion — full degree² fan-out is the round's dominant shuffle.
      // Bounded-buffer partial top-k (knnJoin's Aggregator), NOT a
      // row_number window: the sample runs on the UNDIRECTED edge set,
      // where an in-degree hub — a popular point that attracts backlinks
      // every round — holds a partition far past degreeBound, and a
      // window would funnel all of it into one task. The partial
      // aggregate reduces every input partition to ≤ sampleDegree rows
      // per src BEFORE the exchange. Sample order = (60-bit md5 hash,
      // dst): same pseudo-random family as before, deterministic, and
      // layout-independent.
      val sampleAgg = udaf(new Similarity.TopKAgg(params.sampleDegree))
      val sampled = undirected
        .withColumn("_h",
          Dedup.hash60(concat_ws("#", col("src"), col("dst"))).cast("double"))
        .groupBy("src")
        .agg(sampleAgg(col("_h"), col("dst")).as("_top"))
        .select(col("src"), explode(col("_top.ids")).as("dst"))
      val nn2 = sampled.as("e1")
        .join(sampled.as("e2"), col("e1.dst") === col("e2.src"))
        .select(col("e1.src").as("src"), col("e2.dst").as("dst"))
      edges = cappedCandidates(undirected.union(nn2), vecs, metric, params)
        .join(vecs.select(col("id").as("dst"), col("vec").as("_dv")), "dst")
        .groupBy("src")
        .agg(pruneUdf(collect_list(struct(col("_d"), col("dst"), col("_dv")))).as("_nbrs"))
        .select(col("src"), explode(col("_nbrs")).as("dst"))
        .persist()
      edges.count() // materialize before releasing the previous round's cache
      prevRound.foreach(_.unpersist(false))
      prevRound = Some(edges)
    }

    // pruned graph ∪ ring backbone (connectivity by construction); the
    // dedup folds into the per-node aggregation (array_distinct over the
    // sorted list) instead of paying a separate distinct shuffle.
    // Materialize eagerly (truncating the iteration lineage), then release
    // every intermediate cache — builds must not accumulate storage.
    val result = toAdjacency(edges.union(ring), vecs.select(col("id").as("src")))
      .localCheckpoint()
    prevRound.foreach(_.unpersist(false))
    ranked.unpersist(false)
    vecs.unpersist(false)
    result
  }

  /** Fold an edge list into the artifact schema, keeping one row for
    * EVERY node in `required` (col "src") — a node with no outgoing edges
    * (singleton corpus, fully-pruned straggler) gets [] instead of
    * silently vanishing from the graph.
    */
  private def toAdjacency(edges: DataFrame, required: DataFrame): DataFrame =
    required
      .join(
        edges.groupBy(col("src"))
          .agg(array_distinct(sort_array(collect_list(col("dst")))).as("neighbors")),
        Seq("src"), "left")
      .select(col("src").as("id"),
        coalesce(col("neighbors"), array().cast("array<long>")).as("neighbors"))

  /** Ensure every node in `required` (col "src") appears as an edge
    * source: stragglers re-attach bidirectionally to the smallest node
    * that still has edges, falling back to a ring over `required` when no
    * edges survive at all (the reference re-attaches stragglers to the
    * start node, vamana.go).
    */
  private def withReattached(edges: DataFrame, required: DataFrame): DataFrame = {
    val missing = required
      .join(edges.select("src").distinct(), Seq("src"), "left_anti")
    val anchorRow = edges.agg(min("src")).head()
    if (!anchorRow.isNullAt(0)) {
      val anchor = anchorRow.getLong(0)
      val reattached = missing
        .filter(col("src") =!= anchor)
        .select(col("src"), lit(anchor).as("dst"))
      edges
        .union(reattached)
        .union(reattached.select(col("dst").as("src"), col("src").as("dst")))
    } else {
      val spark = edges.sparkSession
      import spark.implicits._
      val ranked = required.select(col("src")).as[Long].rdd
        .sortBy(identity).zipWithIndex().toDF("src", "_r")
      val m = ranked.count()
      if (m <= 1) edges
      else edges.union(ranked
        .withColumn("_tr", (col("_r") + 1) % m)
        .join(ranked.select(col("src").as("dst"), col("_r").as("_tr")), "_tr")
        .select("src", "dst")
        .filter(col("src") =!= col("dst")))
    }
  }

  /** Distance + per-node candidate cap over RAW (possibly duplicated)
    * (src, dst) pairs — one window pass replaces a distinct shuffle plus a
    * row_number window:
    *
    *   - distances join the vectors in (broadcast-able map-side work) and
    *     the window shuffles NARROW (src, dst, _d) rows — the candidate
    *     vector is re-attached by the caller after the cap, moving
    *     sampleDegree²/maxCandidates (~5×) fewer wide rows;
    *   - duplicates of a pair carry identical (_d, dst) sort keys, so
    *     `dense_rank` counts DISTINCT candidates toward the cap and a
    *     same-spec `lag` drops the adjacent duplicates — exactly
    *     `.distinct()` + `row_number ≤ cap`, minus the extra shuffle.
    *
    * Output (src, dst, _d) is clustered by src (the window's partitioning),
    * so a following broadcast vec-join + groupBy(src) adds no exchange.
    */
  private def cappedCandidates(
      rawPairs: DataFrame, vecs: DataFrame,
      metric: Metric, params: Params): DataFrame = {
    val candW = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("_d").asc, col("dst").asc)
    rawPairs
      .filter(col("src") =!= col("dst"))
      .join(vecs.select(col("id").as("src"), col("vec").as("_sv")), "src")
      .join(vecs.select(col("id").as("dst"), col("vec").as("_dv")), "dst")
      .withColumn("_d", Distances.distance(metric, col("_sv"), col("_dv")))
      .select("src", "dst", "_d")
      .withColumn("_dr", dense_rank().over(candW))
      .withColumn("_prev", lag(col("dst"), 1).over(candW))
      .filter(col("_dr") <= params.maxCandidates &&
        (col("_prev").isNull || col("_prev") =!= col("dst")))
      .drop("_dr", "_prev")
  }

  private def mkPruneUdf(metric: Metric, params: Params) =
    udf { (cands: Seq[org.apache.spark.sql.Row]) =>
      robustPrune(
        cands.map(r => (r.getDouble(0), r.getLong(1), r.getSeq[Float](2).toArray)),
        params.alpha, params.degreeBound, metric)
    }

  /** Incremental batch insert (reference vamana/insert.go:16–68): extend an
    * existing graph artifact with new points WITHOUT a full rebuild.
    *
    *   1. candidate generation — for every new point, its top-L closest
    *      points (existing ∪ batch) via ONE bounded-top-k pass over the
    *      vectors (the batch analogue of the reference's per-point greedy
    *      search candidate collection; the scan is a single map-side
    *      partial top-k, not |new|×|corpus| shuffled rows);
    *   2. α-robust prune per new point → the new node's edge list;
    *   3. backward edges to every chosen neighbor, then a re-prune of just
    *      the AFFECTED nodes (their old neighbors ∪ new backlinks, capped
    *      at maxCandidates) — the reference's degree-bound patch
    *      (insert.go:47–66) as one grouped job;
    *   4. untouched rows pass through unchanged.
    *
    * `allVecs` must contain the vectors of every graph node AND the new
    * points; `newIds` is one LONG id per new point. Output schema matches
    * [[build]]: (id, neighbors array&lt;long&gt;).
    */
  def insertBatch(
      graph: DataFrame, allVecs: DataFrame, id: Column, vec: Column,
      newIds: DataFrame, metric: Metric, params: Params = Params()): DataFrame = {
    val vecs = allVecs.select(id.cast("long").as("id"), vec.as("vec")).persist()
    val nids = newIds.select(col(newIds.columns.head).cast("long").as("id"))
    val newPts = vecs.join(nids, "id")
    val pruneUdf = mkPruneUdf(metric, params)

    val searchL = math.max(params.maxCandidates, params.degreeBound * 2)
    val cand = Similarity.knnJoin(
        newPts, col("id"), col("vec"), vecs, col("id"), col("vec"), searchL, metric)
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id").as("src"), col("corpus_id").as("dst"),
        col("distance").as("_d"))
    val newEdges = cand
      .join(vecs.select(col("id").as("dst"), col("vec").as("_dv")), "dst")
      .groupBy("src")
      .agg(pruneUdf(collect_list(struct(col("_d"), col("dst"), col("_dv")))).as("_nbrs"))
      .select(col("src"), explode(col("_nbrs")).as("dst"))
      .persist()
    newEdges.count()

    val backlinks = newEdges.select(col("dst").as("src"), col("src").as("dst"))
    val affected = backlinks.select("src").distinct()
    val baseAdj = graph
      .select(col("id").cast("long").as("src"),
        explode(col("neighbors").cast("array<long>")).as("dst"))
      .union(newEdges)

    val repruned = cappedCandidates(
        baseAdj.join(affected, "src").union(backlinks), vecs, metric, params)
      .join(vecs.select(col("id").as("dst"), col("vec").as("_dv")), "dst")
      .groupBy("src")
      .agg(pruneUdf(collect_list(struct(col("_d"), col("dst"), col("_dv")))).as("_nbrs"))
      .select(col("src"), explode(col("_nbrs")).as("dst"))

    // every node — existing and new — must keep an adjacency row: a new
    // point with no usable neighbors (empty/singleton base graph) would
    // otherwise silently never enter the graph
    val edgesAll = baseAdj.join(affected, Seq("src"), "left_anti")
      .union(repruned)
      .distinct()
      .persist()
    val requiredIds = graph.select(col("id").cast("long").as("src"))
      .union(nids.select(col("id").as("src")))
      .distinct()
    val result = toAdjacency(withReattached(edgesAll, requiredIds), requiredIds)
      .localCheckpoint()
    edgesAll.unpersist(false)
    newEdges.unpersist(false)
    vecs.unpersist(false)
    result
  }

  /** Incremental batch delete (reference vamana.go removePoint semantics):
    * drop the deleted nodes and re-wire every node that pointed at one —
    * its candidate set becomes its surviving neighbors ∪ the deleted
    * node's surviving neighbors (edge inheritance keeps the graph
    * navigable through the hole), re-pruned to the degree bound. Nodes
    * with no edge into the deleted set pass through untouched.
    */
  def deleteBatch(
      graph: DataFrame, allVecs: DataFrame, id: Column, vec: Column,
      deletedIds: DataFrame, metric: Metric, params: Params = Params()): DataFrame = {
    val vecs = allVecs.select(id.cast("long").as("id"), vec.as("vec")).persist()
    val del = deletedIds.select(col(deletedIds.columns.head).cast("long").as("_del")).persist()
    val pruneUdf = mkPruneUdf(metric, params)

    val adjE = graph.select(col("id").cast("long").as("src"),
      explode(col("neighbors").cast("array<long>")).as("dst"))
    // edges with both endpoints surviving / edges out of deleted nodes
    val keepEdges = adjE
      .join(del.withColumnRenamed("_del", "src"), Seq("src"), "left_anti")
      .join(del.withColumnRenamed("_del", "dst"), Seq("dst"), "left_anti")
    val delOut = adjE.join(del.withColumnRenamed("_del", "src"), "src")
      .select(col("src").as("_d"), col("dst"))
      .join(del.withColumnRenamed("_del", "dst"), Seq("dst"), "left_anti")
    // survivors that pointed at a deleted node inherit its surviving edges
    val affectedIn = adjE.join(del.withColumnRenamed("_del", "dst"), "dst")
      .select(col("src"), col("dst").as("_d"))
      .join(del.withColumnRenamed("_del", "src"), Seq("src"), "left_anti")
    val inherited = affectedIn.join(delOut, "_d").select("src", "dst")
    val affected = affectedIn.select("src").distinct()

    val repruned = cappedCandidates(
        keepEdges.join(affected, "src").union(inherited), vecs, metric, params)
      .join(vecs.select(col("id").as("dst"), col("vec").as("_dv")), "dst")
      .groupBy("src")
      .agg(pruneUdf(collect_list(struct(col("_d"), col("dst"), col("_dv")))).as("_nbrs"))
      .select(col("src"), explode(col("_nbrs")).as("dst"))

    // a survivor whose whole candidate set was deleted (clustered batch
    // delete) would otherwise vanish from the adjacency — re-attach such
    // stragglers to the start node in both directions, the reference's
    // straggler handling (vamana.go re-attach)
    // persist: the edge set feeds the re-attach anchor lookup, the
    // missing-node anti-join, and the final union — three evaluations of
    // the prune subtree without it
    val edgesAll = keepEdges.join(affected, Seq("src"), "left_anti")
      .union(repruned)
      .distinct()
      .persist()
    val survivors = graph.select(col("id").cast("long").as("src"))
      .join(del.withColumnRenamed("_del", "src"), Seq("src"), "left_anti")
    val result = toAdjacency(withReattached(edgesAll, survivors), survivors)
      .localCheckpoint()
    edgesAll.unpersist(false)
    del.unpersist(false)
    vecs.unpersist(false)
    result
  }

  /** Greedy beam search over a collected adjacency (serving-side
    * algorithm, reference vamana/search.go:9–102; used here for recall
    * evaluation — Spark-side queries use exact top-k instead).
    */
  def greedySearch(
      adj: Map[Long, Seq[Long]], vecs: Map[Long, Array[Float]],
      query: Array[Float], k: Int, searchSize: Int, start: Long,
      metric: Metric): Seq[Long] = {
    val d = scala.collection.mutable.Map[Long, Double]()
    def distTo(id: Long): Double = d.getOrElseUpdate(id, dist(metric, vecs(id), query))
    // standard beam: pool of ≤ searchSize best candidates; repeatedly
    // expand the nearest unexpanded pool member until the pool is settled
    val expanded = scala.collection.mutable.Set[Long]()
    var pool = scala.collection.immutable.SortedSet[(Double, Long)]((distTo(start), start))
    var continue = true
    while (continue) {
      pool.find(e => !expanded(e._2)) match {
        case None => continue = false
        case Some((_, c)) =>
          expanded += c
          adj.getOrElse(c, Nil).foreach { nb =>
            if (!pool.exists(_._2 == nb)) pool += ((distTo(nb), nb))
          }
          if (pool.size > searchSize) pool = pool.take(searchSize)
      }
    }
    pool.take(k).toSeq.map(_._2)
  }
}
