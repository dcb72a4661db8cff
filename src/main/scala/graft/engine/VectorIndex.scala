package graft.engine

import org.apache.spark.sql.DataFrame

/** A fitted vector-quantizer artifact attached to a collection: a NARROW
  * encoded frame (`_id` + code column, persisted in memory) that the
  * approximate `near` path scans for candidates instead of the wide
  * vector column — the engine-side face of the reference's per-shard
  * quantized vector stores (reference shard/vectorstore/binary.go,
  * product.go), where the quantized representation answers the candidate
  * scan and the full vectors are only read to re-rank.
  *
  * Exact `near` stays the DEFAULT (recall 1.0, strictly better than the
  * reference's graph search); a request opts into the artifact per vector
  * operator with `"approx": true`. Falls back to exact when no artifact
  * is attached.
  */
sealed trait VectorIndex {
  /** `(_id, <code column>)` — persisted, 8–32× narrower than the vectors. */
  def encoded: DataFrame
  def release(): Unit = org.apache.spark.sql.graft.Bridge.release(encoded)
}

/** Sign bits under per-dimension thresholds, packed 64/long
  * (`_packed array<long>`) — candidates rank by popcount hamming (the
  * reference's served default), or, when two-sided reconstruction
  * `levels` are attached (round 7 opt-in, Collection.withBinaryVectorIndex),
  * by ASYMMETRIC 1-bit ADC over the same packed scan — Σ (q_i −
  * level_{bit_i,i})², magnitude-aware where hamming counts flips (the
  * RECALL.md asym rows: rescored 0.76 → 0.96 at this corpus's 64 bits).
  * Jaccard-metric vectors always rank by packed jaccard.
  */
final case class BinaryVectorIndex(
    thresholds: Array[Double], encoded: DataFrame,
    levels: Option[(Array[Double], Array[Double])] = None) extends VectorIndex

/** Per-subspace centroid codes (`_codes array<int>`) — candidates rank by
  * asymmetric distance (per-query lookup table).
  */
final case class ProductVectorIndex(
    model: graft.operators.PQModel, encoded: DataFrame) extends VectorIndex

/** Vamana graph artifact (operators/VamanaBuild.scala) — the reference's
  * flagship index (reference shard/index/vamana/search.go:9–102) served
  * through the engine: `encoded` is the joined serving frame
  * `(_id, _gid long, _nbrs array<long>, _vec)`, and the approximate path
  * walks it with the hop-batched beam in [[VamanaServe]] — candidates are
  * the final beam pool, re-ranked exactly like every other artifact.
  * `entry` is the smallest graph id (the deterministic start node, the
  * RecallReport convention); `maxHops` bounds pathological traversals.
  */
final case class VamanaVectorIndex(
    entry: Long, maxHops: Int, encoded: DataFrame,
    serveDir: Option[String] = None,
    coded: Option[graft.operators.CodedSource] = None) extends VectorIndex {
  /** Broadcast-sized artifacts are collected ONCE (lazily, on the first
    * approximate query) and every beam walk then runs in driver memory
    * with zero Spark jobs — the serving fast path. None past the
    * `graft.vamana.localMaxBytes` budget → the distributed fused-lookup
    * walk serves instead (the 100 TB regime).
    */
  lazy val local: Option[VamanaServe.LocalGraph] = VamanaServe.tryLocal(encoded)

  /** The frame distributed walks fetch from. Past the local budget (the
    * regime where fetches happen at all) and given a [[serveDir]], the
    * joined serving frame materializes ONCE as a `_gid`-bucketed,
    * `_gid`-sorted external table there, so every per-hop `_gid ∈ ids`
    * lookup is answered by bucket-pruned, stats-skipped point reads
    * (`SelectedBucketsCount k out of N` in the scan) instead of a full
    * pass over the artifact — the batch analogue of the reference's
    * per-node bbolt page reads, and the difference between reading a few
    * MB and re-scanning a 100 GB artifact every hop.
    */
  lazy val serving: DataFrame =
    if (local.isDefined) encoded
    else serveDir.map(d => VamanaServe.servingTable(encoded, d)).getOrElse(encoded)

  /** The DiskANN-style compressed serving frame (`_codes` in place of
    * `_vec` — see [[VamanaServe.codedServingTable]]), materialized only
    * in the regime that fetches at all: a [[coded]] PQ model attached, a
    * [[serveDir]] to land the layout in, and an artifact past the local
    * budget. None otherwise — callers then walk the exact frames.
    */
  lazy val codedServing: Option[DataFrame] =
    if (local.isDefined) None
    else (coded, serveDir) match {
      case (Some(src), Some(d)) =>
        // the path (and hence the catalog name) is keyed per SOURCE KIND:
        // the three sources write incompatible `_codes` payloads, and a
        // bare existence check would otherwise serve one source's table
        // to another after a quantizer swap on the same graph generation
        Some(VamanaServe.codedServingTable(
          encoded, src, d.stripSuffix("/") + "_coded_" + src.tag))
      case _ => None
    }

  override def release(): Unit = {
    super.release()
    serveDir.foreach { d =>
      val spark = encoded.sparkSession
      spark.sql(s"DROP TABLE IF EXISTS `${VamanaServe.servingTableName(d)}`")
      // every source kind's coded variant (single-sourced from
      // CodedSource.tags) plus the legacy untagged name
      (graft.operators.CodedSource.tags.map("_coded_" + _) :+ "_coded")
        .foreach { sfx =>
          spark.sql(s"DROP TABLE IF EXISTS `${
            VamanaServe.servingTableName(d.stripSuffix("/") + sfx)}`")
        }
    }
  }
}

/** OPQ artifact (operators/Opq.scala — Ge et al. 2013): per-subspace
  * centroid codes learned in a ROTATED space (`_codes array<int>`, same
  * narrow frame as plain PQ). Candidates rank by asymmetric distance
  * after rotating the QUERY by the model's orthogonal matrix (one d×d
  * mat-vec on the driver) — the scan itself is byte-for-byte the PQ
  * scan, so the 100 TB candidate-stage cost is unchanged; only the
  * codebook's fit to correlated/anisotropic corpora improves.
  */
final case class OpqVectorIndex(
    model: graft.operators.Opq.OpqModel, encoded: DataFrame) extends VectorIndex

/** RaBitQ artifact (operators/RaBitQ.scala — Gao & Long, SIGMOD 2024):
  * `(_id, _bits array<long>, _norm, _dotq, _dotc)` — one sign bit per
  * dimension of the rotated unit residual plus three scalars. Candidates
  * rank by the paper's unbiased squared-L2 estimator (Dot metric by the
  * reconstructed inner product); the exact re-rank stage is metric-true.
  */
final case class RbqVectorIndex(
    model: graft.operators.RaBitQ.RbqModel, encoded: DataFrame) extends VectorIndex

/** SQ8 scalar-quantizer artifact (`_codes array<long>`, 0..255 per
  * dimension over per-dim [lo, hi]) — candidates rank by squared-L2
  * over reconstructed grid centers: exact for euclidean, rank-equivalent
  * for cosine/dot on normalized vectors (the PQ operating note).
  */
final case class ScalarVectorIndex(
    lo: Array[Double], hi: Array[Double], encoded: DataFrame) extends VectorIndex

/** IVF-RaBitQ artifact (operators/IvfRbq.scala — the RaBitQ paper's IVF
  * deployment): `encoded` reads the bucket-PARTITIONED artifact
  * directory, so the probe restriction is partition pruning; probed rows
  * rank by the per-cell unbiased estimator (a when-chain of
  * [[graft.operators.RaBitQ.estimateExpr]] arms, one per probed cell;
  * Metric.Dot probes high-dot cells and ranks by the per-cell
  * dotEstimateExpr over the stored ⟨o,c⟩ scalar — round 10).
  */
final case class IvfRbqVectorIndex(
    coarse: graft.operators.IvfPq.Coarse,
    rotation: Array[Array[Double]],
    nprobe: Int, encoded: DataFrame) extends VectorIndex

/** Residual IVF-PQ artifact (operators/IvfPq.scala): `encoded` reads the
  * bucket-PARTITIONED artifact directory, so the probe restriction in the
  * approximate path is partition pruning, not an in-memory filter — the
  * candidate scan touches nprobe cells' `(_id, _bucket, _codes)` only.
  * Candidates rank by per-cell ADC (query-residual lookup tables).
  */
final case class IvfPqVectorIndex(
    coarse: graft.operators.IvfPq.Coarse, model: graft.operators.PQModel,
    nprobe: Int, encoded: DataFrame) extends VectorIndex
