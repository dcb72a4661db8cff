package graft.engine

import org.apache.spark.sql.DataFrame
import graft.model.IndexSchema

/** A collection = a DataFrame with a `_id` string column plus one typed
  * column per indexed property (reference models/collection.go:3–13 maps a
  * collection to sharded bbolt files; here the DataFrame's partitions ARE
  * the shards, and Catalyst's partial top-k + exchange replaces the
  * cluster fan-out/merge of reference cluster/actions.go:312–376).
  *
  * Dotted property paths ("nested.vector") resolve into struct columns.
  *
  * `pointLookup`, when present, returns the CURRENT row versions for a
  * BOUNDED id set WITHOUT scanning `df` — the store wires in its
  * `_id`-bucketed doc table (CollectionStore.load), so a backfill or `_id`
  * lookup of ≤100 ids is a file-pruned point read instead of a corpus
  * scan (the reference reads points straight out of the id-keyed bbolt
  * bucket, shard/pointstore/pointstore.go:78 — this is that access path's
  * Spark shape; at
  * 100 TB it is the difference between opening ~k bucket files and
  * scheduling a scan over the whole collection). Rows carry exactly the
  * data columns of `df`. Callers own the boundedness of `ids`.
  */
final case class Collection(
    df: DataFrame,
    schema: IndexSchema,
    textIndexes: Map[String, TextIndex] = Map.empty,
    vectorIndexes: Map[String, VectorIndex] = Map.empty,
    pointLookup: Option[Seq[String] => DataFrame] = None) {
  require(df.columns.contains(Collection.IdCol), s"collection must have ${Collection.IdCol}")

  /** Return a copy with the text index for `prop` built and attached
    * (postings persisted) — queries then skip re-tokenizing the corpus.
    */
  def withTextIndex(prop: String): Collection =
    if (textIndexes.contains(prop)) this
    else copy(textIndexes = textIndexes + (prop -> TextIndex.build(df, prop)))

  /** Like [[withTextIndex]] but with the postings checkpointed to parquet
    * under `cacheDir`: cache-cleared or fresh sessions re-read the index
    * instead of re-tokenizing the corpus.
    */
  def withTextIndexCached(prop: String, cacheDir: java.nio.file.Path): Collection =
    if (textIndexes.contains(prop)) this
    else copy(textIndexes =
      textIndexes + (prop -> TextIndex.buildDiskCached(df, prop, cacheDir)))

  /** Attach a binary-quantizer artifact for `prop`: sign bits under the
    * given per-dimension thresholds, packed 64-per-long and persisted —
    * `"approx": true` vector queries then scan this 32×-narrower frame
    * for candidates and re-rank only those rows exactly.
    */
  def withBinaryVectorIndex(prop: String, thresholds: Array[Double],
      levels: Option[(Array[Double], Array[Double])] = None): Collection =
    if (vectorIndexes.contains(prop)) this
    else {
      import org.apache.spark.sql.functions._
      levels.foreach { case (lo, hi) =>
        require(lo.length == thresholds.length && hi.length == thresholds.length,
          s"levels dims ${lo.length}/${hi.length} != thresholds ${thresholds.length}")
      }
      val packed = df.filter(col(prop).isNotNull)
        .select(col(Collection.IdCol),
          graft.functions.PackedOps.packBits(col(prop), lit(thresholds)).as("_packed"))
        .persist()
      copy(vectorIndexes =
        vectorIndexes + (prop -> BinaryVectorIndex(thresholds, packed, levels)))
    }

  /** Attach an SQ8 scalar-quantizer artifact for `prop`: per-dimension
    * 0..255 grid codes over [lo, hi], persisted; approximate candidates
    * rank by squared-L2 over reconstructed centers.
    */
  def withScalarVectorIndex(prop: String, lo: Array[Double], hi: Array[Double]): Collection =
    if (vectorIndexes.contains(prop)) this
    else {
      import org.apache.spark.sql.functions._
      val codes = graft.operators.ScalarQuantizer
        .encode(df.filter(col(prop).isNotNull), col(Collection.IdCol), col(prop), lo, hi)
        .withColumnRenamed("id", Collection.IdCol)
        .withColumnRenamed("codes", "_codes")
        .persist()
      copy(vectorIndexes = vectorIndexes + (prop -> ScalarVectorIndex(lo, hi, codes)))
    }

  /** Attach a product-quantizer artifact for `prop`: per-subspace centroid
    * codes (byte-scale per subspace), persisted; approximate candidates
    * rank by asymmetric distance against a per-query lookup table.
    */
  def withProductVectorIndex(prop: String, model: graft.operators.PQModel): Collection =
    if (vectorIndexes.contains(prop)) this
    else {
      import org.apache.spark.sql.functions._
      val codes = graft.operators.ProductQuantizer
        .encode(df.filter(col(prop).isNotNull), col(Collection.IdCol), col(prop), model)
        .withColumnRenamed("id", Collection.IdCol)
        .withColumnRenamed("codes", "_codes")
        .persist()
      copy(vectorIndexes = vectorIndexes + (prop -> ProductVectorIndex(model, codes)))
    }

  /** Attach an OPQ artifact for `prop` (operators/Opq.scala): codes from
    * the rotated-space codebooks, same narrow `(_id, _codes)` frame as
    * plain PQ — approximate candidates rank by ADC against the ROTATED
    * query; the exact re-rank stays on this collection's raw vectors.
    * Ragged vectors are SHED like nulls (the fit's own filter — the
    * rotation UDF would otherwise throw on the first short vector and
    * kill the encode job instead of skipping the row).
    */
  def withOpqVectorIndex(prop: String, model: graft.operators.Opq.OpqModel): Collection =
    if (vectorIndexes.contains(prop)) this
    else {
      import org.apache.spark.sql.functions._
      val codes = graft.operators.Opq
        .encode(
          df.filter(col(prop).isNotNull && size(col(prop)) === model.dim),
          col(Collection.IdCol), col(prop), model)
        .withColumnRenamed("id", Collection.IdCol)
        .withColumnRenamed("codes", "_codes")
        .persist()
      copy(vectorIndexes = vectorIndexes + (prop -> OpqVectorIndex(model, codes)))
    }

  /** Attach a RaBitQ artifact for `prop` (operators/RaBitQ.scala): packed
    * sign bits of the rotated unit residual + the estimator's three
    * scalars, persisted; approximate candidates rank by the unbiased
    * squared-L2 estimate (Dot by the reconstructed inner product).
    * Ragged vectors are SHED like nulls (the encode UDF would otherwise
    * throw on the first short vector — the quantizer-attach convention).
    */
  def withRbqVectorIndex(prop: String, model: graft.operators.RaBitQ.RbqModel): Collection =
    if (vectorIndexes.contains(prop)) this
    else {
      import org.apache.spark.sql.functions._
      val codes = graft.operators.RaBitQ
        .encode(
          df.filter(col(prop).isNotNull && size(col(prop)) === model.dim),
          col(Collection.IdCol), col(prop), model)
        .withColumnRenamed("id", Collection.IdCol)
        .withColumnRenamed("bits", "_bits")
        .withColumnRenamed("norm", "_norm")
        .withColumnRenamed("dotq", "_dotq")
        .withColumnRenamed("dotc", "_dotc")
        .persist()
      copy(vectorIndexes = vectorIndexes + (prop -> RbqVectorIndex(model, codes)))
    }

  /** Attach a Vamana graph artifact for `prop`, building it at `dir` if
    * absent (the build is a pure function of the corpus — VamanaBuild's
    * sorted-rank determinism — so a reused artifact is byte-identical to
    * a fresh one). `"approx": true` vectorVamana queries then answer from
    * a beam walk over the graph ([[VamanaServe]]) + exact re-rank, the
    * reference's flagship serving path (shard/index/vamana/search.go).
    * The collection's `_id` must be castable to long (the graph id).
    */
  def withVamanaVectorIndex(
      prop: String,
      dir: String,
      params: graft.operators.VamanaBuild.Params =
        graft.operators.VamanaBuild.Params(degreeBound = 32, iterations = 2),
      maxHops: Int = 64,
      coded: Option[graft.operators.CodedSource] = None): Collection =
    if (vectorIndexes.contains(prop)) this
    else {
      import org.apache.spark.sql.functions._
      val metric = schema.get(prop) match {
        case Some(k: graft.model.IndexKind.VectorVamana) => k.metric
        case Some(k: graft.model.IndexKind.VectorFlat) => k.metric
        case other => throw new IllegalArgumentException(
          s"property $prop is not a vector index (got $other)")
      }
      val spark = df.sparkSession
      val base = df.filter(col(prop).isNotNull)
      val success = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
      val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(success))
        graft.operators.VamanaBuild
          .build(base, col(Collection.IdCol).cast("long"), col(prop), metric, params)
          .write.mode("overwrite").parquet(dir)
      // graph node ids ARE the long-cast _ids here — identity idmap;
      // the serve cache lands BESIDE the graph parquet (a subdirectory
      // would read as a partition column and corrupt the artifact scan)
      withVamanaVectorIndexFrames(prop, spark.read.parquet(dir),
        base.select(col(Collection.IdCol),
          col(Collection.IdCol).cast("long").as("nid")),
        maxHops, serveDir = Some(dir.stripSuffix("/") + "_serve"),
        coded = coded)
    }

  /** Attach a Vamana serving artifact from EXPLICIT frames — the face the
    * store-maintained lifecycle plugs into (CollectionStore.vamanaIndex:
    * generation-addressed `graph(id, neighbors)` + `idmap(_id, nid)`,
    * incrementally patched on every write). The serving frame joins graph
    * → idmap → this collection's vectors once and persists narrow.
    */
  def withVamanaVectorIndexFrames(
      prop: String, graph: DataFrame, idmap: DataFrame,
      maxHops: Int = 64, serveDir: Option[String] = None,
      coded: Option[graft.operators.CodedSource] = None): Collection =
    if (vectorIndexes.contains(prop)) this
    else {
      import org.apache.spark.sql.functions._
      val enc = graph
        .select(col("id").as("_gid"), col("neighbors").as("_nbrs"))
        .join(idmap.select(col(Collection.IdCol), col("nid").as("_gid")), "_gid")
        .join(df.filter(col(prop).isNotNull)
          .select(col(Collection.IdCol), col(prop).as("_vec")), Collection.IdCol)
        .select(col(Collection.IdCol), col("_gid"),
          col("_nbrs"), col("_vec"))
        .persist()
      val entryRow = graph.agg(min(col("id"))).head()
      val entry = if (entryRow.isNullAt(0)) -1L else entryRow.getLong(0)
      copy(vectorIndexes = vectorIndexes +
        (prop -> VamanaVectorIndex(entry, maxHops, enc, serveDir, coded)))
    }

  /** Attach a residual IVF-PQ artifact for `prop`, building it at `dir` if
    * absent (an existing artifact is reused via its persisted model — NOT
    * refitted, which would mismatch the codes on disk). The encoded frame
    * reads the partitioned directory, so approximate probes prune
    * partitions even through the engine path.
    */
  /** Attach an IVF-RaBitQ artifact for `prop` (operators/IvfRbq.scala),
    * building it at `dir` if absent. The coarse cells and the rotation
    * are PURE FUNCTIONS of (corpus, params, seed) — signCoarse /
    * kmeansCoarse / RaBitQ.randomRotation — so a reused artifact equals
    * a fresh build; the meta fingerprint fails fast on a mismatched
    * rotation or coarse shape instead of silently mis-ranking.
    */
  def withIvfRbqVectorIndex(
      prop: String, dir: String,
      coarse: () => graft.operators.IvfPq.Coarse,
      rotation: Array[Array[Double]],
      nprobe: Int): Collection =
    if (vectorIndexes.contains(prop)) this
    else {
      import org.apache.spark.sql.functions._
      import graft.operators.IvfRbq
      require(nprobe > 0, s"nprobe must be positive (got $nprobe)")
      val spark = df.sparkSession
      val co = coarse()
      IvfRbq.metaOf(spark, dir) match {
        case Some(stored) =>
          val expect = IvfRbq.metaString(co, rotation)
          require(stored == expect,
            s"artifact at $dir was written as ($stored), probed as ($expect)" +
              (if (stored.split(',').lastOption != expect.split(',').lastOption)
                " — the artifact predates the current layout version; " +
                  s"delete $dir and re-attach to rebuild it under the new layout"
              else " — the coarse shape or rotation differs from the one " +
                s"that wrote the artifact; delete $dir to rebuild, or probe " +
                "with the original model"))
        case None =>
          // shed ragged rows (wrong-length vectors) like the sibling
          // quantizer attaches — a ragged row would otherwise throw inside
          // IvfRbq.encode's kernel and kill the whole build job
          IvfRbq.writeArtifact(
            df.filter(col(prop).isNotNull && size(col(prop)) === co.dim),
            col(Collection.IdCol), col(prop), co, rotation, dir)
      }
      val enc = spark.read.parquet(dir)
        .select(col("id").as(Collection.IdCol),
          col("bucket").as("_bucket"), col("bits").as("_bits"),
          col("norm").as("_norm"), col("dotq").as("_dotq"),
          col("dotc").as("_dotc"))
      copy(vectorIndexes =
        vectorIndexes + (prop -> IvfRbqVectorIndex(co, rotation, nprobe, enc)))
    }

  def withIvfPqVectorIndex(
      prop: String, dir: String,
      coarse: () => graft.operators.IvfPq.Coarse,
      model: graft.operators.IvfPq.Coarse => graft.operators.PQModel,
      nprobe: Int, spill: Int = 1): Collection =
    if (vectorIndexes.contains(prop)) this
    else {
      import org.apache.spark.sql.functions._
      import graft.operators.IvfPq
      require(nprobe > 0, s"nprobe must be positive (got $nprobe)")
      val spark = df.sparkSession
      val (co, pq) =
        if (IvfPq.hasModel(spark, dir)) {
          // reusing an artifact built at a DIFFERENT spill would silently
          // serve a different recall operating point than the caller asked
          // for — fail fast (pre-round-5 artifacts record no spill and are
          // accepted as-is, documented legacy)
          IvfPq.artifactSpill(spark, dir).foreach(s => require(s == spill,
            s"artifact at $dir was built with spill=$s but spill=$spill was " +
              s"requested — rebuild the artifact or request spill=$s"))
          IvfPq.loadModel(spark, dir)
        } else {
          val c = coarse()
          val m = model(c)
          // spill = multi-assignment (learned cells only): the serving
          // path dedups ids, so a spilled artifact raises cell recall at
          // the same probe budget — RECALL.md's 0.8 operating point
          IvfPq.writeArtifact(
            df.filter(col(prop).isNotNull), col(Collection.IdCol), col(prop), c, m, dir,
            spill = spill)
          (c, m)
        }
      val enc = spark.read.parquet(dir)
        .select(col("id").as(Collection.IdCol),
          col("bucket").as("_bucket"), col("codes").as("_codes"))
      copy(vectorIndexes =
        vectorIndexes + (prop -> IvfPqVectorIndex(co, pq, nprobe, enc)))
    }
}

object Collection {
  val IdCol = "_id"
  val DistanceCol = "_distance"
  val ScoreCol = "_score"
  val HybridScoreCol = "_hybridScore"
  val MetaCols: Seq[String] = Seq(IdCol, DistanceCol, ScoreCol, HybridScoreCol)
}
