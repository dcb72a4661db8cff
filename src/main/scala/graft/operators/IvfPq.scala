package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.IndexKind.Metric

/** Residual IVF-PQ: the compound scan-reduction index for web-scale ANN
  * (the layout FAISS popularized as IVFADC; see Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011, §IV).
  *
  * Three stages compose:
  *
  *  1. a COARSE quantizer splits the corpus into cells; the artifact is
  *     written `partitionBy(bucket)`, so probing `nprobe` cells is
  *     partition pruning — only probed directories are listed or read;
  *  2. each vector stores PQ byte codes of its RESIDUAL
  *     (`vec − centroid(bucket)`); residuals concentrate near 0, so the
  *     same codebook budget quantizes them much more tightly than raw
  *     vectors — probed cells are scanned as `(id, codes)` only, m bytes
  *     a row instead of the wide float column;
  *  3. ADC scores candidates with per-cell lookup tables built from the
  *     QUERY's residual against that cell, and the top `rescore`
  *     candidates are re-ranked with the exact metric, reading the wide
  *     vector column for candidate rows only.
  *
  * At 100 TB: stage 1 reads nprobe/K of the corpus directories, stage 2
  * reads ~1/32 of the probed bytes (64-d float → 16 codes), stage 3 reads
  * `rescore` full rows — the full-corpus float scan never happens.
  *
  * Two coarse schemes share the machinery:
  *  - [[signCoarse]] — sign-bit cells with decimal-rounded per-cell mean
  *    centroids: fully deterministic, so the DuckDB oracle can replay the
  *    entire fit+encode+search pipeline (the driver's `ann_ivfpq_fixed`);
  *  - [[kmeansCoarse]] — learned centroids (Lloyd's over a bounded
  *    sample), the production-quality variant; recall tracked in
  *    RecallReport.
  *
  * Reference anchor: the reference nests its quantizers inside each
  * vector index the same way (vectorstore/product.go:20–27 —
  * per-collection codebooks scoped under the index bucket); the coarse
  * layer here replaces its shard fan-out with partition pruning.
  */
object IvfPq {

  /** A coarse quantizer: cell assignment + per-cell centroids + probe
    * order. `centroids` keys are exactly the populated cells.
    */
  final case class Coarse(
      kind: String, // "sign" | "kmeans" — persisted, guards artifact reuse
      param: Int, // nBits for sign, k for kmeans
      centroids: Map[Int, Array[Double]]) {
    require(centroids.nonEmpty, "coarse quantizer with no populated cells")
    val dim: Int = centroids.head._2.length
  }

  /** Sign-bit cells (deterministic): bucket = sign bits of the first
    * `nBits` dims; centroid = per-cell per-dim mean, decimal-accumulated
    * and rounded to 9 places (the repo's cross-engine float convention,
    * same as BinaryQuantizer.fit) so an oracle engine lands on identical
    * residuals.
    */
  def signCoarse(corpus: DataFrame, vec: Column, nBits: Int): Coarse = {
    val cells = Similarity.signBuckets(corpus.filter(vec.isNotNull), vec, nBits)
      .select(col("bucket"), posexplode(vec).as(Seq("_pos", "_v")))
      .groupBy("bucket", "_pos")
      // non-null count to match the sum's null semantics (BinaryQuantizer
      // convention — count(*) would bias means on null-element vectors)
      .agg(round(sum(col("_v").cast("decimal(28,6)")) / count(col("_v")), 9)
        .cast("double").as("_m"))
      .collect()
      .groupBy(_.getAs[Int]("bucket"))
      .map { case (b, rows) =>
        val byPos = rows.map(r => r.getAs[Int]("_pos") -> r.getAs[Double]("_m")).toMap
        val d = byPos.keys.max + 1
        b -> Array.tabulate(d)(i => byPos.getOrElse(i,
          throw new IllegalStateException(s"cell $b missing dimension $i")))
      }
    Coarse("sign", nBits, cells)
  }

  /** Learned coarse cells: Lloyd's centroids over a bounded sample
    * (training is sample-scale by nature — see ProductQuantizer.fit);
    * cell id = centroid index.
    */
  def kmeansCoarse(
      corpus: DataFrame, vec: Column, k: Int,
      seed: Long = 42L, sampleLimit: Int = 100000): Coarse = {
    // fit is sample-scale by nature — the sample is collected once (via
    // the same shared helper kmeansCentroids uses) so the populated-cells
    // probe below reuses it instead of paying a corpus-wide assignment
    // job at fit time
    val sample = Similarity.vectorSample(corpus, vec, sampleLimit)
    require(sample.nonEmpty, "cannot learn IVF centroids on an empty corpus")
    val cents = ProductQuantizer.lloyds(sample, k, seed, maxIter = 25)
      .map(_.map(_.toFloat))
    // Lloyd's can leave cells no row maps to; keep only POPULATED cells
    // (Coarse's documented contract) so probes() never spends its nprobe
    // budget ranking empty directories. Populated = has a SAMPLE member —
    // driver-side over the rows already in hand, no Spark job; a cell
    // empty in the sample but populated in the corpus just means those
    // rows assign to their next-nearest kept cell at write time,
    // consistently for codes and probes. nearestCellD is kmeansBuckets'
    // own argmin, so driver and distributed assignments cannot drift.
    val populated = sample.map(Similarity.nearestCellD(cents, _)).toSet
    Coarse("kmeans", k, cents.zipWithIndex.collect {
      case (c, j) if populated(j) => j -> c.map(_.toDouble)
    }.toMap)
  }

  private[operators] def assignBuckets(corpus: DataFrame, vec: Column, coarse: Coarse): DataFrame =
    coarse.kind match {
      case "sign" => Similarity.signBuckets(corpus.filter(vec.isNotNull), vec, coarse.param)
      case "kmeans" =>
        // only populated cells survive kmeansCoarse; assign against them in
        // key order and remap the array index back to the ORIGINAL cell id,
        // so bucket values stay stable across the artifact, probes() and
        // the model file
        val keys = coarse.centroids.keys.toArray.sorted
        val cents = keys.map(b => coarse.centroids(b).map(_.toFloat))
        Similarity.kmeansBuckets(corpus, vec, cents)
          .withColumn("bucket",
            element_at(typedLit(keys.toSeq), col("bucket") + 1))
      case other => throw new IllegalArgumentException(s"unknown coarse kind '$other'")
    }

  /** Multi-assignment ("cell spilling", the multiple-assignment trick from
    * the IVF literature — Jégou et al. 2011 §V-B report it as the cheapest
    * recall lever): each vector is stored in its `spill` nearest cells, so
    * a true neighbor sitting just across a cell boundary is still found
    * when EITHER of its cells is probed. Coarse-cell coverage — not code
    * fidelity — is the recall ceiling of residual IVF-PQ, so at a fixed
    * probe budget this converts cell-boundary misses into hits for a
    * `spill`× larger (still m-bytes-a-row) codes artifact. Learned cells
    * only: a sign cell IS the vector's bit pattern, there is no
    * second-nearest assignment.
    */
  private def assignBucketsSpill(
      corpus: DataFrame, vec: Column, coarse: Coarse, spill: Int): DataFrame =
    if (spill <= 1) assignBuckets(corpus, vec, coarse)
    else coarse.kind match {
      case "kmeans" =>
        val keys = coarse.centroids.keys.toArray.sorted
        val cents = keys.map(b => coarse.centroids(b).map(_.toDouble))
        val dim = coarse.dim
        val a = math.min(spill, keys.length)
        val assignTop = udf { (v: Seq[Float]) =>
          require(v.length == dim,
            s"vector has ${v.length} dims; centroids have $dim")
          // top-`a` nearest cells, nearest first; ties by cell id (stable)
          val scored = new Array[(Double, Int)](cents.length)
          var j = 0
          while (j < cents.length) {
            val c = cents(j)
            var acc = 0.0; var t = 0
            while (t < dim) { val x = v(t).toDouble - c(t); acc += x * x; t += 1 }
            scored(j) = (acc, keys(j))
            j += 1
          }
          scored.sorted.take(a).map(_._2)
        }
        corpus.filter(vec.isNotNull)
          .withColumn("bucket", explode(assignTop(vec)))
      case other =>
        throw new IllegalArgumentException(
          s"spill=$spill requires learned coarse cells, got '$other'")
    }

  /** Probe order for a query: ALL populated cells ranked by squared L2
    * centroid distance, ties by cell id. One rule for both schemes — sign
    * cells carry mean centroids too, and centroid ranking probes strictly
    * better than the hamming-neighbor ring (a cell one sign-bit away on a
    * near-zero dimension is closer than one flip away on a large one).
    * Deterministic (double arithmetic + id tie-break), so the oracle can
    * replay the probe set in SQL.
    */
  def probes(coarse: Coarse, queryVec: Seq[Float], nprobe: Int): Seq[Int] =
    coarse.centroids.toSeq.map { case (b, c) =>
      require(queryVec.length == c.length,
        s"query vector has ${queryVec.length} dims; centroids have ${c.length}")
      var acc = 0.0; var t = 0
      while (t < c.length) { val x = queryVec(t).toDouble - c(t); acc += x * x; t += 1 }
      (acc, b)
    }.sorted.take(nprobe).map(_._2)

  /** Probe selection for Metric.Dot (round 7): rank cells by NEGATED
    * inner product q·c — for an unnormalized MIPS query the best cells
    * are the high-dot ones, which L2 probing would skip whenever the
    * query's norm dominates. Same deterministic (score, bucket) tiebreak.
    */
  def probesDot(coarse: Coarse, queryVec: Seq[Float], nprobe: Int): Seq[Int] =
    coarse.centroids.toSeq.map { case (b, c) =>
      require(queryVec.length == c.length,
        s"query vector has ${queryVec.length} dims; centroids have ${c.length}")
      var acc = 0.0; var t = 0
      while (t < c.length) { acc -= queryVec(t).toDouble * c(t); t += 1 }
      (acc, b)
    }.sorted.take(nprobe).map(_._2)

  /** Per-cell DOT lookup tables (round 7): −dot(q, c_cell + r̂) =
    * −dot(q, c_cell) − dot(q_sub_i, residCent_ij) summed over subspaces.
    * The per-cell constant folds into EVERY subspace-0 entry, so the
    * unchanged [[adcUdf]] kernel scores dot candidates too.
    */
  def queryTablesDot(
      coarse: Coarse, pq: PQModel, queryVec: Seq[Float],
      probeCells: Seq[Int]): Map[Int, Array[Array[Double]]] =
    probeCells.map { b =>
      val cent = coarse.centroids(b)
      require(queryVec.length == cent.length,
        s"query vector has ${queryVec.length} dims; cell centroid has ${cent.length}")
      var cellConst = 0.0
      var t0 = 0
      while (t0 < cent.length) { cellConst -= queryVec(t0).toDouble * cent(t0); t0 += 1 }
      b -> (0 until pq.m).map { i =>
        (0 until pq.k).map { j =>
          val c = pq.centroids(i)(j)
          var acc = 0.0; var t = 0
          while (t < pq.subDim) {
            acc -= queryVec(i * pq.subDim + t).toDouble * c(t); t += 1
          }
          if (i == 0) acc + cellConst else acc
        }.toArray
      }.toArray
    }.toMap

  /** Fit the residual codebook: assign cells, subtract centroids, PQ-fit
    * the residual sample. The residual frame is only sampled
    * (`sampleLimit`), never materialized corpus-wide.
    */
  def fitResidualPq(
      corpus: DataFrame, vec: Column, coarse: Coarse,
      m: Int, k: Int, seed: Long = 42L, sampleLimit: Int = 100000): PQModel = {
    val dim = coarse.dim
    val res = residualFrame(assignBuckets(corpus, vec, coarse), vec, coarse)
    ProductQuantizer.fit(res, col("_residual"), m, k, dim, seed, sampleLimit)
  }

  /** (bucket, vec) → residual column via a broadcast centroid map. */
  private def residualFrame(assigned: DataFrame, vec: Column, coarse: Coarse): DataFrame = {
    val cents = coarse.centroids
    val resUdf = udf { (b: Int, v: Seq[Float]) =>
      val c = cents.getOrElse(b,
        throw new IllegalArgumentException(s"row assigned to unknown cell $b"))
      require(v.length == c.length,
        s"vector has ${v.length} dims; cell centroid has ${c.length}")
      val out = new Array[Float](c.length)
      var i = 0
      while (i < c.length) { out(i) = (v(i).toDouble - c(i)).toFloat; i += 1 }
      out
    }
    assigned.withColumn("_residual", resUdf(col("bucket"), vec))
  }

  /** Materialize the index: `(id, vec, codes)` under `bucket=<b>/`
    * directories plus a meta file binding the artifact to its quantizer
    * shape (probing with a different coarse scheme or codebook geometry
    * would silently return wrong neighbors — fail fast instead).
    */
  def writeArtifact(
      corpus: DataFrame, cId: Column, cVec: Column,
      coarse: Coarse, pq: PQModel, dir: String, spill: Int = 1): Unit = {
    val assigned = assignBucketsSpill(corpus, cVec, coarse, spill)
    val withRes = residualFrame(assigned, cVec, coarse)
    val enc = encodeInPlace(withRes, pq)
    enc.select(cId.as("id"), cVec.as("vec"), col("_codes").as("codes"), col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    writeMeta(corpus.sparkSession, dir, s"${coarse.kind},${coarse.param},${pq.m},${pq.k},${pq.dim}")
    writeModel(corpus.sparkSession, dir, coarse, pq, spill)
  }

  /** PQ-encode `_residual` as an extra `_codes` column (keeps every other
    * column, unlike ProductQuantizer.encode's projection).
    */
  private def encodeInPlace(withRes: DataFrame, pq: PQModel): DataFrame =
    withRes.withColumn("_codes", ProductQuantizer.encodeUdf(pq)(col("_residual")))

  private def writeMeta(spark: SparkSession, dir: String, payload: String): Unit = {
    val meta = new org.apache.hadoop.fs.Path(dir, "_ivfpq_meta")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(meta, true)
    try out.write(payload.getBytes("UTF-8")) finally out.close()
  }

  /** Drain a (small) FS file fully — Hadoop `read` may return short. */
  private def readFully(
      fs: org.apache.hadoop.fs.FileSystem, path: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(path)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Persist the full model (geometry line + coarse centroids + codebook)
    * so the artifact is SELF-CONTAINED: a fresh session [[loadModel]]s and
    * serves without refitting — refitting k-means would yield different
    * cells than the codes on disk and silently wrong neighbors. Format is
    * line-oriented decimal text: floats round-trip exactly via
    * `java.lang.Double/Float.toString` (shortest representation that
    * parses back to the same bits).
    */
  def writeModel(spark: SparkSession, dir: String, coarse: Coarse, pq: PQModel,
      spill: Int = 1): Unit = {
    val sb = new StringBuilder
    sb.append(s"${coarse.kind},${coarse.param},${pq.m},${pq.k},${pq.dim},$spill\n")
    coarse.centroids.toSeq.sortBy(_._1).foreach { case (b, c) =>
      sb.append(s"C,$b,${c.mkString(",")}\n")
    }
    for (i <- 0 until pq.m; j <- 0 until pq.k)
      sb.append(s"P,$i,$j,${pq.centroids(i)(j).mkString(",")}\n")
    val path = new org.apache.hadoop.fs.Path(dir, ModelFile)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // write-then-rename: a crash mid-write must not leave a truncated
    // model that hasModel() would mistake for a complete one
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$ModelFile.tmp")
    val out = fs.create(tmp, true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(path)) fs.delete(path, false)
    require(fs.rename(tmp, path), s"could not move $tmp into place at $path")
  }

  private val ModelFile = "_ivfpq_model"

  /** Whether `dir` holds a persisted model — the build-vs-reuse question,
    * kept here so the file layout stays this operator's private detail.
    */
  def hasModel(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir, ModelFile)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  /** Load the model persisted by [[writeModel]]. */
  def loadModel(spark: SparkSession, dir: String): (Coarse, PQModel) = {
    val path = new org.apache.hadoop.fs.Path(dir, ModelFile)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"no $ModelFile at $dir — artifact predates writeModel?")
    def bad(why: String): Nothing =
      throw new IllegalArgumentException(s"malformed $ModelFile at $dir: $why")
    val lines = readFully(fs, path).split('\n').filter(_.nonEmpty)
    if (lines.isEmpty) bad("empty file")
    val head = lines.head.split(',')
    // 5 fields = pre-round-5 artifact (no recorded spill); 6 adds spill
    if (head.length != 5 && head.length != 6) bad(s"header '${lines.head}'")
    val (kind, param, m, k, dim) =
      try (head(0), head(1).toInt, head(2).toInt, head(3).toInt, head(4).toInt)
      catch { case _: NumberFormatException => bad(s"non-numeric header '${lines.head}'") }
    if (head.length == 6 && !head(5).forall(_.isDigit)) bad(s"spill '${head(5)}'")
    // bounds BEFORE any allocation sized by the header: a corrupt/hostile
    // header must fail the documented bad(...) contract, not throw
    // NegativeArraySizeException or OOM the driver on a 10^10-cell
    // Array.ofDim (the fail-closed convention of the msgpack codec)
    if (m <= 0 || m > 4096) bad(s"m=$m outside (0, 4096]")
    if (k <= 0 || k > 65536) bad(s"k=$k outside (0, 65536]")
    if (dim <= 0 || dim > (1 << 20)) bad(s"dim=$dim outside (0, 2^20]")
    if (dim % m != 0) bad(s"dim=$dim not divisible by m=$m")
    val cents = scala.collection.mutable.Map[Int, Array[Double]]()
    val codebook = Array.ofDim[Array[Float]](m, k)
    lines.tail.foreach { ln =>
      val parts = ln.split(',')
      try parts(0) match {
        case "C" =>
          cents(parts(1).toInt) = parts.drop(2).map(_.toDouble)
        case "P" =>
          val (i, j) = (parts(1).toInt, parts(2).toInt)
          if (i < 0 || i >= m || j < 0 || j >= k)
            bad(s"codebook entry ($i,$j) outside m=$m k=$k")
          codebook(i)(j) = parts.drop(3).map(_.toFloat)
        case other => bad(s"line tag '$other'")
      } catch {
        case _: NumberFormatException | _: ArrayIndexOutOfBoundsException =>
          bad(s"unparseable line '${ln.take(80)}'")
      }
    }
    if (cents.isEmpty) bad("no coarse centroids")
    // shape validation HERE, not at first query: a truncated 'C' or 'P'
    // line must fail the load contract, not surface later as a confusing
    // dimension mismatch inside probes/queryTables
    cents.foreach { case (b, c) =>
      if (c.length != dim) bad(s"centroid $b has ${c.length} values; dim=$dim")
    }
    for (i <- 0 until m; j <- 0 until k) {
      if (codebook(i)(j) == null) bad(s"missing codebook entry ($i,$j)")
      if (codebook(i)(j).length != dim / m)
        bad(s"codebook entry ($i,$j) has ${codebook(i)(j).length} values; subDim=${dim / m}")
    }
    (Coarse(kind, param, cents.toMap), PQModel(m, k, dim, codebook))
  }

  /** The spill factor a persisted artifact was BUILT at — `None` for a
    * pre-round-5 model file that predates spill recording. Callers asking
    * to reuse an artifact at a different spill must check this (a spill=1
    * artifact served under a spill=2 request would silently deliver the
    * lower-recall operating point).
    */
  def artifactSpill(spark: SparkSession, dir: String): Option[Int] = {
    val path = new org.apache.hadoop.fs.Path(dir, ModelFile)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else {
      val head = readFully(fs, path).takeWhile(_ != '\n').split(',')
      if (head.length == 6 && head(5).forall(_.isDigit)) Some(head(5).toInt)
      else None
    }
  }

  private def readMeta(spark: SparkSession, dir: String): Option[String] = {
    val meta = new org.apache.hadoop.fs.Path(dir, "_ivfpq_meta")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(meta)) None else Some(readFully(fs, meta).trim)
  }

  /** Per-cell ADC lookup tables for a query: table(b)(i)(j) = squared L2
    * between subvector i of the query's residual IN CELL b and centroid
    * (i, j) of the codebook. Sub-sums run in fixed index order, matching
    * the oracle's `list_sum(list_transform(range…))`.
    */
  def queryTables(
      coarse: Coarse, pq: PQModel, queryVec: Seq[Float],
      probeCells: Seq[Int]): Map[Int, Array[Array[Double]]] =
    probeCells.map { b =>
      val cent = coarse.centroids(b)
      require(queryVec.length == cent.length,
        s"query vector has ${queryVec.length} dims; cell centroid has ${cent.length}")
      val qr = Array.tabulate(cent.length)(i => queryVec(i).toDouble - cent(i))
      b -> (0 until pq.m).map { i =>
        (0 until pq.k).map { j =>
          val c = pq.centroids(i)(j)
          var acc = 0.0; var t = 0
          while (t < pq.subDim) {
            val x = qr(i * pq.subDim + t) - c(t); acc += x * x; t += 1
          }
          acc
        }.toArray
      }.toArray
    }.toMap

  /** The per-cell ADC scoring kernel as a UDF over `(bucket, codes)`:
    * sums the cell's lookup table in subspace-ascending order (matching
    * the oracle's `list_sum(list(… ORDER BY i))`). Shared by the
    * standalone artifact search and the engine's approximate `near`.
    * Callers must restrict the scan to `tables.keySet` first — only
    * probed cells have tables.
    */
  def adcUdf(tables: Map[Int, Array[Array[Double]]]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(tables.nonEmpty, "ADC scoring with no probed-cell tables")
    val m = tables.head._2.length
    udf { (b: Int, cs: Seq[Int]) =>
      // a truncated codes row would otherwise score a PARTIAL (smaller)
      // sum and falsely win the rescore set; a longer one would throw a
      // bare AIOOBE from the task — fail fast like the packed/PQ kernels
      require(cs.length == m,
        s"codes row has ${cs.length} codes; codebook has m=$m")
      val t = tables(b)
      var acc = 0.0
      var i = 0
      while (i < cs.length) { acc += t(i)(cs(i)); i += 1 }
      acc
    }
  }

  /** Serve straight from a self-contained artifact directory (model
    * loaded via [[loadModel]] — no in-memory fit state needed).
    */
  def searchArtifact(
      spark: SparkSession, dir: String, queryVec: Seq[Float],
      k: Int, rescore: Int, metric: Metric, nprobe: Int): DataFrame = {
    val (coarse, pq) = loadModel(spark, dir)
    searchArtifact(spark, dir, queryVec, coarse, pq, k, rescore, metric, nprobe)
  }

  /** Search a [[writeArtifact]] directory: probe → per-cell ADC over the
    * codes column (the scan reads `(id, bucket, codes)` only — column
    * pruning keeps the wide `vec` out of stage 1) → top-`rescore`
    * candidates → exact re-rank on the candidates' full vectors.
    */
  def searchArtifact(
      spark: SparkSession, dir: String, queryVec: Seq[Float],
      coarse: Coarse, pq: PQModel, k: Int, rescore: Int,
      metric: Metric, nprobe: Int): DataFrame = {
    readMeta(spark, dir).foreach { stored =>
      val expect = s"${coarse.kind},${coarse.param},${pq.m},${pq.k},${pq.dim}"
      require(stored == expect,
        s"artifact at $dir was written as ($stored), probed as ($expect)")
    }
    val cells = probes(coarse, queryVec, nprobe)
    require(cells.nonEmpty, "no populated cells to probe")
    val tables = queryTables(coarse, pq, queryVec, cells)
    val adc = adcUdf(tables)
    val art = spark.read.parquet(dir)
    // a spilled artifact stores a vector in several cells, so an id may
    // score in more than one probed cell: keep its best ADC score (for a
    // spill=1 artifact the groupBy is a per-id singleton — same values)
    val cands = art
      .filter(col("bucket").isin(cells: _*))
      .select(col("id"), adc(col("bucket"), col("codes")).as("approx_distance"))
      .groupBy("id").agg(min(col("approx_distance")).as("approx_distance"))
      .orderBy(col("approx_distance").asc, col("id").asc)
      .limit(rescore)
    art
      .filter(col("bucket").isin(cells: _*)) // candidates live in probed cells
      .join(broadcast(cands.select("id")), "id")
      // spilled copies carry identical vectors; report the lowest cell id
      // (deterministic, and the single cell when spill=1)
      .groupBy(col("id"))
      .agg(min(col("bucket")).as("bucket"), min_by(col("vec"), col("bucket")).as("vec"))
      .select(col("id"), col("bucket"),
        graft.functions.Distances.distanceToQuery(metric, col("vec"), queryVec)
          .as("distance"))
      .orderBy(col("distance").asc, col("id").asc)
      .limit(k)
  }
}
