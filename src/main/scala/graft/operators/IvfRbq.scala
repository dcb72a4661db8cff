package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.IndexKind.Metric

/** IVF-RaBitQ — the RaBitQ paper's own deployment shape (Gao & Long,
  * SIGMOD 2024 §4 pair RaBitQ with an IVF index): coarse cells restrict
  * the scan, and each row stores the 1-bit RaBitQ code of its CELL
  * residual under ONE global random rotation. The algebra is exactly the
  * flat [[RaBitQ]] estimator with the cell centroid as the centering
  * point — ‖x−q‖² = ‖r‖² + ‖q−c_b‖² − 2‖r‖·‖q−c_b‖·⟨o_r, o_{q−c_b}⟩ —
  * so every per-cell score reuses [[RaBitQ.estimateExpr]] with a
  * per-cell model, and the candidate stage reads `(id, bucket, bits,
  * norm, dotq)` only — D/64 longs + 2 doubles a row (column pruning; Dot
  * queries additionally read the per-cell `dotc` scalar that closes the
  * MIPS centering algebra) — inside `nprobe` PARTITION-PRUNED cells. At 100 TB the probe restriction is partition
  * pruning of a `bucket=<b>/` layout (the [[IvfPq]] artifact
  * convention), not a filter over a full scan, and the bit codes are
  * 32× narrower than the raw vectors the exact re-rank stage reads for
  * ≤ `rescore` candidates only.
  *
  * Reuses [[IvfPq.Coarse]] (sign or k-means cells, same probe order) and
  * [[RaBitQ.randomRotation]] — determinism and the oracle-replayability
  * of the sign-cell + identity-rotation configuration follow from those
  * pieces' own conventions.
  */
object IvfRbq {

  /** Encode: `(id, vec, bucket, bits, norm, dotq, dotc)` — each row's
    * RaBitQ code of its cell residual, with `dotc` = ⟨o, c_bucket⟩ (the
    * flat layout's MIPS-closure scalar, per-cell centered — round 10:
    * the Dot metric no longer fails fast). One pass; the residual + code
    * arithmetic is the flat encode's with `c = centroid(bucket)`.
    */
  def encode(
      corpus: DataFrame, id: Column, vec: Column,
      coarse: IvfPq.Coarse, rotation: Array[Array[Double]]): DataFrame = {
    val d = coarse.dim
    require(rotation.length == d && rotation.forall(_.length == d),
      s"rotation is not $d-square")
    val cents = coarse.centroids
    val assigned = IvfPq.assignBuckets(corpus, vec, coarse)
    val enc = udf { (b: Int, v: Seq[Float]) =>
      val c = cents.getOrElse(b,
        throw new IllegalArgumentException(s"row assigned to unknown cell $b"))
      require(v.length == d, s"vector has ${v.length} dims; cells are $d-d")
      val r = new Array[Double](d)
      var i = 0
      var n2 = 0.0
      while (i < d) { r(i) = v(i).toDouble - c(i); n2 += r(i) * r(i); i += 1 }
      val norm = math.sqrt(n2)
      val words = new Array[Long]((d + 63) / 64)
      var dotq = 0.0
      var dotc = 0.0
      if (norm > 0) {
        i = 0
        while (i < d) { r(i) /= norm; i += 1 }
        val p = new Array[Double](d)
        i = 0
        while (i < d) {
          val row = rotation(i)
          var acc = 0.0
          var j = 0
          while (j < d) { acc += row(j) * r(j); j += 1 }
          p(i) = acc
          i += 1
        }
        val invSqrtD = 1.0 / math.sqrt(d.toDouble)
        i = 0
        while (i < d) {
          if (p(i) > 0) words(i >> 6) |= (1L << (i & 63))
          dotq += math.abs(p(i)) * invSqrtD
          dotc += r(i) * c(i)
          i += 1
        }
      }
      (words.toSeq, norm, dotq, dotc)
    }
    assigned
      .select(id.as("id"), vec.as("vec"), col("bucket"),
        enc(col("bucket"), vec).as("_e"))
      .select(col("id"), col("vec"), col("bucket"),
        col("_e._1").as("bits"), col("_e._2").as("norm"),
        col("_e._3").as("dotq"), col("_e._4").as("dotc"))
  }

  /** Materialize the index under `bucket=<b>/` directories (the
    * [[IvfPq.writeArtifact]] layout — probe restriction becomes partition
    * pruning) plus a meta guard binding the artifact to its coarse shape
    * and rotation seed fingerprint.
    */
  def writeArtifact(
      corpus: DataFrame, id: Column, vec: Column,
      coarse: IvfPq.Coarse, rotation: Array[Array[Double]], dir: String): Unit = {
    encode(corpus, id, vec, coarse, rotation)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val meta = new org.apache.hadoop.fs.Path(dir, "_ivfrbq_meta")
    val fs = meta.getFileSystem(corpus.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(meta, true)
    try out.write(metaString(coarse, rotation).getBytes("UTF-8"))
    finally out.close()
  }

  /** The guard string binding an artifact to its coarse shape and the
    * rotation's content fingerprint (cells and rotation are pure
    * functions of their params, so equality of this string means the
    * supplied model reproduces the artifact's codes).
    */
  def metaString(coarse: IvfPq.Coarse, rotation: Array[Array[Double]]): String = {
    // SHA-256 over the little-endian doubleToLongBits stream: a 32-bit
    // Arrays.hashCode could collide and let a different (or corrupted)
    // rotation pass the guard — the exact failure the guard exists to stop
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val buf = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    rotation.foreach(_.foreach { d =>
      buf.clear(); buf.putLong(java.lang.Double.doubleToLongBits(d))
      md.update(buf.array())
    })
    val fp = md.digest().map(b => f"$b%02x").mkString
    // v2: the layout gained the per-cell <o,c> scalar (dotc) — a v1
    // artifact must fail the guard, not surface a missing column later
    s"${coarse.kind},${coarse.param},${coarse.dim},$fp,v2"
  }

  /** The stored guard string of an artifact dir, if one exists there. */
  def metaOf(spark: SparkSession, dir: String): Option[String] = {
    val meta = new org.apache.hadoop.fs.Path(dir, "_ivfrbq_meta")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(meta)) None
    else {
      val in = fs.open(meta)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1024)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, "UTF-8"))
      } finally in.close()
    }
  }

  /** Search an encoded frame (or a [[writeArtifact]] read): probe cells by
    * L2-to-centroid (the IvfPq probe convention — Metric.Dot probes by
    * inner product, [[IvfPq.probesDot]], since an unnormalized MIPS
    * query's best cells are the high-dot ones L2 probing would skip),
    * score the probed rows by the PER-CELL RaBitQ estimator (a `when`
    * chain over nprobe cells, each arm the flat [[RaBitQ.estimateExpr]] —
    * or, for Dot, [[RaBitQ.dotEstimateExpr]] closing the centering
    * algebra with the stored per-cell ⟨o,c⟩ — with that cell's centering
    * model), keep the best `rescore` candidates, exact re-rank.
    */
  def search(
      encoded: DataFrame, queryVec: Seq[Float],
      coarse: IvfPq.Coarse, rotation: Array[Array[Double]],
      k: Int, rescore: Int, metric: Metric, nprobe: Int): DataFrame = {
    val dot = metric == Metric.Dot
    val cells =
      if (dot) IvfPq.probesDot(coarse, queryVec, nprobe)
      else IvfPq.probes(coarse, queryVec, nprobe)
    require(cells.nonEmpty, "no populated cells to probe")
    val arms = cells.map { b =>
      val model = RaBitQ.RbqModel(coarse.centroids(b), rotation)
      val arm =
        if (dot) RaBitQ.dotEstimateExpr(
          col("bits"), col("norm"), col("dotq"), col("dotc"), queryVec, model)
        else RaBitQ.estimateExpr(
          col("bits"), col("norm"), col("dotq"), queryVec, model)
      (b, arm)
    }
    val cd = arms.tail.foldLeft(
      when(col("bucket") === arms.head._1, arms.head._2)) {
      case (acc, (b, e)) => acc.when(col("bucket") === b, e)
    }
    val probed = encoded.filter(col("bucket").isin(cells: _*))
    val cands = probed
      .select(col("id"), cd.as("approx_distance"))
      .orderBy(col("approx_distance").asc, col("id").asc)
      .limit(rescore)
    probed
      .join(broadcast(cands.select("id")), "id")
      .select(col("id"),
        graft.functions.Distances.distanceToQuery(metric, col("vec"), queryVec)
          .as("distance"))
      .orderBy(col("distance").asc, col("id").asc)
      .limit(k)
  }
}
