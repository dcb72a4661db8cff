package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimized Product Quantization — the parametric variant of Ge et al.,
  * CVPR 2013 ("Optimized Product Quantization for Approximate Nearest
  * Neighbor Search"): learn an ORTHOGONAL rotation that aligns the
  * coordinate system with the corpus's principal axes and allocate those
  * axes across the PQ subspaces so each subspace carries a balanced share
  * of the variance (the paper's eigenvalue-allocation solution under the
  * Gaussian assumption), then run plain PQ in the rotated space.
  *
  * Why it matters: axis-aligned subvector slicing (the reference's PQ,
  * shard/vectorstore/product.go:175–236) quantizes whatever correlation
  * structure the raw dimension ORDER happens to expose — on anisotropic
  * or rotated corpora a few subspaces carry most of the variance and the
  * codebook budget of the rest is wasted. A rotation costs one d×d
  * matrix–vector product per ENCODE (build path) and one per QUERY
  * (driver-side, nanoseconds) — the hot candidate scan still touches only
  * the m-byte codes, so the 100 TB scan shape is IDENTICAL to plain PQ.
  *
  * Orthogonality preserves distances exactly (‖Rx − Rq‖ = ‖x − q‖), so
  * the rotated-space ADC estimates the true metric with plain-PQ
  * semantics and the exact re-rank stage stays on the ORIGINAL vectors.
  *
  * Determinism: the rotation derives from [[Embeddings.fitPca]] (exact
  * fixed-point covariance, cyclic Jacobi, sign-normalized eigenvectors —
  * bit-identical under any partition layout) and the codebooks from
  * [[ProductQuantizer.fit]]'s canonically-sorted sample, so the whole
  * model is a pure function of the corpus (the pinned-golden contract of
  * `opq_adc_topk`).
  */
object Opq {

  /** A fitted OPQ model: `rotation(i)(j)` = output dim i's loading on
    * input dim j (rows orthonormal — a permuted PCA basis), plus the PQ
    * codebooks learned in the ROTATED space.
    */
  final case class OpqModel(rotation: Array[Array[Double]], pq: PQModel) {
    def dim: Int = pq.dim

    /** Rotate one vector: double accumulation in ascending-j order, one
      * float32 collapse per output dim — the same arithmetic the encode
      * UDF and the SQL oracles replay.
      */
    def rotate(v: Array[Float]): Array[Float] = Opq.rotateVec(rotation, v)
  }

  /** Rotate one vector: double accumulation in ascending-j order, one
    * float32 collapse per output dim — the same arithmetic the encode
    * UDF and the SQL oracles replay.
    */
  def rotateVec(rotation: Array[Array[Double]], v: Array[Float]): Array[Float] = {
    val d = rotation.length
    require(v.length == d, s"vector has ${v.length} dims; rotation is $d×$d")
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      val row = rotation(i)
      var acc = 0.0
      var j = 0
      while (j < d) { acc += row(j) * v(j); j += 1 }
      out(i) = acc.toFloat
      i += 1
    }
    out
  }

  /** Eigenvalue allocation (Ge et al. §4.2): distribute the principal
    * axes (eigenvalues DESCENDING, the order [[Embeddings.fitPca]]
    * returns) over `m` buckets of `subDim` slots each, greedily assigning
    * the next axis to the non-full bucket with the smallest current
    * log-variance product — balancing Π λ across subspaces, which
    * minimizes the product of per-subspace quantization distortions under
    * the paper's independence assumption. Returns the component
    * permutation: output dim p(r) of the rotation is principal axis
    * `alloc(r)`. Deterministic: ties break on bucket index.
    */
  private[graft] def eigenAllocation(
      eigenvalues: Array[Double], m: Int, subDim: Int): Array[Int] = {
    val d = eigenvalues.length
    require(m * subDim == d, s"allocation needs m*subDim = d (got ${m}*${subDim} != $d)")
    val buckets = Array.fill(m)(List.empty[Int])
    val logSum = new Array[Double](m)
    val counts = new Array[Int](m)
    var i = 0
    while (i < d) {
      var best = -1
      var bestLog = Double.MaxValue
      var b = 0
      while (b < m) {
        if (counts(b) < subDim && logSum(b) < bestLog) { best = b; bestLog = logSum(b) }
        b += 1
      }
      buckets(best) = i :: buckets(best)
      // a zero eigenvalue would send the log to -inf and soak up every
      // following axis — floor it so degenerate axes spread evenly
      logSum(best) += math.log(math.max(eigenvalues(i), 1e-12))
      counts(best) += 1
      i += 1
    }
    buckets.flatMap(_.reverse)
  }

  /** Fit: PCA basis → eigenvalue allocation → rotation = the allocated
    * permutation of principal axes → plain PQ on the rotated sample.
    *
    * BOTH stages train on the ONE canonical bounded sample
    * ([[Similarity.vectorSample]]: ≤ `sampleLimit` rows, lexicographically
    * sorted) — quantizer training is sample-scale by nature, so at 100 TB
    * the whole fit costs one bounded limit+collect, never a full-corpus
    * covariance pass (the d²-cell exact PCA would otherwise scan
    * everything). At gate scale the sample IS the corpus, so the model
    * stays a pure function of it: [[Embeddings.fitPca]] is exact and
    * order-free over the sorted sample, the rotation is a pure function
    * of the PCA model, and the rotated sample feeds the seeded Lloyd's
    * in its (deterministic) raw-space canonical order — the pinned-golden
    * contract of `opq_adc_topk`. Encoding below stays distributed.
    */
  def fit(
      df: DataFrame, vec: Column, dim: Int, m: Int, k: Int,
      seed: Long = 42L, sampleLimit: Int = 100000): OpqModel = {
    require(dim % m == 0, s"dim $dim not divisible by numSubVectors $m")
    val spark = df.sparkSession
    import spark.implicits._
    val clean = df.filter(vec.isNotNull && size(vec) === dim)
    val sample = Similarity.vectorSample(clean, vec, sampleLimit)
    require(sample.nonEmpty, "cannot fit OPQ on an empty corpus")
    val sampleDf = spark.createDataset(sample.toIndexedSeq.map(_.toSeq)).toDF("_sv")
    val pca = Embeddings.fitPca(sampleDf, col("_sv"), dim)
    val perm = eigenAllocation(pca.eigenvalues, m, dim / m)
    val rotation = perm.map(pca.basis(_))
    // rotate the already-collected sample driver-side (with the encode
    // path's float32 collapse, so codebooks train on exactly the values
    // they will quantize) and fit the rotated-space codebooks locally —
    // no second distributed pass over the corpus
    val rotated = sample.map(v =>
      rotateVec(rotation, v.map(_.toFloat)).map(_.toDouble).toSeq)
    val rotatedDf = spark.createDataset(rotated.toIndexedSeq).toDF("_rv")
    val pq = ProductQuantizer.fit(rotatedDf, col("_rv"), m, k, dim, seed, sampleLimit)
    OpqModel(rotation, pq)
  }

  /** The rotation as a reusable compiled UDF (broadcast matrix, primitive
    * loop — the interpreted `aggregate(sequence…)` formulation walks an
    * expression tree per CELL, the measured ~8–100× trap).
    */
  def rotateUdf(rotation: Array[Array[Double]]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val d = rotation.length
    udf { (v: Seq[Float]) =>
      val arr = v.toArray
      require(arr.length == d, s"vector has ${arr.length} dims; rotation is $d×$d")
      val out = new Array[Float](d)
      var i = 0
      while (i < d) {
        val row = rotation(i)
        var acc = 0.0
        var j = 0
        while (j < d) { acc += row(j) * arr(j); j += 1 }
        out(i) = acc.toFloat
        i += 1
      }
      out
    }
  }

  /** Encode: rotate, then the standard PQ argmin — `(id, codes)`, byte
    * scale per subspace, same narrow build artifact as plain PQ.
    */
  def encode(df: DataFrame, id: Column, vec: Column, model: OpqModel): DataFrame =
    df.select(id.as("id"),
      ProductQuantizer.encodeUdf(model.pq)(rotateUdf(model.rotation)(vec)).as("codes"))

  /** ADC candidate scan: rotate the QUERY once (driver-side), then the
    * unchanged PQ lookup-table fold over the codes.
    */
  def adcSearch(codes: DataFrame, queryVec: Seq[Float], model: OpqModel, k: Int): DataFrame =
    ProductQuantizer.adcSearch(
      codes, model.rotate(queryVec.toArray).toSeq, model.pq, k)

  /** The full production shape: rotated-space ADC picks `rescore`
    * candidates, the true metric re-ranks just those rows on the
    * ORIGINAL vectors with the ORIGINAL query (the rotation never touches
    * the exact stage — candidates only).
    */
  def adcSearchRescored(
      codes: DataFrame, raw: DataFrame, id: Column, vec: Column,
      queryVec: Seq[Float], model: OpqModel, k: Int, rescore: Int,
      metric: graft.model.IndexKind.Metric): DataFrame = {
    val cands = adcSearch(codes, queryVec, model, rescore)
    raw
      .select(id.as("id"), vec.as("_v"))
      .join(broadcast(cands.select("id")), "id")
      .select(col("id"),
        graft.functions.Distances.distanceToQuery(metric, col("_v"), queryVec).as("distance"))
      .orderBy(col("distance").asc, col("id").asc)
      .limit(k)
  }
}
