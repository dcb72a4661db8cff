package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RaBitQ — Gao & Long, SIGMOD 2024 ("RaBitQ: Quantizing High-Dimensional
  * Vectors with a Theoretical Error Bound for Approximate Nearest Neighbor
  * Search"): center the corpus on its centroid, rotate the unit residuals
  * by a RANDOM orthogonal matrix, keep ONE sign bit per dimension plus three
  * scalars per vector — and estimate inner products with a provably
  * UNBIASED estimator whose error concentrates at O(1/√D). Extends the
  * §2.4 quantizer family beyond the reference's binary/product pair
  * (alongside SQ8 and OPQ) at the same 1-bit/dim budget as the plain
  * binary quantizer, but with error guarantees the threshold-sign code
  * cannot give:
  *
  *   - the BINARY quantizer ranks by hamming distance of threshold signs —
  *     a scan-reduction proxy with no magnitude information;
  *   - RaBitQ stores `(bits, ‖x−c‖, <o, x̄>)` where `o = (x−c)/‖x−c‖` is
  *     the unit residual and `x̄ = P·sign(Pᵀo)/√D` its quantized unit
  *     vector, and reconstructs ‖x−q‖² = ‖x−c‖² + ‖q−c‖² −
  *     2·‖x−c‖·‖q−c‖·⟨o,o_q⟩ with ⟨o,o_q⟩ ≈ ⟨x̄,o_q⟩/⟨o,x̄⟩ — unbiased
  *     (paper Theorem 3.2), |error| = O(1/√D) w.h.p. (Theorem 3.3).
  *
  * The candidate scan reads D/64 longs + 3 doubles per row (vs 4·D bytes
  * raw) and the per-row work is one masked sum over the packed words —
  * the same narrow-scan shape as the other quantizer artifacts, so the
  * 100 TB candidate-stage story is unchanged; the exact re-rank stage
  * reads wide vectors for ≤ rescore rows only.
  *
  * Determinism: the centroid uses the repo's decimal-mean convention
  * (order-free, oracle-replayable); the rotation is a pure function of
  * (dim, seed) — a seeded Gaussian matrix orthonormalized by classical
  * Gram-Schmidt in a FIXED column order with sign-normalized diagonal —
  * so models, codes, and estimates are bit-stable across partition
  * layouts and sessions (the pinned-golden contract of rbq_topk).
  */
object RaBitQ {

  /** A fitted model: the corpus centroid and the random rotation
    * (`rotation(i)(j)` = output dim i's loading on input dim j; rows
    * orthonormal). `rotation` may be the identity for oracle-replayable
    * closed-form gates — any orthogonal matrix preserves the estimator's
    * algebra; the RANDOM one is what makes the error bound
    * distribution-free (the paper's point).
    */
  final case class RbqModel(centroid: Array[Double], rotation: Array[Array[Double]]) {
    def dim: Int = centroid.length
  }

  /** Seeded random orthogonal matrix: a Gaussian matrix orthonormalized
    * by classical Gram–Schmidt in fixed column order, diagonal
    * sign-normalized — deterministic for a given (dim, seed) on any JVM
    * (java.util.Random's LCG and nextGaussian are specified).
    */
  def randomRotation(dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    val m = Array.fill(dim)(Array.fill(dim)(rnd.nextGaussian()))
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < i) {
        var dot = 0.0
        var t = 0
        while (t < dim) { dot += m(i)(t) * m(j)(t); t += 1 }
        t = 0
        while (t < dim) { m(i)(t) -= dot * m(j)(t); t += 1 }
        j += 1
      }
      var nrm = 0.0
      var t = 0
      while (t < dim) { nrm += m(i)(t) * m(i)(t); t += 1 }
      nrm = math.sqrt(nrm)
      require(nrm > 1e-9, s"degenerate Gram-Schmidt at row $i (seed $seed)")
      val s = (if (m(i)(i) < 0) -1.0 else 1.0) / nrm
      t = 0
      while (t < dim) { m(i)(t) *= s; t += 1 }
      i += 1
    }
    m
  }

  /** Fit = the corpus centroid (decimal-mean convention — the exact
    * per-dimension mean [[BinaryQuantizer.fit]] uses, so oracles replay
    * it) plus the seeded rotation. One aggregation pass; no sampling
    * needed — a mean is the only corpus statistic the paper's fit takes.
    */
  def fit(df: DataFrame, vec: Column, dim: Int, seed: Long = 42L): RbqModel =
    RbqModel(BinaryQuantizer.fit(df, vec, dim), randomRotation(dim, seed))

  /** Identity-rotation model for closed-form oracle gates: every stage of
    * the estimator (centering, unit residual, sign code, the two stored
    * scalars, the query-side fold) is then plain per-element arithmetic an
    * oracle engine can replay with no golden.
    */
  def fitIdentity(df: DataFrame, vec: Column, dim: Int): RbqModel =
    RbqModel(BinaryQuantizer.fit(df, vec, dim),
      Array.tabulate(dim)(i => Array.tabulate(dim)(j => if (i == j) 1.0 else 0.0)))

  private def rotate(rot: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val d = rot.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      val row = rot(i)
      var acc = 0.0
      var j = 0
      while (j < d) { acc += row(j) * v(j); j += 1 }
      out(i) = acc
      i += 1
    }
    out
  }

  /** Encode: `(id, bits array<long>, norm double, dotq double, dotc
    * double)` — `bits` packs sign(Pᵀo) 64/dim-per-long LSB-first (the
    * PackBits word layout), `norm` = ‖x−c‖, `dotq` = ⟨o, x̄⟩ = Σ|Pᵀo|/√D,
    * `dotc` = ⟨o, c⟩ (lets the DOT metric reconstruct ⟨x,q⟩ = ⟨c,q⟩ +
    * ‖x−c‖·(‖q−c‖·⟨o,o_q⟩ + ⟨o,c⟩) from the same code — the family's
    * metric-routing convention). A zero residual (x == c) stores norm 0
    * and all-zero bits; search treats it exactly.
    */
  def encode(df: DataFrame, id: Column, vec: Column, model: RbqModel): DataFrame =
    df.select(id.as("id"), encodeUdf(model)(vec).as("_e"))
      .select(col("id"), col("_e._1").as("bits"),
        col("_e._2").as("norm"), col("_e._3").as("dotq"),
        col("_e._4").as("dotc"))

  /** The encode kernel as a reusable UDF: `(bits, norm, dotq, dotc)` as a
    * struct (fields `_1.._4`) — [[encode]] flattens it to named columns;
    * [[RbqCodes.encodeExpr]] stores the struct whole as the coded walk's
    * `_codes` payload.
    */
  def encodeUdf(model: RbqModel): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val d = model.dim
    val bcC = model.centroid
    val bcR = model.rotation
    udf { (v: Seq[Float]) =>
      require(v.length == d, s"vector has ${v.length} dims; model is $d-d")
      val r = new Array[Double](d)
      var i = 0
      var n2 = 0.0
      while (i < d) {
        r(i) = v(i).toDouble - bcC(i)
        n2 += r(i) * r(i)
        i += 1
      }
      val norm = math.sqrt(n2)
      val words = new Array[Long]((d + 63) / 64)
      var dotq = 0.0
      var dotc = 0.0
      if (norm > 0) {
        i = 0
        while (i < d) { r(i) /= norm; i += 1 }
        val p = rotate(bcR, r)
        val invSqrtD = 1.0 / math.sqrt(d.toDouble)
        i = 0
        while (i < d) {
          if (p(i) > 0) words(i >> 6) |= (1L << (i & 63))
          dotq += math.abs(p(i)) * invSqrtD
          dotc += r(i) * bcC(i)
          i += 1
        }
      }
      (words.toSeq, norm, dotq, dotc)
    }
  }

  /** Top-k by the RaBitQ squared-L2 ESTIMATE. The query folds once on the
    * driver (center, normalize, rotate, prefix sums); the per-row scan is
    * a masked sum over the packed words: ⟨ū,q'⟩ = (2·Σ_{bit=1} q'ᵢ −
    * Σq'ᵢ)/√D, then ‖x−q‖²̂ = norm² + ‖r_q‖² − 2·norm·‖r_q‖·⟨ū,q'⟩/⟨o,x̄⟩.
    */
  def search(encoded: DataFrame, queryVec: Seq[Float], model: RbqModel, k: Int): DataFrame =
    encoded
      .select(col("id"),
        estimateExpr(col("bits"), col("norm"), col("dotq"), queryVec, model)
          .as("approx_distance"))
      .orderBy(col("approx_distance").asc, col("id").asc)
      .limit(k)

  /** Per-query driver-side fold shared by both estimators: the centered,
    * normalized, rotated query plus its prefix constants.
    */
  private final case class QueryFold(
      qp: Array[Double], qNorm: Double, qTotal: Double, invSqrtD: Double,
      cDotQ: Double)

  private def foldQuery(queryVec: Seq[Float], model: RbqModel): QueryFold = {
    val d = model.dim
    require(queryVec.length == d, s"query has ${queryVec.length} dims; model is $d-d")
    val rq = new Array[Double](d)
    var i = 0
    var n2 = 0.0
    var cq = 0.0
    while (i < d) {
      rq(i) = queryVec(i).toDouble - model.centroid(i)
      n2 += rq(i) * rq(i)
      cq += model.centroid(i) * queryVec(i)
      i += 1
    }
    val qNorm = math.sqrt(n2)
    val qp: Array[Double] =
      if (qNorm > 0) {
        i = 0
        while (i < d) { rq(i) /= qNorm; i += 1 }
        rotate(model.rotation, rq)
      } else new Array[Double](d)
    var qTotal = 0.0
    i = 0
    while (i < d) { qTotal += qp(i); i += 1 }
    QueryFold(qp, qNorm, qTotal, 1.0 / math.sqrt(d.toDouble), cq)
  }

  /** ⟨o_x, o_q⟩ estimate from the packed sign bits: (2·Σ_{bit=1} q'ᵢ −
    * Σq'ᵢ)/(√D·⟨o,x̄⟩) — the paper's unbiased estimator.
    */
  private def cosEstOf(f: QueryFold, words: Seq[Long], dotq: Double): Double = {
    var onSum = 0.0
    var w = 0
    while (w < words.length) {
      var bitsW = words(w)
      while (bitsW != 0) {
        val t = java.lang.Long.numberOfTrailingZeros(bitsW)
        onSum += f.qp((w << 6) + t)
        bitsW &= bitsW - 1
      }
      w += 1
    }
    (2.0 * onSum - f.qTotal) * f.invSqrtD / dotq
  }

  /** The squared-L2 estimator as a reusable Column (the engine's
    * approx-serving face builds candidate ranks from it the way PQ uses
    * adcDistance).
    */
  def estimateExpr(bits: Column, norm: Column, dotq: Column,
      queryVec: Seq[Float], model: RbqModel): Column = {
    val sc = l2Scorer(model, queryVec)
    val est = udf { (words: Seq[Long], norm: Double, dotq: Double) =>
      sc(words, norm, dotq)
    }
    est(bits, norm, dotq)
  }

  /** The squared-L2 estimator as a LOCAL scalar function (one query fold,
    * then per-code evaluation) — the column form above wraps it; the
    * coded graph walk ([[RbqCodes]]) calls it directly on fetched
    * payloads, driver-side.
    */
  def l2Scorer(model: RbqModel,
      queryVec: Seq[Float]): (Seq[Long], Double, Double) => Double = {
    val f = foldQuery(queryVec, model)
    (words, norm, dotq) =>
      if (norm == 0.0 || dotq <= 0.0) f.qNorm * f.qNorm
      else {
        val cosEst = cosEstOf(f, words, dotq)
        norm * norm + f.qNorm * f.qNorm - 2.0 * norm * f.qNorm * cosEst
      }
  }

  /** LOCAL form of [[dotEstimateExpr]] (negated inner product). */
  def dotScorer(model: RbqModel,
      queryVec: Seq[Float]): (Seq[Long], Double, Double, Double) => Double = {
    val f = foldQuery(queryVec, model)
    (words, norm, dotq, dotc) =>
      if (norm == 0.0 || dotq <= 0.0) -f.cDotQ
      else {
        val cosEst = cosEstOf(f, words, dotq)
        -(f.cDotQ + norm * (f.qNorm * cosEst + dotc))
      }
  }

  /** NEGATED inner-product estimate (the Dot metric's distance sign):
    * ⟨x,q⟩ = ⟨c,q⟩ + ‖x−c‖·(‖q−c‖·⟨o,o_q⟩ + ⟨o,c⟩) — exact when the
    * residual is zero, the paper's estimator for the ⟨o,o_q⟩ factor.
    */
  def dotEstimateExpr(bits: Column, norm: Column, dotq: Column, dotc: Column,
      queryVec: Seq[Float], model: RbqModel): Column = {
    val sc = dotScorer(model, queryVec)
    val est = udf { (words: Seq[Long], norm: Double, dotq: Double, dotc: Double) =>
      sc(words, norm, dotq, dotc)
    }
    est(bits, norm, dotq, dotc)
  }

  /** The production two-stage shape: estimator top-`rescore` candidates,
    * exact metric re-rank on the original vectors — identical staging to
    * every other quantizer's rescored search.
    */
  def searchRescored(
      encoded: DataFrame, raw: DataFrame, id: Column, vec: Column,
      queryVec: Seq[Float], model: RbqModel, k: Int, rescore: Int,
      metric: graft.model.IndexKind.Metric): DataFrame = {
    val cands = search(encoded, queryVec, model, rescore)
    raw
      .select(id.as("id"), vec.as("_v"))
      .join(broadcast(cands.select("id")), "id")
      .select(col("id"),
        graft.functions.Distances.distanceToQuery(metric, col("_v"), queryVec).as("distance"))
      .orderBy(col("distance").asc, col("id").asc)
      .limit(k)
  }
}
