package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding preprocessing: Johnson–Lindenstrauss random projection with
  * a SPARSE SIGN matrix (Achlioptas 2003) — the fit-free dimensionality
  * reduction that runs before LSH/IVF when the raw dimension is too wide
  * to index (JL: pairwise distances are preserved within 1±ε at
  * k = O(ln n / ε²) output dims, independent of the input dimension).
  *
  * The projection matrix is never trained and never stored: entry
  * R[i][j] = ±1/√k by the PARITY OF md5("i,j,salt") — a pure function of
  * (position, salt) that any engine with md5 reproduces, which is what
  * lets the DuckDB oracle replay the full projected vectors (a Gaussian
  * matrix would need a seeded RNG no two engines share). The matrix is
  * materialized ONCE driver-side (d×k tiny) and folded into the per-row
  * expression as array literals, so executors do one multiply-add sweep
  * per row inside codegen — no per-row hashing, no shuffle, no state.
  */
object Embeddings {

  /** +1 / −1 from the md5 parity of "i,j,salt" — first hex digit < '8'.
    * Matches the SQL `md5(i || ',' || j || ',' || salt)` replay exactly.
    */
  private[graft] def signAt(i: Int, j: Int, salt: String): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i,$j,$salt".getBytes("UTF-8"))
    // first hex digit is the high nibble of byte 0
    if (((digest(0) >> 4) & 0xf) < 8) 1.0 else -1.0
  }

  /** Project `vec` (array<numeric>, fixed length `dIn`) to `dOut` dims.
    * Output columns p0..p{dOut-1} as doubles (scaled by 1/√dOut), id
    * preserved. Rows with null/short vectors are dropped (they have no
    * well-defined projection).
    */
  def jlProject(df: DataFrame, id: Column, vec: Column,
      dIn: Int, dOut: Int, salt: String = "graft-jl"): DataFrame = {
    require(dIn > 0 && dOut > 0, s"dims must be positive (got $dIn -> $dOut)")
    require(dOut <= dIn, s"projection should reduce ($dIn -> $dOut)")
    val scale = 1.0 / math.sqrt(dOut.toDouble)
    val outCols = (0 until dOut).map { j =>
      // Σ_i vec[i]·sign(i,j) as an EXPLICIT left fold in double: the
      // summation order is part of the operator's contract, so any
      // engine replaying the same chain reproduces the IEEE result
      // bit-for-bit (a DECIMAL accumulation is NOT usable here — Spark's
      // chained decimal "+" hits the precision cap around ten terms and
      // silently drops fractional digits, observed as 1e-6 drift vs
      // DuckDB's exact decimal SUM)
      val terms = (0 until dIn).map(i =>
        element_at(vec, i + 1).cast("double") * lit(signAt(i, j, salt)))
      (terms.reduce(_ + _) * lit(scale)).as(s"p$j")
    }
    df.filter(vec.isNotNull && size(vec) >= dIn)
      .select((id.cast("long").as("id") +: outCols): _*)
  }

  /** The DuckDB-side sign expression for matrix entry (i, j) — kept next
    * to [[signAt]] so the two parities can never drift.
    */
  def sqlSign(i: Int, j: Int, salt: String = "graft-jl"): String =
    s"(CASE WHEN substr(md5('$i,$j,$salt'), 1, 1) < '8' THEN 1.0 ELSE -1.0 END)"

  // ---- PCA: the TRAINED complement to JL ---------------------------------

  /** A fitted PCA basis: per-dim mean, eigenvalues desc, and `basis(c)(i)`
    * = component c's loading on input dim i (rows orthonormal).
    */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
      basis: Array[Array[Double]]) {
    def explainedVariance: Array[Double] = {
      val t = eigenvalues.sum
      if (t <= 0) eigenvalues.map(_ => 0.0) else eigenvalues.map(_ / t)
    }
  }

  /** Fit PCA from ONE corpus pass: every (i ≤ j) cross-product, the
    * per-dim sums, and the count ride one explode → groupBy with
    * DECIMAL accumulation — exact and order-free, so the covariance
    * matrix (and therefore the whole model) is bit-identical under any
    * partition layout: no seeded sampling, no float summation drift.
    * The shuffle is ≤ d(d+1)/2 + d + 1 cells per partition (map-side
    * combine), independent of corpus size; the eigensolve is a cyclic
    * Jacobi on the driver's d×d matrix — deterministic rotation order,
    * eigenvectors sign-normalized (largest-|loading| component positive).
    * For 100 TB fit on an upstream [[Sampling]] slice if one pass over
    * everything is too dear; exactness, not sampling, is the default.
    */
  def fitPca(df: DataFrame, vec: Column, dIn: Int): PcaModel = {
    require(dIn > 0, s"dIn must be positive (got $dIn)")
    val spark = df.sparkSession
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    // one posexplode + a self-equi-join on a per-run row id (uniqueness is
    // all that matters — the aggregated products are layout-free), NOT a
    // d²-literal expression per row: a 64-dim corpus would need a
    // 2000-struct array() whose plan alone exhausts the driver heap
    val base = df.filter(vec.isNotNull && size(vec) >= dIn)
      .select(monotonically_increasing_id().as("_rid"),
        slice(vec.cast("array<double>"), 1, dIn).as("_v"))
      .localCheckpoint() // 3 consumers + pins the per-run row ids
    val ex = base.select($"_rid", posexplode($"_v").as(Seq("i", "x")))
    val n = base.count().toDouble
    require(n >= 2, s"need at least 2 rows to fit PCA (got ${n.toLong})")
    val dimSums = ex.groupBy($"i").agg(sum($"x".cast(dec)).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1).doubleValue).toMap
    val prodSums = ex.alias("a")
      .join(ex.alias("b"), col("a._rid") === col("b._rid") && col("b.i") >= col("a.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum((col("a.x") * col("b.x")).cast(dec)).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2).doubleValue).toMap
    val mean = Array.tabulate(dIn)(i => dimSums(i) / n)
    val cov = Array.tabulate(dIn, dIn) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      prodSums((a, b)) / n - mean(i) * mean(j)
    }
    val (vals, vecs) = jacobiEigen(cov)
    PcaModel(mean, vals, vecs)
  }

  /** Cyclic Jacobi eigensolve for a symmetric matrix — fixed (p,q) sweep
    * order and a fixed convergence threshold, so identical input doubles
    * yield identical eigenpairs on any JVM. Returns (eigenvalues desc,
    * orthonormal row-basis), ties broken by original index, each vector
    * sign-normalized.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-14) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-18) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until d) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val basis = order.map { ci =>
      val col = Array.tabulate(d)(k => v(k)(ci))
      // sign convention: the largest-|loading| entry (first on ties) is positive
      val m = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(m) < 0) col.map(x => -x) else col
    }.toArray
    (vals, basis)
  }

  /** Project onto the top-k fitted components: p_c = Σ_i (x_i − μ_i)·w_c_i
    * as an explicit left fold of literals — the JL determinism contract.
    */
  def pcaProject(df: DataFrame, id: Column, vec: Column,
      model: PcaModel, k: Int): DataFrame = {
    val dIn = model.mean.length
    require(k > 0 && k <= dIn, s"k must be in [1, $dIn] (got $k)")
    val outCols = (0 until k).map { c =>
      val terms = (0 until dIn).map(i =>
        (element_at(vec, i + 1).cast("double") - lit(model.mean(i))) * lit(model.basis(c)(i)))
      terms.reduce(_ + _).as(s"p$c")
    }
    df.filter(vec.isNotNull && size(vec) >= dIn)
      .select((id.cast("long").as("id") +: outCols): _*)
  }
}
