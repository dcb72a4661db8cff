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

  /** Deterministic perturbed replication — the recall-at-scale corpus
    * generator: `factor` copies of every vector, each dimension of each
    * copy nudged by an xxhash64-derived uniform in [−eps, +eps] (replica
    * 0 unperturbed), then re-normalized to unit length. A pure row
    * function of (id, replica, dim): layout-independent, reproducible,
    * no RNG state. Replica clouds preserve the base corpus's
    * neighborhood structure while making every vector distinct — so
    * exact top-k at N× scale has real within-cloud ranking to get right,
    * not ties. Ids offset by (max id + 1) per replica.
    *
    * Scale: crossJoin with a `factor`-row literal range (broadcast) and
    * per-row codegen transforms — no shuffle.
    */
  def replicatePerturbed(df: DataFrame, id: Column, vec: Column,
      factor: Int, eps: Double, salt: String = "graft-scale"): DataFrame = {
    require(factor >= 1, s"factor must be >= 1 (got $factor)")
    require(eps >= 0.0, s"eps must be non-negative (got $eps)")
    val spark = df.sparkSession
    // null vectors would renormalize to null rows and sort FIRST under an
    // ascending distance order, corrupting any exact baseline built on
    // the replicas - drop them here (they have no well-defined cloud)
    val base = df.filter(vec.isNotNull)
    val maxId = base.agg(max(id.cast("long"))).head()
    require(!maxId.isNullAt(0), "replicatePerturbed on an empty corpus")
    val step = maxId.getLong(0) + 1
    // Perturb + renormalize as ONE compiled per-row loop. The previous
    // inline form (interpreted HOFs) had a quadratic collapse: the `_n`
    // norm column was a lazy projection, so CollapseProject re-inlined
    // its aggregate() into EVERY element of the final transform — dim²
    // interpreted evals per row, 2.4M at 1536-d, measured at minutes/row
    // on the recall harness. The UDF replays the exact same arithmetic —
    // Spark's own XXH64 chain (seed 42, child-by-child reseeding, the
    // int-typed lambda index, the UTF8 salt) and the identical
    // float/double cast points — so replicated corpora are bit-identical
    // to the old path (EmbeddingsSpec pins this against the inline
    // expression form at 64-d).
    val saltU8 = org.apache.spark.unsafe.types.UTF8String.fromString(salt)
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val perturb = udf { (vBase: Long, rep: Long, v: Seq[Float]) =>
      val d = v.length
      val p = new Array[Float](d)
      var i = 0
      while (i < d) {
        val n =
          if (rep == 0L) 0.0f
          else {
            var h = XXH64.hashLong(vBase, 42L)
            h = XXH64.hashLong(rep, h)
            h = XXH64.hashInt(i, h)
            h = XXH64.hashUTF8String(saltU8, h)
            val pm = ((h % 20001L) + 20001L) % 20001L
            ((pm - 10000L).toDouble / 10000.0 * eps).toFloat
          }
        p(i) = v(i) + n
        i += 1
      }
      var acc = 0.0
      i = 0
      while (i < d) { acc += p(i).toDouble * p(i).toDouble; i += 1 }
      val nrm = math.sqrt(acc)
      val out = new Array[Float](d)
      i = 0
      while (i < d) { out(i) = (p(i).toDouble / nrm).toFloat; i += 1 }
      out
    }
    base.select(id.cast("long").as("_base"), vec.cast("array<float>").as("_v"))
      .crossJoin(spark.range(factor).select(col("id").as("_rep")))
      .select(
        (col("_base") + col("_rep") * step).as("vec_id"),
        perturb(col("_base"), col("_rep"), col("_v")).as("embedding"))
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

  /** Lift `vec` (dIn dims) to a HIGHER dimensionality via a deterministic
    * ±1 random projection — the complement of [[jlProject]] for
    * SYNTHESIZING corpora at a second shape: a wide random sign matrix
    * embeds the base neighborhoods near-isometrically into dOut dims, so
    * recall measured on the lifted corpus exercises the serving artifacts
    * at a dimensionality the source table doesn't have while keeping a
    * meaningful (structured, not uniform-random) distance geometry.
    * Output: (vec_id long, embedding array<float> L2-normalized).
    *
    * The nested fold is interpreted (higher-order functions), which is
    * fine at its intended altitude: the lift runs ONCE over the small
    * base corpus BEFORE [[replicatePerturbed]] fans it out — the replicas
    * inherit lifted rows through the row-pure codegen path.
    */
  def jlLift(df: DataFrame, id: Column, vec: Column,
      dIn: Int, dOut: Int, salt: String = "graft-jl-lift"): DataFrame = {
    require(dIn > 0 && dOut >= dIn, s"lift must not reduce (got $dIn -> $dOut)")
    val spark = df.sparkSession
    // The sign matrix is computed ONCE on the driver by replaying Spark's
    // own XXH64 chain for `xxhash64(i: int, j: int, salt: string)` (seed
    // 42, child-by-child reseeding — bit-identical parities, pinned by
    // EmbeddingsSpec), then BROADCAST so tasks don't each ship a dOut×dIn
    // closure copy. The previous inline HOF form evaluated dOut·dIn
    // interpreted expressions PER ROW — ~100k at 1536-d, measured at
    // minutes/row on the recall harness (the interpreted-HOF trap: janino
    // gives up far below this size, so nothing ever compiled) — vs
    // dOut·dIn multiply-adds (~0.1 ms/row) with the matrix hoisted.
    val saltU8 = org.apache.spark.unsafe.types.UTF8String.fromString(salt)
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val signs: Array[Array[Double]] = Array.tabulate(dOut, dIn) { (j, i) =>
      var h = XXH64.hashInt(i, 42L)
      h = XXH64.hashInt(j, h)
      h = XXH64.hashUTF8String(saltU8, h)
      if (((h % 2L) + 2L) % 2L == 0L) 1.0 else -1.0
    }
    val bcSigns = spark.sparkContext.broadcast(signs)
    // fold order matches the replaced aggregate() exactly (i ascending,
    // double accumulation), so lifted corpora — and every recall number
    // measured on them — are unchanged
    val lift = udf { (v: Seq[Float]) =>
      val m = bcSigns.value
      val y = new Array[Double](dOut)
      var j = 0
      while (j < dOut) {
        val row = m(j)
        var acc = 0.0
        var i = 0
        while (i < dIn) { acc += v(i).toDouble * row(i); i += 1 }
        y(j) = acc
        j += 1
      }
      var n = 0.0
      var t = 0
      while (t < dOut) { n += y(t) * y(t); t += 1 }
      val nn = math.sqrt(n)
      val out = new Array[Float](dOut)
      t = 0
      while (t < dOut) { out(t) = (y(t) / nn).toFloat; t += 1 }
      out
    }
    df.filter(vec.isNotNull && size(vec) >= dIn)
      .select(id.cast("long").as("vec_id"), vec.cast("array<float>").as("_v"))
      .select(col("vec_id"), lift(col("_v")).as("embedding"))
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
    // EXACT FIXED-POINT accumulation: every x·x product is quantized to a
    // power-of-2 grid (rint(v·2^m) — scaling by 2^m only shifts the
    // exponent, so the quantization is a pure row property) and summed in
    // LONGS, which are exact and order-free: the fit is bit-identical
    // under any partition layout at one-scan cost. Rejected shapes:
    // a d²-literal array() per row (planning exhausts the heap), a
    // posexplode self-join (n·d shuffled twice, 8s at sf0.1), a decimal
    // groupBy over flatMapped pairs (10M decimal casts, 7s). This runs
    // the same corpus in well under a second; the shuffle is one
    // d(d+1)/2-long array per partition.
    val base = df.filter(vec.isNotNull && size(vec) >= dIn)
      .select(slice(vec.cast("array<double>"), 1, dIn).as("_v"))
      .as[Seq[Double]]
    val n = base.count()
    require(n >= 2, s"need at least 2 rows to fit PCA (got $n)")
    // |x| bound scales the grid so cell sums cannot overflow 2^62
    val absBound = 1e4
    val m = math.min(40,
      math.floor(math.log((math.pow(2, 62)) / (n.toDouble * absBound * absBound)) / math.log(2)).toInt)
    require(m >= 10,
      s"corpus too large for exact fixed-point covariance at |x|≤$absBound " +
        s"(n=$n) — fit on a Sampling slice instead")
    val q = math.pow(2, m)
    val nPairs = dIn * (dIn + 1) / 2
    val partials = base.mapPartitions { rows =>
      val prod = new Array[Long](nPairs)
      val dims = new Array[Long](dIn)
      var cnt = 0L
      rows.foreach { v =>
        val a = v.toArray
        var i = 0; var c = 0
        while (i < dIn) {
          val xi = a(i)
          require(math.abs(xi) <= absBound, s"|value| $xi exceeds fit bound $absBound")
          dims(i) += math.rint(xi * q).toLong
          var j = i
          while (j < dIn) { prod(c) += math.rint(xi * a(j) * q).toLong; j += 1; c += 1 }
          i += 1
        }
        cnt += 1
      }
      Iterator.single((prod, dims, cnt))
    }.collect()
    val prodSum = new Array[Long](nPairs)
    val dimSum = new Array[Long](dIn)
    partials.foreach { case (p, ds, _) =>
      var i = 0
      while (i < nPairs) { prodSum(i) += p(i); i += 1 }
      var k = 0
      while (k < dIn) { dimSum(k) += ds(k); k += 1 }
    }
    val nD = n.toDouble
    val mean = Array.tabulate(dIn)(i => dimSum(i) / q / nD)
    val cellIdx = Array.tabulate(dIn, dIn) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      // cell index of (a,b) in the row-major upper triangle
      a * dIn - a * (a - 1) / 2 + (b - a)
    }
    val cov = Array.tabulate(dIn, dIn) { (i, j) =>
      prodSum(cellIdx(i)(j)) / q / nD - mean(i) * mean(j)
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
          // sign(0) must be +1 here, NOT 0: equal diagonal entries give
          // θ = 0 and the correct rotation is the full 45° (t = 1);
          // math.signum would zero the rotation and the off-diagonal
          // element would never be annihilated (caught by the property
          // layer on [[5, ε], [ε, 5]])
          val sg = if (theta >= 0.0) 1.0 else -1.0
          val t = sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
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
