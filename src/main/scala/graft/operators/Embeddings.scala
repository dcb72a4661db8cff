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
}
