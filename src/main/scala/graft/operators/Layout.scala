package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-column data-layout
  * answer to "range filters on EITHER column should prune file chunks".
  * A sort on (a, b) gives perfect a-locality and none on b; interleaving
  * the BITS of quantized column ranks gives both columns ~√chunk locality
  * simultaneously, which is why every lakehouse layout engine (Delta
  * OPTIMIZE ZORDER, Hudi/Iceberg clustering) writes heavily-filtered
  * tables in this order: parquet row-group min/max stats then prune on
  * every z-ordered dimension, not just the leading sort key.
  *
  * Mechanics: each column is affinely quantized to `bits`-bit integer
  * rank space by its OWN global (min, max) — one tiny 2-value-per-column
  * aggregate, the only pre-pass — then ranks are bit-interleaved
  * (column i contributes bit b to z-bit `b·ncols + i`) into one long.
  * Everything after the min/max pre-pass is a pure per-row Column
  * expression inside whole-stage codegen; the z column then feeds an
  * ordinary `repartitionByRange`/`sortWithinPartitions` write. The
  * quantile-free affine quantization is deliberate: it is replayable by
  * any engine from the same (min, max) pair — the gate's DuckDB oracle
  * computes the identical IEEE-double formula — where rank-based
  * (ntile) quantization would drag a full sort into the pre-pass.
  *
  * Skewed domains: affine ranks degrade under heavy skew (most rows land
  * in few cells); pass pre-transformed columns (log, clamp) for those —
  * the operator composes with any per-row transform.
  */
object Layout {

  /** Max bits·ncols is 63 (z stays a positive long). */
  def zvalue(quantized: Seq[Column], bits: Int): Column = {
    require(quantized.nonEmpty, "need at least one column")
    require(bits > 0 && bits * quantized.size <= 63,
      s"bits*ncols must fit a positive long (got $bits × ${quantized.size})")
    val n = quantized.size
    val terms = for {
      b <- 0 until bits
      (q, i) <- quantized.zipWithIndex
    } yield shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The affine `bits`-bit quantizer for value `v` over [lo, hi] —
    * clamped, degenerate (lo == hi) domains collapse to rank 0. The
    * expression is pure IEEE double arithmetic in a fixed shape so any
    * engine reproduces it bit-for-bit from the same bounds.
    */
  def quantize(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    val top = (1L << bits) - 1
    // ANSI mode makes x/0 an ERROR, not inf — the degenerate domain must
    // short-circuit before the division, not rely on the clamp
    val q = when(hi <= lo, lit(0.0))
      .otherwise(floor((v.cast("double") - lo) * lit(top.toDouble) / (hi - lo)))
    least(greatest(coalesce(q, lit(0.0)), lit(0.0)), lit(top.toDouble)).cast("long")
  }

  /** Append a `z` column: the Morton code of `cols` quantized to `bits`
    * bits each by their global min/max (computed here — one scalar agg).
    * Sort/range-partition by `z` before writing to get the clustered
    * layout. Null values rank 0 (they cluster together at the origin).
    */
  def zorder(df: DataFrame, cols: Seq[Column], bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "need at least one z-order column")
    require(bits * cols.size <= 63,
      s"bits*ncols must fit a positive long (got $bits × ${cols.size})")
    cols.foreach { c =>
      val dt = df.select(c).schema.head.dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"z-order column must be numeric (got $dt)")
    }
    // one 2·ncols-value row — bounded whatever the corpus size
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c.cast("double")).as(s"_lo$i"), max(c.cast("double")).as(s"_hi$i"))
    }
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    val qs = cols.zipWithIndex.map { case (c, i) =>
      // all-null column (or empty frame) → degenerate [0,0] domain,
      // every rank collapses to 0 rather than NPE-ing on the unboxing
      def bound(name: String): Double =
        Option(mm.getAs[java.lang.Double](name)).map(_.doubleValue).getOrElse(0.0)
      quantize(c, lit(bound(s"_lo$i")), lit(bound(s"_hi$i")), bits)
    }
    df.withColumn("z", zvalue(qs, bits))
  }

  /** Write `df` z-clustered on `cols`: range-partition by the Morton code
    * into `numFiles` contiguous z-ranges, sort within each, drop the
    * scratch column, write parquet. Every output file then covers a
    * compact z-range — a ~square region of the quantized space — so its
    * per-column min/max footer stats are tight on EVERY clustered
    * dimension and a reader's range filter on any of them skips most
    * files (LayoutSpec measures the span shrink vs a single-column sort).
    */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[Column],
      numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles > 0, s"numFiles must be positive (got $numFiles)")
    zorder(df, cols, bits)
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(path)
  }
}
