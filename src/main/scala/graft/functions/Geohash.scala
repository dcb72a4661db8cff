package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Geohash encoding of a `[lat, lon]` degrees vector — the reference's geo
  * story is exactly "haversine metric + geohash-prefix search on string
  * indexes" (reference README.md:25, docs/concepts/indexing.md:144): store
  * the geohash as a string property, then `startsWith` on a prefix is a
  * bounding-box pre-filter and `near` with haversine ranks inside it.
  */
case class GeohashExpr(child: Expression, precision: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  // fail at construction, not per-row inside execution: precision <= 0
  // would throw NegativeArraySizeException from every task (negative) or
  // hash every row to "" (zero — a startsWith("") pre-filter then matches
  // the whole collection)
  require(precision > 0 && precision <= 12,
    s"geohash precision must be in 1..12 (got $precision)")

  // analyzer-side coercion: a double-array child would otherwise be read
  // with a 4-byte stride (same hazard VectorDistance guards against)
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = StringType
  override def prettyName: String = "geohash"

  override protected def withNewChildInternal(c: Expression): GeohashExpr = copy(child = c)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() >= 2, "geohash requires a [lat, lon] vector")
    // ArrayData.getFloat reads a null element as 0.0f — silently hashing
    // a bad row onto the equator/meridian, where every prefix pre-filter
    // then mis-sorts it; fail loud like the short-array case
    require(!arr.isNullAt(0) && !arr.isNullAt(1),
      "geohash requires non-null lat/lon elements")
    UTF8String.fromString(Geohash.encode(arr.getFloat(0), arr.getFloat(1), precision))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""if ($a.numElements() < 2) {
         |  throw new IllegalArgumentException("geohash requires a [lat, lon] vector");
         |}
         |if ($a.isNullAt(0) || $a.isNullAt(1)) {
         |  throw new IllegalArgumentException("geohash requires non-null lat/lon elements");
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.Geohash.encode($a.getFloat(0), $a.getFloat(1), $precision));
         |""".stripMargin)
}

object Geohash {
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash: interleave lon/lat bisection bits, base32-encode. */
  def encode(lat: Double, lon: Double, precision: Int): String = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    val sb = new StringBuilder(precision)
    var bit = 0; var ch = 0; var evenBit = true
    while (sb.length < precision) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid } else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid } else { ch = ch << 1; latHi = mid }
      }
      evenBit = !evenBit
      bit += 1
      if (bit == 5) { sb.append(Base32(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Column API: geohash of a [lat, lon] array<float> column. */
  def apply(latLon: Column, precision: Int): Column =
    Bridge.toColumn(GeohashExpr(
      Bridge.toExpression(latLon.cast(ArrayType(FloatType))), precision))

  /** Bounding box `[latLo, latHi) × [lonLo, lonHi)` of every point whose
    * geohash starts with `prefix` — exact by the bisection construction
    * (`encode` takes the upper half on `>= mid`, so boxes are half-open).
    * This is the AT-SCALE face of prefix search: a range predicate on raw
    * lat/lon columns pushes down to parquet min/max stats and partition
    * pruning, where a string `startsWith` over encoded hashes cannot.
    */
  def bbox(prefix: String): (Double, Double, Double, Double) = {
    require(prefix.nonEmpty, "geohash prefix must be non-empty")
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var evenBit = true
    prefix.foreach { c =>
      val ch = Base32.indexOf(c.toLower)
      require(ch >= 0, s"invalid geohash character '$c'")
      var i = 4
      while (i >= 0) {
        val one = ((ch >> i) & 1) == 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if (one) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (one) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        i -= 1
      }
    }
    // the domain MAXIMA are closed: encode(90, ·) / encode(·, 180) take
    // the upper half at every bisection, so they land in the top cell —
    // a strictly-half-open box would exclude them from their own prefix.
    // Nudging the bound one ulp past the domain max keeps the simple
    // `x < hi` predicate exact (no value lies strictly between).
    val latHiAdj = if (latHi == 90.0) Math.nextUp(90.0) else latHi
    val lonHiAdj = if (lonHi == 180.0) Math.nextUp(180.0) else lonHi
    (latLo, latHiAdj, lonLo, lonHiAdj)
  }
}
