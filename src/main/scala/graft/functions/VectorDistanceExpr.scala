package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import graft.model.IndexKind.Metric

/** Native Catalyst expression for the six distance kernels — the hot loop
  * of every `near` / kNN-join, so it participates in whole-stage codegen:
  * a tight primitive float loop per row, no boxing, no lambda dispatch
  * (the higher-order-function formulation via zip_with/aggregate falls out
  * of codegen and allocates per element).
  *
  * Semantics identical to [[Distances]] / the reference kernels
  * (reference distance/distance.go:14–67): accumulate in double, lower is
  * closer, hamming/jaccard binarize both sides at 0.5
  * (vectorstore.go:56–67), haversine takes [lat,lon] degrees.
  *
  * Null elements inside vectors are not expected (schema-coerced float
  * arrays); a null array yields null via nullSafeEval.
  */
case class VectorDistance(left: Expression, right: Expression, metric: Metric)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = s"vector_distance_${metric.name}"

  /** SQL array literals are array<double>; without the declared input
    * types the analyzer would hand this kernel 8-byte elements that
    * `getFloat` misreads with a 4-byte stride — coerce (or reject) at
    * analysis instead.
    */
  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDistance =
    copy(left = l, right = r)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    metric match {
      case Metric.Euclidean =>
        var acc = 0.0; var i = 0
        while (i < n) { val d = x.getFloat(i).toDouble - y.getFloat(i); acc += d * d; i += 1 }
        acc
      case Metric.Dot =>
        var acc = 0.0; var i = 0
        while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
        -acc
      case Metric.Cosine =>
        var acc = 0.0; var i = 0
        while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
        1.0 - acc
      case Metric.Haversine =>
        VectorDistance.haversineDegrees(x.getFloat(0), x.getFloat(1), y.getFloat(0), y.getFloat(1))
      case Metric.Hamming =>
        var acc = 0.0; var i = 0
        while (i < n) {
          if ((x.getFloat(i) > 0.5f) != (y.getFloat(i) > 0.5f)) acc += 1.0
          i += 1
        }
        acc
      case Metric.Jaccard =>
        var inter = 0.0; var union = 0.0; var i = 0
        while (i < n) {
          val xa = x.getFloat(i) > 0.5f; val ya = y.getFloat(i) > 0.5f
          if (xa && ya) inter += 1.0
          if (xa || ya) union += 1.0
          i += 1
        }
        if (union == 0.0) 0.0 else 1.0 - inter / union
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val res = ev.value
      val header = s"int $n = java.lang.Math.min($a.numElements(), $b.numElements());"
      metric match {
        case Metric.Euclidean =>
          s"""$header
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
             |  $acc += d * d;
             |}
             |$res = $acc;""".stripMargin
        case Metric.Dot =>
          s"""$header
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
             |}
             |$res = -$acc;""".stripMargin
        case Metric.Cosine =>
          s"""$header
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
             |}
             |$res = 1.0 - $acc;""".stripMargin
        case Metric.Haversine =>
          val cls = VectorDistance.getClass.getName.stripSuffix("$") + "$"
          s"""$res = $cls.MODULE$$.haversineDegrees(
             |  $a.getFloat(0), $a.getFloat(1), $b.getFloat(0), $b.getFloat(1));""".stripMargin
        case Metric.Hamming =>
          s"""$header
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  if (($a.getFloat($i) > 0.5f) != ($b.getFloat($i) > 0.5f)) $acc += 1.0;
             |}
             |$res = $acc;""".stripMargin
        case Metric.Jaccard =>
          val inter = ctx.freshName("inter")
          s"""$header
             |double $inter = 0.0;
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  boolean xa = $a.getFloat($i) > 0.5f;
             |  boolean ya = $b.getFloat($i) > 0.5f;
             |  if (xa && ya) $inter += 1.0;
             |  if (xa || ya) $acc += 1.0;
             |}
             |$res = ($acc == 0.0) ? 0.0 : 1.0 - $inter / $acc;""".stripMargin
      }
    })
}

object VectorDistance {

  /** The same six kernels over plain float arrays — for driver-side and
    * UDF-side consumers (graph prune, beam search, recall evaluation)
    * that must stay COMMENSURABLE with the codegen column kernel (a
    * divergent copy would e.g. prune a haversine graph against meters
    * with squared degrees). Three formulations of each kernel live in
    * this file on purpose — interpreted eval, codegen string, scalar —
    * so any semantic change is edited in one place.
    */
  def scalarDistance(metric: Metric, a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    metric match {
      case Metric.Cosine | Metric.Dot =>
        var acc = 0.0; var i = 0
        while (i < n) { acc += a(i).toDouble * b(i); i += 1 }
        if (metric == Metric.Dot) -acc else 1.0 - acc
      case Metric.Hamming =>
        var acc = 0.0; var i = 0
        while (i < n) { if ((a(i) > 0.5f) != (b(i) > 0.5f)) acc += 1.0; i += 1 }
        acc
      case Metric.Jaccard =>
        var inter = 0.0; var union = 0.0; var i = 0
        while (i < n) {
          val xa = a(i) > 0.5f; val ya = b(i) > 0.5f
          if (xa && ya) inter += 1.0
          if (xa || ya) union += 1.0
          i += 1
        }
        if (union == 0.0) 0.0 else 1.0 - inter / union
      case Metric.Haversine =>
        haversineDegrees(a(0), a(1), b(0), b(1))
      case _ => // euclidean (squared)
        var acc = 0.0; var i = 0
        while (i < n) { val d = a(i).toDouble - b(i); acc += d * d; i += 1 }
        acc
    }
  }

  /** Called from generated code for the haversine kernel. */
  def haversineDegrees(lat1: Float, lon1: Float, lat2: Float, lon2: Float): Double = {
    val rLat1 = math.toRadians(lat1.toDouble)
    val rLat2 = math.toRadians(lat2.toDouble)
    val dLat = rLat2 - rLat1
    val dLon = math.toRadians(lon2.toDouble) - math.toRadians(lon1.toDouble)
    val h = math.pow(math.sin(dLat / 2), 2) +
      math.cos(rLat1) * math.cos(rLat2) * math.pow(math.sin(dLon / 2), 2)
    2.0 * 6371000.0 * math.asin(math.sqrt(h))
  }

  /** Column-API entry point; inputs are cast to array<float> so literal
    * double arrays and float columns both work.
    */
  def apply(a: Column, b: Column, metric: Metric): Column = {
    val af = ArrayType(FloatType)
    Bridge.toColumn(VectorDistance(
      Bridge.toExpression(a.cast(af)), Bridge.toExpression(b.cast(af)), metric))
  }
}
