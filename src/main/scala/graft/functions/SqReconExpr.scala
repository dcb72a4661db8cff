package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the SQ8 reconstructed-distance fold
  * (ScalarQuantizer.approxDistance / approxDotDistance): one tree node
  * with a primitive loop instead of a dim-term literal chain.
  *
  * The chain formulation (64 × `try_element_at + arithmetic` reduced with
  * `+`) was CORRECT but made every request pay Catalyst, not execution:
  * analyzer/optimizer rule walks over a ~400-node tree per query — and
  * the batched flat scan multiplies that by K — measured ~3.5 s of
  * per-request plan time at bench scale (tools/TimeProbe.scala) against
  * ~0.4 s of execution. One node with embedded (lo, step, query) arrays
  * collapses the tree; the generated code is the same tight loop
  * whole-stage codegen produced for the chain, minus the tree walks.
  *
  * BIT-IDENTICAL arithmetic to the chain it replaces, in IEEE order:
  * `xhat = lo(i) + (double)code(i) * step(i)`; L2 accumulates
  * `(xhat − q(i))²`, dot accumulates `(−q(i)) · xhat`; terms sum
  * left-to-right (the chain's left-assoc reduce). Null semantics replay
  * `try_element_at`: an array shorter than `dim` or a null element nulls
  * the whole result; a null array is null (nullSafeEval). A degenerate
  * dimension (hi ≤ lo) carries step 0 exactly like the chain's guard —
  * the caller builds `step` with that rule. QuantizerSpec pins the
  * equivalence law against the literal chain on random codes (raw-bits
  * comparison, including short/degenerate cases).
  */
case class SqReconDistance(
    child: Expression, query: Array[Double], lo: Array[Double],
    step: Array[Double], negDot: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(query.length == lo.length && lo.length == step.length,
    s"query/lo/step lengths differ: ${query.length}/${lo.length}/${step.length}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (negDot) "sq_recon_dot" else "sq_recon_l2"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(LongType))

  override protected def withNewChildInternal(newChild: Expression): SqReconDistance =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dim = lo.length
    if (x.numElements() < dim) return null
    var acc = 0.0
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      val xhat = lo(i) + x.getLong(i).toDouble * step(i)
      if (negDot) acc += (-query(i)) * xhat
      else { val d = xhat - query(i); acc += d * d }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val dim = lo.length
      val loRef = ctx.addReferenceObj("sqLo", lo, "double[]")
      val stepRef = ctx.addReferenceObj("sqStep", step, "double[]")
      val qRef = ctx.addReferenceObj("sqQuery", query, "double[]")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      val term =
        if (negDot) s"$acc += (-$qRef[$i]) * xhat;"
        else s"double d = xhat - $qRef[$i]; $acc += d * d;"
      s"""boolean $bad = $a.numElements() < $dim;
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { $bad = true; break; }
         |    double xhat = $loRef[$i] + (double) $a.getLong($i) * $stepRef[$i];
         |    $term
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |""".stripMargin
    })
}
