package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bit-packing + packed-word distance kernels for the binary quantizer
  * (reference shard/vectorstore/binary.go:103–140): bit i of the packed
  * little-endian long words is set when `vector(i) > threshold(i)`;
  * distances are popcount arithmetic over the words, 64 dimensions per
  * CPU word — the Spark analogue of the reference's uint64 layout.
  */
case class PackBits(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // left: array<float> vector, right: array<double> per-dimension thresholds
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pack_bits"

  // analyzer-level coercion so SQL double-array literals can't reach
  // getFloat/getDouble with the wrong element stride
  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PackBits =
    copy(left = l, right = r)

  override def nullSafeEval(v: Any, t: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val th = t.asInstanceOf[ArrayData]
    val n = vec.numElements()
    // a vector longer than the thresholds would otherwise read PAST the
    // thresholds array: garbage doubles under UnsafeArrayData — silently
    // wrong sign bits — and AIOOBE under GenericArrayData
    PackBits.requireCovered(n, th.numElements())
    val words = new Array[Long]((n + 63) / 64)
    var i = 0
    while (i < n) {
      // getFloat/getDouble read a null element as 0.0 — a silently wrong
      // sign bit; fail loud like the length guards
      if (vec.isNullAt(i) || th.isNullAt(i)) PackBits.nullElement(prettyName)
      if (vec.getFloat(i).toDouble > th.getDouble(i)) words(i / 64) |= 1L << (i % 64)
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, t) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val words = ctx.freshName("words")
      val cls = PackBits.getClass.getName.stripSuffix("$") + "$"
      s"""int $n = $v.numElements();
         |$cls.MODULE$$.requireCovered($n, $t.numElements());
         |long[] $words = new long[($n + 63) / 64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i) || $t.isNullAt($i)) {
         |    $cls.MODULE$$.nullElement("pack_bits");
         |  }
         |  if ((double) $v.getFloat($i) > $t.getDouble($i)) {
         |    $words[$i / 64] |= 1L << ($i % 64);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
         |""".stripMargin
    })
}

/** Hamming (or, with `jaccard = true`, Jaccard) distance over packed long
  * words via popcount — 64 dimensions per instruction.
  */
case class PackedBitDistance(left: Expression, right: Expression, jaccard: Boolean)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = DoubleType
  override def prettyName: String =
    if (jaccard) "packed_jaccard" else "packed_hamming"

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PackedBitDistance =
    copy(left = l, right = r)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // a min-length truncation would UNDERESTIMATE the distance of a
    // malformed (short) packed vector and let it falsely win top-k
    PackBits.requireSameWords(x.numElements(), y.numElements())
    val n = x.numElements()
    if (jaccard) {
      var inter = 0L; var union = 0L; var i = 0
      while (i < n) {
        // a null word reads as 0L — an underestimated distance that can
        // falsely win top-k; fail loud like the word-count guard
        if (x.isNullAt(i) || y.isNullAt(i)) PackBits.nullElement(prettyName)
        val xa = x.getLong(i); val ya = y.getLong(i)
        inter += java.lang.Long.bitCount(xa & ya)
        union += java.lang.Long.bitCount(xa | ya)
        i += 1
      }
      if (union == 0L) 0.0 else 1.0 - inter.toDouble / union
    } else {
      var acc = 0L; var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) PackBits.nullElement(prettyName)
        acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
        i += 1
      }
      acc.toDouble
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cls = PackBits.getClass.getName.stripSuffix("$") + "$"
      val guard = s"$cls.MODULE$$.requireSameWords($a.numElements(), $b.numElements());"
      val nullGuard =
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |    $cls.MODULE$$.nullElement("$prettyName");
           |  }""".stripMargin
      if (jaccard) {
        val inter = ctx.freshName("inter")
        val union = ctx.freshName("union")
        s"""$guard
           |int $n = $a.numElements();
           |long $inter = 0L; long $union = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $nullGuard
           |  long xa = $a.getLong($i); long ya = $b.getLong($i);
           |  $inter += java.lang.Long.bitCount(xa & ya);
           |  $union += java.lang.Long.bitCount(xa | ya);
           |}
           |${ev.value} = ($union == 0L) ? 0.0 : 1.0 - (double) $inter / $union;
           |""".stripMargin
      } else {
        val acc = ctx.freshName("acc")
        s"""$guard
           |int $n = $a.numElements();
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $nullGuard
           |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
           |}
           |${ev.value} = (double) $acc;
           |""".stripMargin
      }
    })
}

object PackBits {
  /** Shared by interpreted eval and generated code. */
  def requireCovered(vecLen: Int, thLen: Int): Unit =
    if (vecLen > thLen)
      throw new IllegalArgumentException(
        s"vector has $vecLen dims; thresholds cover only $thLen")

  def requireSameWords(a: Int, b: Int): Unit =
    if (a != b)
      throw new IllegalArgumentException(
        s"packed vectors differ in word count ($a vs $b) — dimension mismatch")

  def nullElement(op: String): Unit =
    throw new IllegalArgumentException(
      s"$op: null array element (a null packs/reads as 0 — silently wrong bits)")
}

object PackedOps {
  def packBits(vec: Column, thresholds: Column): Column =
    Bridge.toColumn(PackBits(
      Bridge.toExpression(vec.cast(ArrayType(FloatType))),
      Bridge.toExpression(thresholds.cast(ArrayType(DoubleType)))))

  def packedHamming(a: Column, b: Column): Column =
    Bridge.toColumn(PackedBitDistance(
      Bridge.toExpression(a), Bridge.toExpression(b), jaccard = false))

  def packedJaccard(a: Column, b: Column): Column =
    Bridge.toColumn(PackedBitDistance(
      Bridge.toExpression(a), Bridge.toExpression(b), jaccard = true))
}
