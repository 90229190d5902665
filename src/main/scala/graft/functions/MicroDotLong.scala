package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native integer-micro dot product over two numeric array columns:
  * `Σ_i round(a_i · b_i · 1e12)` as a LONG — the order-independent
  * integer product sum the cross-engine cosine gates rank by (each
  * term quantizes independently, so the sum is exact under any
  * evaluation order, unlike a float dot).
  *
  * Bit-identical to the composed form
  * `aggregate(zip_with(a, b, (x, y) ->
  *    cast(round(x·y·1e12) as long)), 0L, +)`:
  * per-element rounding is the SAME half-up rule Spark's `round`
  * applies to doubles (`BigDecimal.setScale(0, HALF_UP)` — note
  * `Math.round` would differ on negative half-way products), floats
  * widen before multiplying, and null input / length mismatch / null
  * element yield null exactly like [[DotProduct]]. The composed form
  * is interpreter-evaluated (higher-order functions don't codegen)
  * and allocates a products array per row; this is the same tight
  * codegen loop as [[DotProduct]] with a long accumulator. */
case class MicroDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_microdot"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) match {
      case FloatType | DoubleType | IntegerType | LongType |
          ShortType | ByteType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs arrays of numeric elements, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def read(arr: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (av, bv) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = av.numElements()
    if (n != bv.numElements()) null
    else {
      val (lt, rt) = (elemType(left), elemType(right))
      var acc = 0L
      var i = 0
      while (i < n) {
        if (av.isNullAt(i) || bv.isNullAt(i)) return null
        acc = MicroDotLong.addMicro(acc,
          MicroDotLong.roundMicro(read(av, lt, i) * read(bv, rt, i)))
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(v: String, t: DataType, i: String): String = t match {
      case FloatType => s"(double) $v.getFloat($i)"
      case IntegerType => s"(double) $v.getInt($i)"
      case LongType => s"(double) $v.getLong($i)"
      case ShortType => s"(double) $v.getShort($i)"
      case ByteType => s"(double) $v.getByte($i)"
      case _ => s"$v.getDouble($i)"
    }
    val (lt, rt) = (elemType(left), elemType(right))
    val cls = MicroDotLong.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $acc = $cls.addMicro($acc, $cls.roundMicro(
         |      ${getter(a, lt, i)} * ${getter(b, rt, i)}));
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MicroDotLong =
    copy(left = newLeft, right = newRight)
}

object MicroDotLong {
  // 2^63 as a double — the first rounded value the ANSI double→long
  // cast rejects on the high side; −2^63 itself is a valid long
  private val TwoPow63 = 9.223372036854776e18

  /** `cast(round(p * 1e12) as long)` exactly as Spark evaluates it on
    * a double under ANSI: half-up via BigDecimal (not `Math.round`,
    * which floors negative half-way values the other way), then the
    * integral double converts to long.
    *
    * Value domain: the scaled product must be FINITE and the rounded
    * value must fit a long — a NaN/Infinity product or a |p| past
    * ~9.2e6 (micros scale) throws ArithmeticException, mirroring the
    * composed ANSI form's loud cast failure instead of silently
    * wrapping (the [[graft.core.Graphs]] loud-overflow stance). */
  def roundMicro(p: Double): Long = {
    val scaled = p * 1e12
    if (java.lang.Double.isNaN(scaled) ||
        java.lang.Double.isInfinite(scaled))
      throw new ArithmeticException(
        s"graft_microdot: non-finite scaled product $scaled (input " +
          s"product $p) cannot cast to a long micro term — the " +
          "composed ANSI cast(round(x*1e12) as long) fails the same " +
          "way; clean non-finite embedding values upstream")
    val r = java.math.BigDecimal.valueOf(scaled)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    if (r >= TwoPow63 || r < -TwoPow63)
      throw new ArithmeticException(
        s"graft_microdot: rounded micro term $r overflows long — the " +
          "composed ANSI cast throws the same; rescale the embeddings")
    r.toLong
  }

  /** Accumulate a micro term with loud long overflow — the composed
    * ANSI SUM fails loudly on overflow, so the native loop must too
    * (a wrapping `+=` would silently corrupt the rank order). */
  def addMicro(acc: Long, term: Long): Long = Math.addExact(acc, term)
}
