package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact-decimal dot product of two float arrays as a native Catalyst
  * expression — the hand-optimized twin of [[graft.ops.Vectors.dotD]]'s
  * aggregate/zip_with/decimal pipeline, with identical semantics:
  *
  *   round_to_8( sum_i dec9(a_i) * dec9(b_i) )  as DOUBLE
  *
  * where dec9(x) is the float's double value rounded HALF_UP to 9 decimal
  * places via its shortest decimal string (Spark's float→decimal cast),
  * the sum is exact, and round_to_8 is HALF_UP — so results stay
  * bit-identical to the DuckDB oracle twin (see Vectors.dotSql).
  *
  * Why: the higher-order-function pipeline evaluates interpreted lambdas
  * and allocates a Decimal per element (~0.08 ms/row at dim 64). Here each
  * element becomes a long in 1e-9 units (fast path: scaled binary rounding
  * with a boundary guard; slow path: exact BigDecimal string rounding),
  * products accumulate in a 128-bit two-long accumulator, and ONE
  * BigDecimal materializes per row for the final scale-8 rounding.
  * ~20× faster, same bits.
  */
case class DecimalDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "decimal_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalDotProduct =
    copy(left = newLeft, right = newRight)

  /** Under whole-stage codegen the generated Janino code calls the static
    * per-row kernel [[DecimalDotEval.dot]] — a one-line call keeps the
    * surrounding stage fused (the former CodegenFallback forced the whole
    * projection out of codegen), and the kernel itself is plain JIT-hot
    * JVM code. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DecimalDotEval.dot($a, $b);")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DecimalDotEval.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
}

/** Static home of the [[DecimalDotProduct]] per-row kernel: a TOP-LEVEL
  * object with no companion class, so scalac emits a static forwarder
  * (`DecimalDotEval.dot`) that generated Janino code can call directly —
  * the `DecimalDotProduct` companion gets no forwarders because the case
  * class occupies the class name. */
object DecimalDotEval {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    // 128-bit signed accumulator (hi:lo) of products of 1e-9-scaled longs;
    // total scale is 1e-18, matching DECIMAL(38,18) exact summation
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = DecimalDotProduct.scale9(a.getFloat(i).toDouble)
        val y = DecimalDotProduct.scale9(b.getFloat(i).toDouble)
        val pHi = Math.multiplyHigh(x, y)
        val pLo = x * y
        val sumLo = lo + pLo
        // carry of unsigned 64-bit addition
        val carry = ((lo & pLo) | ((lo | pLo) & ~sumLo)) >>> 63
        hi = hi + pHi + carry
        lo = sumLo
      }
      i += 1
    }
    val unscaled = BigInteger.valueOf(hi).shiftLeft(64)
      .add(new BigInteger(1, longBytes(lo)))
    new JBigDecimal(unscaled, 18)
      .setScale(8, RoundingMode.HALF_UP).doubleValue()
  }

  private def longBytes(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = (v >>> (8 * (7 - i))).toByte; i += 1 }
    out
  }
}

object DecimalDotProduct {

  /** Float's double value rounded HALF_UP at 9 decimal places, as a long
    * in 1e-9 units — exactly Spark's float→DECIMAL(18,9) cast. Fast path:
    * binary scaling + nearest-integer, valid whenever the scaled value is
    * comfortably away from a .5 boundary (the binary product differs from
    * the exact decimal value by ≪ 1e-6 units); otherwise fall back to the
    * authoritative shortest-string BigDecimal rounding. */
  def scale9(d: Double): Long = {
    val scaled = d * 1e9
    val floor = Math.floor(scaled)
    val frac = scaled - floor
    // binary `scaled` can differ from the exact decimal value by up to
    // ~1.5e-6 units (double multiply error at |scaled|~1e10); 1e-4 margin
    if (math.abs(frac - 0.5) > 1e-4) {
      // HALF_UP == away from zero; away from the boundary this is just
      // round-to-nearest
      Math.round(scaled) // half-up toward +inf, but we're not at a half
    } else {
      JBigDecimal.valueOf(d).movePointRight(9)
        .setScale(0, RoundingMode.HALF_UP).longValueExact()
    }
  }

  /** Column API: exact-decimal dot of two array<float> columns. */
  def decimalDot(a: Column, b: Column): Column =
    ColumnBridge.column(DecimalDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
