package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Theta sketches (Apache DataSketches) — the mergeable DISTINCT-SET
  * sketch family that, unlike HLL, supports set ALGEBRA: intersection
  * and difference, not just union. The 100 TB cohort-analytics pattern:
  * ingest persists one constant-size sketch per cohort cell, and every
  * overlap question later ("how many high-value purchasers also hit
  * errors?") is answered from the tiny sketch table — no raw re-scan,
  * no distinct-pair join. HLL cannot answer these at all (union-only);
  * exact distinct-intersections need a |users|-scale join per pair.
  *
  * Determinism: a theta sketch's state is the set of retained 64-bit
  * key hashes below theta; updates and unions are order-insensitive
  * (set insertion + min-theta), so estimates are identical under any
  * partitioning or merge tree — the property that lets the driver gate
  * hash-compare them. Below the nominal entry count (lgK=12 → 4096)
  * the sketch retains EVERY hash and estimates are EXACT, so at gate
  * scale the oracle is plain exact SQL set algebra; past 4096 the
  * estimate enters sampling mode with ~1/sqrt(4096) relative error
  * ([[graft.ops.ThetaSpec]] pins that envelope on synthetic data). */
object ThetaSketchAgg {
  /** Aggregate Column: compact theta sketch (binary) of a long key. */
  def thetaSketch(c: Column): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(c)).toAggregateExpression())

  /** Rounded distinct estimate of a sketch column (exact below 4096). */
  def thetaEstimate(c: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(c)))

  /** Rounded estimate of a set operation over two sketch columns;
    * op ∈ intersect | union | anotb. */
  def thetaSetOp(a: Column, b: Column, op: String): Column =
    ColumnBridge.column(
      ThetaSetOpEstimate(ColumnBridge.expression(a),
        ColumnBridge.expression(b), op))

  private[functions] def wrap(bytes: Array[Byte]): Sketch =
    Sketches.wrapSketch(Memory.wrap(bytes))
}

/** Distinct-set theta sketch of a LONG key as a TypedImperativeAggregate:
  * map-side partial sketches union reduce-side — no raw-key shuffle.
  * Buffer is a theta Union (which accepts both raw updates and sketch
  * merges); eval/serialize emit the ordered compact form. */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult)
    b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(ThetaSketchAgg.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Rounded distinct estimate of a compact theta sketch. Interpreted
  * eval only (CodegenFallback): consumers are sketch TABLES — O(cells)
  * rows, never raw data — so codegen would buy nothing. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_estimate"
  override protected def nullSafeEval(v: Any): Any =
    math.round(ThetaSketchAgg.wrap(v.asInstanceOf[Array[Byte]]).getEstimate)
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Rounded estimate of intersect/union/anotb over two compact sketches.
  * Same CodegenFallback rationale as [[ThetaEstimate]]. */
case class ThetaSetOpEstimate(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  require(Seq("intersect", "union", "anotb").contains(op),
    s"unknown theta set op '$op'")
  override def dataType: DataType = LongType
  override def prettyName: String = s"theta_$op"
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = ThetaSketchAgg.wrap(l.asInstanceOf[Array[Byte]])
    val b = ThetaSketchAgg.wrap(r.asInstanceOf[Array[Byte]])
    val est = op match {
      case "intersect" =>
        SetOperation.builder().buildIntersection().intersect(a, b).getEstimate
      case "union" =>
        val u = SetOperation.builder().buildUnion(); u.union(a); u.union(b)
        u.getResult.getEstimate
      case "anotb" =>
        SetOperation.builder().buildANotB().aNotB(a, b).getEstimate
    }
    math.round(est)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetOpEstimate =
    copy(left = newLeft, right = newRight)
}
