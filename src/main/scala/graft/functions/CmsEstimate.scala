package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency lookup into a serialized Count-Min sketch (the
  * binary produced by Spark's `count_min_sketch` aggregate).
  *
  * Spark ships the CMS BUILD side (a codegen'd algebraic aggregate —
  * map-side partial counter arrays, elementwise-summed on merge, so the
  * sketch is deterministic under any partitioning) but no QUERY side:
  * the estimate never left the driver API. This expression closes that
  * gap so frequency point-queries compose in SQL. CodegenFallback and a
  * per-eval deserialize are deliberate: consumers probe a SKETCH table
  * with a bounded key list (O(types × probes) rows), never raw data —
  * if a hot path ever probed millions of keys, the sketch bytes should
  * be broadcast once and probed via a static-cached kernel instead. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  // declared input types: a non-binary sketch or a non-long key (an INT
  // key column, say) now fails ANALYSIS with a type error instead of a
  // ClassCastException inside an executor at runtime. (checkInputDataTypes
  // rather than ExpectsInputTypes: AbstractDataType is private[sql].)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY sketch, got ${left.dataType.sql}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT key, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override protected def nullSafeEval(sk: Any, key: Any): Any =
    CountMinSketch.readFrom(sk.asInstanceOf[Array[Byte]])
      .estimateCount(key.asInstanceOf[java.lang.Long])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  /** est(sketch, key): upper-biased frequency estimate of `key`. */
  def cmsEstimate(sketch: Column, key: Column): Column =
    ColumnBridge.column(CmsEstimate(ColumnBridge.expression(sketch),
      ColumnBridge.expression(key)))
}
