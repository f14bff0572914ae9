package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Robust winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003 — the MOSS algorithm): rolling Karp-Rabin hashes of all
  * character k-grams, then the RIGHTMOST minimum of every w-hash window,
  * recorded once per selection. Guarantees: any shared substring of
  * length ≥ k + w - 1 between two documents yields at least one shared
  * fingerprint (the detection floor), and fingerprint density is
  * ~2/(w+1) of positions — a LOCAL fingerprint, so partial overlap and
  * containment are detectable, which whole-set shingle Jaccard misses
  * for asymmetric copies.
  *
  * Row-local (no exchange); the per-row kernel is O(n) amortized
  * (occasional O(w) rescans when a minimum slides out). Codegen emits a
  * static call to the same JIT-hot kernel as the interpreted path —
  * stays inside whole-stage codegen like the dot-product expressions. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, s"winnow(k=$k, w=$w): need k >= 2, w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    Winnow.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Winnow.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

/** [[WinnowFingerprints]] with positions: array<struct<fp,pos>> — the
  * input to span-level overlap reports (where in each document the
  * matched fingerprints sit), which the fingerprint-only shape cannot
  * express. Same kernel core, same codegen stance. */
case class WinnowFingerprintPositions(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, s"winnow_pos(k=$k, w=$w): need k >= 2, w >= 1")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fp", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_fingerprint_positions"

  override protected def nullSafeEval(input: Any): Any =
    Winnow.fingerprintPositions(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Winnow.fingerprintPositions($c, $k, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprintPositions = copy(child = newChild)
}

object Winnow {
  /** Karp-Rabin base (prime); hashes wrap in 64-bit two's complement —
    * collisions only ADD near-dup candidates, exact verification or a
    * shared-count threshold filters them (same stance as the xxhash64
    * prefix keys in [[graft.ops.Similarity]]). */
  private val B = 1000003L

  /** Rolling k-gram hashes of `str` (length must be >= k). */
  private def kgramHashes(str: String, k: Int): Array[Long] = {
    val m = str.length - k + 1
    val hashes = new Array[Long](m)
    var pow = 1L
    var j = 1
    while (j < k) { pow *= B; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + str.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - str.charAt(i - 1) * pow) * B + str.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    hashes
  }

  /** The selection core, shared by both output shapes: indexes of the
    * rightmost-min-per-window selections, recorded once each (strictly
    * increasing — a rescan after the min slides out can only land at or
    * right of the window start, which is right of the old min). */
  private def selectIdx(hashes: Array[Long], w: Int): Array[Int] = {
    val m = hashes.length
    if (m <= w) { // degenerate single window: global rightmost min
      var minIdx = 0
      var x = 1
      while (x < m) { if (hashes(x) <= hashes(minIdx)) minIdx = x; x += 1 }
      return Array(minIdx)
    }
    val out = new scala.collection.mutable.ArrayBuffer[Int](2 * m / (w + 1) + 4)
    var minIdx = -1
    var start = 0
    while (start + w <= m) {
      val end = start + w - 1
      if (minIdx < start) {
        // previous minimum slid out of the window: rescan, rightmost wins
        minIdx = start
        var x = start + 1
        while (x <= end) { if (hashes(x) <= hashes(minIdx)) minIdx = x; x += 1 }
        out += minIdx
      } else if (hashes(end) <= hashes(minIdx)) {
        minIdx = end
        out += minIdx
      }
      start += 1
    }
    out.toArray
  }

  /** The kernel — shared verbatim by interpreted eval and codegen. */
  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    if (str.length < k) return new GenericArrayData(Array.empty[Long])
    val hashes = kgramHashes(str, k)
    val idx = selectIdx(hashes, w)
    val out = new Array[Long](idx.length)
    var i = 0
    while (i < idx.length) { out(i) = hashes(idx(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Positions variant: array<struct<fp,pos>> where pos is the selected
    * k-gram's character offset — the span-report form (q_winnow_spans
    * aggregates matched-position extents per candidate pair). Same
    * selection as [[fingerprints]] by construction (shared core). */
  def fingerprintPositions(s: UTF8String, k: Int, w: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val str = s.toString
    if (str.length < k) return new GenericArrayData(Array.empty[Any])
    val hashes = kgramHashes(str, k)
    val idx = selectIdx(hashes, w)
    val out = new Array[Any](idx.length)
    var i = 0
    while (i < idx.length) {
      out(i) = new GenericInternalRow(Array[Any](hashes(idx(i)), idx(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  def winnow(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(c), k, w))

  def winnowPos(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(
      WinnowFingerprintPositions(ColumnBridge.expression(c), k, w))
}
