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

object Winnow {
  /** Karp-Rabin base (prime); hashes wrap in 64-bit two's complement —
    * collisions only ADD near-dup candidates, exact verification or a
    * shared-count threshold filters them (same stance as the xxhash64
    * prefix keys in [[graft.ops.Similarity]]). */
  private val B = 1000003L

  /** The kernel — shared verbatim by interpreted eval and codegen. */
  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
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
    if (m <= w) { // degenerate single window: global rightmost min
      var minIdx = 0
      var x = 1
      while (x < m) { if (hashes(x) <= hashes(minIdx)) minIdx = x; x += 1 }
      return new GenericArrayData(Array(hashes(minIdx)))
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long](2 * m / (w + 1) + 4)
    var minIdx = -1
    var start = 0
    while (start + w <= m) {
      val end = start + w - 1
      if (minIdx < start) {
        // previous minimum slid out of the window: rescan, rightmost wins
        minIdx = start
        var x = start + 1
        while (x <= end) { if (hashes(x) <= hashes(minIdx)) minIdx = x; x += 1 }
        out += hashes(minIdx)
      } else if (hashes(end) <= hashes(minIdx)) {
        minIdx = end
        out += hashes(minIdx)
      }
      start += 1
    }
    new GenericArrayData(out.toArray)
  }

  def winnow(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(c), k, w))
}
