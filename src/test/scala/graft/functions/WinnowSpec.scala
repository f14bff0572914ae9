package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

/** Pins the winnowing kernel against an independent reference
  * implementation (direct per-position polynomial hashes + brute-force
  * rightmost-min-per-window selection) and the SIGMOD'03 guarantee. */
class WinnowSpec extends SparkSpec {

  private val B = 1000003L

  /** Reference: no rolling update, no amortized rescan — each k-gram
    * hash evaluated directly, each window scanned in full. */
  private def reference(s: String, k: Int, w: Int): Seq[Long] = {
    val n = s.length
    if (n < k) return Seq.empty
    val hs = (0 to n - k).map { i =>
      (0 until k).foldLeft(0L)((acc, j) => acc * B + s.charAt(i + j))
    }
    val m = hs.length
    if (m <= w) {
      val mi = (0 until m).foldLeft(0)((b, x) => if (hs(x) <= hs(b)) x else b)
      return Seq(hs(mi))
    }
    val out = Seq.newBuilder[Long]
    var prev = -1
    for (start <- 0 to m - w) {
      val mi = (start until start + w)
        .foldLeft(start)((b, x) => if (hs(x) <= hs(b)) x else b)
      if (mi != prev) { out += hs(mi); prev = mi }
    }
    out.result()
  }

  private def kernel(s: String, k: Int, w: Int): Seq[Long] =
    Winnow.fingerprints(UTF8String.fromString(s), k, w).toLongArray().toSeq

  test("kernel equals the reference on random strings (small alphabet forces ties)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(120)
      val s = (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val k = 2 + rnd.nextInt(4)
      val w = 1 + rnd.nextInt(6)
      assert(kernel(s, k, w) == reference(s, k, w),
        s"mismatch for k=$k w=$w s=$s")
    }
  }

  test("edges: short text, exact-k text, single window") {
    assert(kernel("ab", 3, 4).isEmpty)
    assert(kernel("abc", 3, 4).length === 1)
    // m <= w: exactly one fingerprint, the global min
    val s = "abcabcabc"
    val all = (0 to s.length - 4).map(i =>
      (0 until 4).foldLeft(0L)((acc, j) => acc * B + s.charAt(i + j)))
    assert(kernel(s, 4, 10) == Seq(all.min))
  }

  test("guarantee: a shared run of k + w - 1 chars yields a shared fingerprint") {
    val rnd = new scala.util.Random(7)
    val (k, w) = (5, 4)
    for (_ <- 1 to 100) {
      val common = (0 until k + w - 1)
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      def pad(len: Int) =
        (0 until len).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
      val d1 = pad(rnd.nextInt(40)) + common + pad(rnd.nextInt(40))
      val d2 = pad(rnd.nextInt(40)) + common + pad(rnd.nextInt(40))
      val shared = kernel(d1, k, w).toSet intersect kernel(d2, k, w).toSet
      assert(shared.nonEmpty, s"no shared fingerprint: $d1 / $d2")
    }
  }

  test("positions variant: same selections as fingerprints, valid offsets, exact hashes") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(120)
      val s = (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val k = 2 + rnd.nextInt(4)
      val w = 1 + rnd.nextInt(6)
      val pos = Winnow.fingerprintPositions(UTF8String.fromString(s), k, w)
      val rows = (0 until pos.numElements()).map { i =>
        val r = pos.getStruct(i, 2)
        (r.getLong(0), r.getInt(1))
      }
      // projecting fp reproduces the fingerprint sequence exactly
      assert(rows.map(_._1) == kernel(s, k, w), s"k=$k w=$w s=$s")
      rows.foreach { case (fp, p) =>
        assert(p >= 0 && p <= s.length - k)
        // the recorded hash IS the k-gram hash at the recorded offset
        val direct = (0 until k).foldLeft(0L)((acc, j) => acc * B + s.charAt(p + j))
        assert(fp == direct, s"hash/pos mismatch at $p for k=$k w=$w s=$s")
      }
      // selection offsets are strictly increasing (distinct rows)
      assert(rows.map(_._2) == rows.map(_._2).sorted.distinct)
    }
  }

  test("positions expression: codegen path equals the interpreted kernel") {
    import spark.implicits._
    val s = "the quick brown fox jumps over the lazy dog"
    val df = Seq(s).toDF("text")
    val got = df.select(explode(Winnow.winnowPos(col("text"), 4, 3)).as("s"))
      .select(col("s.fp"), col("s.pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val want = {
      val pos = Winnow.fingerprintPositions(UTF8String.fromString(s), 4, 3)
      (0 until pos.numElements()).map { i =>
        val r = pos.getStruct(i, 2); (r.getLong(0), r.getInt(1))
      }
    }
    assert(got == want)
  }

  test("expression integration: codegen path equals the kernel, null-safe") {
    import spark.implicits._
    val df = Seq(Some("the quick brown fox jumps over the lazy dog"),
      Some("xy"), None).toDF("text")
    val got = df.select(Winnow.winnow(col("text"), 4, 3).as("fp"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0))
    assert(got(0) == kernel("the quick brown fox jumps over the lazy dog", 4, 3))
    assert(got(1) == Seq.empty)
    assert(got(2) == null)
  }

  test("q_substring_dedup: interval merge == brute-force char-set union of the chains") {
    val dir = sf("sf0.001")
    // brute force: for each excised doc, the union of its b-side chain
    // char extents as an explicit position set (k = 12 at default knobs)
    val chains = graft.ops.TextOps.qWinnowChains(spark, dir).collect()
    val want = chains.groupBy(_.getLong(1)).map { case (doc, rs) =>
      val chars = rs.flatMap(r =>
        r.getInt(6) to (r.getInt(7) + 11)).toSet
      // maximal runs in the set = merged block count
      val blocks = chars.toSeq.sorted.foldLeft(0 -> Int.MinValue) {
        case ((n, prev), p) => (if (p == prev + 1) n else n + 1, p)
      }._1
      doc -> ((blocks, chars.size.toLong))
    }
    val got = graft.ops.TextOps.qSubstringDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got === want)
    assert(got.nonEmpty, "fixture must exercise excision")
  }
}
