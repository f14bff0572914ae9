package graft.ops

import graft.SparkSpec

/** Pins the content-defined chunker: gear constants against an
  * INDEPENDENT splitmix64 (BigInt mod-2^64 arithmetic, no Long
  * wrapping shared with the implementation), structural chunk
  * invariants, and the property CDC exists for — boundary
  * resynchronization after an insertion. */
class CdcSpec extends SparkSpec {

  /** Reference splitmix64 on BigInt — same published constants, all
    * arithmetic explicitly mod 2^64 (the impl relies on Long wrap). */
  private def refSplitmix64(seed: Long): Long = {
    val M = BigInt(1) << 64
    def trunc(x: BigInt): BigInt = x.mod(M)
    def xshift(x: BigInt, n: Int): BigInt = trunc(x ^ (x >> n))
    var z = trunc(BigInt(seed) + BigInt("9E3779B97F4A7C15", 16))
    z = trunc(xshift(z, 30) * BigInt("BF58476D1CE4E5B9", 16))
    z = trunc(xshift(z, 27) * BigInt("94D049BB133111EB", 16))
    xshift(z, 31).toLong
  }

  test("gear constants match the independent splitmix64 reference") {
    for (i <- 0 until 256) {
      val expected = refSplitmix64(0x67726166L + i) & 0x7FFFFFFFL
      assert(Cdc.Gear(i) === expected, s"gear[$i]")
      assert(Cdc.Gear(i) >= 0 && Cdc.Gear(i) < (1L << 31))
    }
  }

  private def bytesOf(n: Int, seed: Long): Array[Byte] =
    Array.tabulate(n)(i => Cdc.splitmix64(seed + i).toByte)

  test("chunks cover the input exactly with min/max bounds respected") {
    for (n <- Seq(0, 1, 31, 32, 33, 500, 511, 512, 513, 5000)) {
      val b = bytesOf(n, 42L)
      val cs = Cdc.chunks(b)
      if (n == 0) assert(cs.isEmpty)
      else {
        // complete, gapless, in-order coverage
        assert(cs.head._1 === 0)
        assert(cs.map { case (s, l) => (s, s + l) }
          .sliding(2).filter(_.size == 2)
          .forall { case Seq((_, e1), (s2, _)) => e1 == s2 })
        assert(cs.last._1 + cs.last._2 === n, s"n=$n")
        // every chunk <= Max; every non-final chunk >= Min
        assert(cs.forall(_._2 <= Cdc.Max), s"n=$n max")
        assert(cs.init.forall(_._2 >= Cdc.Min), s"n=$n min")
      }
    }
  }

  test("boundary resynchronization: a prefix insertion relocates only a prefix of chunks") {
    val b = bytesOf(8192, 7L)
    val shifted = bytesOf(13, 99L) ++ b
    def digests(x: Array[Byte]) = Cdc.chunks(x).map { case (s, l) =>
      x.slice(s, s + l).toSeq
    }.toSet
    val a = digests(b)
    val c = digests(shifted)
    // content-defined boundaries resync after the first common cut:
    // most chunks survive a 13-byte prefix insertion byte-identically.
    // A fixed-size blocker would share ~none.
    val common = a.intersect(c).size
    assert(common >= a.size / 2,
      s"only $common of ${a.size} chunks survived the shift")
  }

  test("chunk table on the fixture matches a direct driver-side rechunk") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val fromTable = Cdc.chunkTable(spark, dir)
      .orderBy("doc_id", "idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val direct = docs.flatMap { case (id, text) =>
      Cdc.chunks(text.getBytes("UTF-8")).zipWithIndex.map {
        case ((s, l), i) => (id, i, s, l)
      }
    }
    assert(fromTable.toSeq === direct.toSeq)
  }
}
