package graft.ops

import graft.SparkSpec

/** Layout-level facts of the compaction pass the value gate can't see:
  * the fragmented copy really is fragmented, the compacted copy's file
  * count matches the rows/target bound, and row counts survive. */
class CompactSpec extends SparkSpec {

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length() > 0)

  test("compaction: 64-shard fragmentation collapses to the rows/target bound") {
    val dir = sf("sf0.001")
    val (frag, compact) = Compact.layouts(spark, dir)
    val nFrag = parquetFiles(frag).length
    val nCompact = parquetFiles(compact).length
    assert(nFrag >= 32, s"fragmented copy has only $nFrag files")
    val rows = spark.read.parquet(compact).count()
    val bound = math.max(1, ((rows + 4999) / 5000).toInt)
    assert(nCompact <= bound, s"$nCompact files > bound $bound")
    assert(rows === spark.read.parquet(frag).count())
  }
}
