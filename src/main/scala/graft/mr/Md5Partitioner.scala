package graft.mr

import org.apache.spark.Partitioner

/** MD5-mod shuffle placement, matching the reference's partition function
  * `int(md5(key.encode()).hexdigest(), 16) % num_partitions`
  * (reference map_reduce/mapreduce/worker/__main__.py:117-121).
  *
  * Spark's default [[org.apache.spark.HashPartitioner]] gives the same
  * *semantics* (equal keys co-located); this partitioner additionally gives
  * the same *placement* as the reference, so part-file contents match
  * byte-for-byte. Keys are the (tabKey, wholeLine) pairs produced by
  * [[MapReduceJob]]; only the tab key feeds the hash, exactly as the
  * reference hashes `line.split("\t")[0]`.
  */
class Md5Partitioner(override val numPartitions: Int) extends Partitioner {
  require(numPartitions > 0, s"numPartitions must be positive: $numPartitions")

  override def getPartition(key: Any): Int = key match {
    case (tabKey: String, _) => Md5Partitioner.partition(tabKey, numPartitions)
    case k => Md5Partitioner.partition(String.valueOf(k), numPartitions)
  }

  override def equals(other: Any): Boolean = other match {
    case p: Md5Partitioner => p.numPartitions == numPartitions
    case _ => false
  }
  override def hashCode: Int = numPartitions
}

object Md5Partitioner {
  /** int(md5(utf8(key)).hexdigest(), 16) % n — BigInt(1, digest) treats the
    * 16 digest bytes as the same unsigned 128-bit integer Python builds
    * from the hex string. */
  def partition(key: String, n: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    BigInt(1, digest).mod(BigInt(n)).toInt
  }
}
