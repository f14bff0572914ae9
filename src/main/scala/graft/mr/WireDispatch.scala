package graft.mr

/** The reference manager's task-partitioning arithmetic, placement-exact
  * (reference map_reduce/mapreduce/manager/__main__.py:440-470) — pulled
  * into a side-effect-free object so task→file assignment parity can be
  * vector-tested the same way Md5Partitioner is.
  *
  * [[inputPartition]] (ref :440-455): sort the LISTING, round-robin deal
  * `input_directory + "/" + file` paths into num_mappers buckets, then —
  * the quirk — `results.sort()` the bucket LIST itself. Python sorts
  * lists lexicographically element-wise with "shorter prefix first", so:
  *   - with more mappers than files, the EMPTY buckets move to the FRONT
  *     of the result: task ids 0..k-1 get no input and the real work
  *     shifts to the tail task ids;
  *   - non-empty buckets never reorder (bucket i leads with sorted
  *     files[i], which ascends with i), so the deal itself is stable.
  *
  * [[inputPartitionReduce]] (ref :457-470): bucket the shared-dir
  * listing by the int of `file.split('-')[-1][4:]` (the `partNNNNN`
  * suffix a map task stamps on its output), then sort each bucket —
  * os.listdir order never leaks into the reduce input order. */
object WireDispatch {

  /** Python's list.sort() ordering over lists of strings: element-wise
    * comparison, a strict prefix sorts first. (String comparison is by
    * UTF-16 code unit here vs code point in Python — identical for the
    * ASCII paths this protocol carries.) */
  private[mr] val pyListOrdering: Ordering[Vector[String]] =
    new Ordering[Vector[String]] {
      def compare(a: Vector[String], b: Vector[String]): Int = {
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) {
          val c = a(i).compareTo(b(i))
          if (c != 0) return c
          i += 1
        }
        a.length - b.length
      }
    }

  /** Map-task input assignment (ref :440-455). Returns
    * `num_mappers` buckets of full input paths; bucket index == task_id. */
  def inputPartition(files: Seq[String], numMappers: Int,
      inputDirectory: String): Vector[Vector[String]] = {
    val sorted = files.sorted
    val results = Array.fill(numMappers)(Vector.empty[String])
    var i = 0
    while (i < sorted.length) { // the reference's pop-from-front deal
      results(i % numMappers) :+= inputDirectory + "/" + sorted(i)
      i += 1
    }
    results.toVector.sorted(pyListOrdering) // ref :454 results.sort()
  }

  /** Reduce-task input assignment (ref :457-470): bucket by the
    * partNNNNN suffix, sort within each bucket. */
  def inputPartitionReduce(files: Seq[String], numPartitions: Int,
      tmpdir: String): Vector[Vector[String]] = {
    val results = Array.fill(numPartitions)(Vector.empty[String])
    for (f <- files) {
      val part = f.split('-').last // "partNNNNN"
      val num = part.substring(4).toInt
      results(num) :+= tmpdir + "/" + f
    }
    results.map(_.sorted).toVector
  }
}
