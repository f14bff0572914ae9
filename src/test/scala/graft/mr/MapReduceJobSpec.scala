package graft.mr

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.SparkSpec

class MapReduceJobSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeInput(dir: String, files: Map[String, String]): Unit =
    files.foreach { case (name, content) =>
      Files.writeString(Paths.get(dir, name), content)
    }

  private def readPartFiles(dir: String): Map[String, Seq[String]] =
    Files.list(Paths.get(dir)).iterator.asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .map(p => p.getFileName.toString ->
        Files.readAllLines(p).asScala.toSeq)
      .toMap

  private val corpus = Map(
    "f1.txt" -> "the quick brown fox\nthe lazy dog\n",
    "f2.txt" -> "the dog barks\nquick quick fox\n",
    "f3.txt" -> "lazy lazy lazy\n")

  private val expectedCounts = Map(
    "the" -> 3L, "quick" -> 3L, "brown" -> 1L, "fox" -> 2L,
    "lazy" -> 4L, "dog" -> 2L, "barks" -> 1L)

  test("golden word count end-to-end: counts, file naming, placement, order") {
    val in = tmpDir("mr-in")
    val out = tmpDir("mr-out") + "/result"
    writeInput(in, corpus)

    WordCount.job(in, out, numReducers = 4).run(spark)

    val parts = readPartFiles(out)
    // O8: exactly R part files named part-{i:05d} (worker/__main__.py:193)
    assert(parts.keySet === Set("part-00000", "part-00001", "part-00002", "part-00003"))

    val parsed = parts.map { case (name, lines) =>
      name -> lines.map { l =>
        val Array(k, v) = l.split("\t", 2); (k, v.toLong)
      }
    }
    // golden counts
    assert(parsed.values.flatten.toMap === expectedCounts)
    // O4: each word is in the partition the reference's MD5-mod would pick
    parsed.foreach { case (name, kvs) =>
      val idx = name.stripPrefix("part-").toInt
      kvs.foreach { case (k, _) =>
        assert(Md5Partitioner.partition(k, 4) === idx, s"$k in $name")
      }
    }
    // O5/O6: lines within each part file are key-sorted (sorted-stream
    // contract the reference reducer relies on, worker/__main__.py:200-202)
    parsed.values.foreach { kvs =>
      assert(kvs.map(_._1) === kvs.map(_._1).sorted)
    }
  }

  test("run overwrites a previous job's output directory") {
    val in = tmpDir("mr-in2")
    val out = tmpDir("mr-out2") + "/result"
    writeInput(in, Map("f.txt" -> "a b\n"))
    WordCount.job(in, out, numReducers = 2).run(spark)
    WordCount.job(in, out, numReducers = 2).run(spark)
    val all = readPartFiles(out).values.flatten.toSeq
    assert(all.sorted === Seq("a\t1", "b\t1"))
  }

  test("executable pipe path (rdd.pipe) multiset-equals the native path") {
    val in = tmpDir("mr-in3")
    writeInput(in, corpus)
    val res = getClass.getResource("/mr/exec/wc_map.sh")
    assume(res != null, "pipe fixtures on test classpath")
    val mapSh = Paths.get(res.toURI).toString
    val reduceSh = Paths.get(getClass.getResource("/mr/exec/wc_reduce.sh").toURI).toString

    val nativeOut = WordCount.job(in, tmpDir("mr-nat") + "/o", 3)
    val pipeOut = PipeMapReduceJob(in, tmpDir("mr-pipe") + "/o",
      Seq("/bin/sh", mapSh), Seq("/bin/sh", reduceSh), 3)

    val nativeLines = nativeOut.transform(spark).collect().sorted
    val pipeLines = pipeOut.transform(spark).collect().sorted
    assert(pipeLines === nativeLines)
    assert(nativeLines.nonEmpty)
  }

  test("wholeFiles compat mode: same results, no file split across map tasks") {
    val in = tmpDir("mr-whole")
    writeInput(in, corpus)
    // identical output to the default byte-split mode (stateless mapper)
    val a = WordCount.job(in, tmpDir("mr-w1") + "/o", 3)
      .copy(wholeFiles = true).transform(spark).collect().sorted
    val b = WordCount.job(in, tmpDir("mr-w2") + "/o", 3)
      .transform(spark).collect().sorted
    assert(a === b)
    // reference granularity (manager/__main__.py:440-455): every file's
    // lines land contiguous in ONE map partition, in file order
    val byPartition = MapReduceJob.inputLines(spark, in, wholeFiles = true)
      .mapPartitionsWithIndex { (i, it) => it.map(l => (i, l)) }
      .collect()
    corpus.values.foreach { content =>
      val fileLines = content.linesIterator.toSeq
      val idx = byPartition.indexWhere(_._2 == fileLines.head)
      assert(idx >= 0)
      val window = byPartition.slice(idx, idx + fileLines.length)
      assert(window.map(_._2).toSeq === fileLines, "lines contiguous in order")
      assert(window.map(_._1).distinct.length === 1, "single partition")
    }
  }

  test("groupedReducer streams contiguous groups without materializing") {
    val lines = Iterator("a\t1", "a\t2", "b\t5", "c\t1", "c\t1")
    val out = MapReduceJob.groupedReducer { (k, g) =>
      Iterator.single(s"$k\t${g.map(l => l.substring(k.length + 1).toInt).sum}")
    }(lines).toSeq
    assert(out === Seq("a\t3", "b\t5", "c\t2"))
  }

  test("groupedReducer drains unconsumed groups") {
    val lines = Iterator("a\t1", "a\t2", "b\t5")
    val out = MapReduceJob.groupedReducer { (k, g) =>
      Iterator.single(k) // never consumes the group
    }(lines).toSeq
    assert(out === Seq("a", "b"))
  }

  test("tabKey matches the reference split contract") {
    assert(MapReduceJob.tabKey("k\tv") === "k")
    assert(MapReduceJob.tabKey("k\tv\tw") === "k")
    assert(MapReduceJob.tabKey("notab") === "notab")
    assert(MapReduceJob.tabKey("\tv") === "")
  }
}
