package graft.mr

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.SparkSpec

/** E2E of the `mapreduce-submit`-style CLI facade (reference
  * map_reduce/mapreduce/submit.py:20-98) and the byte-compat
  * `part-{i:05d}` output-naming option. */
class SubmitSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def listNames(dir: String): Set[String] =
    Files.list(Paths.get(dir)).iterator.asScala
      .map(_.getFileName.toString).toSet

  private def readAll(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator.asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq

  test("Submit.run drives the executable word count end-to-end") {
    val in = tmpDir("submit-in")
    Files.writeString(Paths.get(in, "a.txt"), "to be or not to be\n")
    Files.writeString(Paths.get(in, "b.txt"), "be or be\n")
    val out = tmpDir("submit-out") + "/result"
    val mapSh = Paths.get(getClass.getResource("/mr/exec/wc_map.sh").toURI).toString
    val reduceSh = Paths.get(getClass.getResource("/mr/exec/wc_reduce.sh").toURI).toString

    Submit.run(spark, Seq(
      "-i", in, "-o", out, "-m", mapSh, "-r", reduceSh,
      "--nmappers", "2", "--nreducers", "3"))

    val counts = readAll(out).map { l =>
      val Array(k, v) = l.split("\t", 2); (k, v.toLong)
    }.toMap
    assert(counts === Map("to" -> 2L, "be" -> 4L, "or" -> 2L, "not" -> 1L))
    // exact-naming mode: only part-{i:05d} files, no _SUCCESS marker
    assert(listNames(out) === Set("part-00000", "part-00001", "part-00002"))
  }

  test("Submit rejects unknown options") {
    intercept[IllegalArgumentException] {
      Submit.run(spark, Seq("--bogus", "x"))
    }
  }

  test("exactPartNames pins part-{i:05d} for R=3 on the native job") {
    val in = tmpDir("exact-in")
    Files.writeString(Paths.get(in, "f.txt"), "a b c d e f\n")
    val out = tmpDir("exact-out") + "/result"
    WordCount.job(in, out, numReducers = 3).run(spark, exactPartNames = true)
    assert(listNames(out) === Set("part-00000", "part-00001", "part-00002"))
    // default mode keeps Hadoop's _SUCCESS marker alongside the parts
    val out2 = tmpDir("exact-out2") + "/result"
    WordCount.job(in, out2, numReducers = 3).run(spark)
    assert(listNames(out2).contains("_SUCCESS"))
  }
}
