package graft.mr

import org.scalatest.funsuite.AnyFunSuite

/** Task→file assignment parity for the wire-dispatch partitioners
  * (reference manager/__main__.py:440-470) — the Md5PartitionerSpec
  * treatment: fixed vectors from the reference formula, plus a live
  * cross-pin that runs the reference's OWN input_partition /
  * input_partition_reduce functions (unbound, with a stub self) on
  * randomized listings and compares assignment-for-assignment. */
class WireDispatchSpec extends AnyFunSuite {

  test("inputPartition: round-robin deal over the sorted listing") {
    // 5 files, 2 mappers: sorted deal alternates
    assert(WireDispatch.inputPartition(
      Seq("c.txt", "a.txt", "b.txt", "e.txt", "d.txt"), 2, "/in") ===
      Vector(Vector("/in/a.txt", "/in/c.txt", "/in/e.txt"),
        Vector("/in/b.txt", "/in/d.txt")))
  }

  test("inputPartition: post-deal results.sort() moves EMPTY buckets to the front") {
    // the reference quirk (ref :454): 2 files across 5 mappers leaves 3
    // empty buckets, and Python's list sort puts [] before any non-empty
    // list — so task ids 0..2 carry no input and the files land on 3..4
    val got = WireDispatch.inputPartition(Seq("b.txt", "a.txt"), 5, "/in")
    assert(got === Vector(Vector(), Vector(), Vector(),
      Vector("/in/a.txt"), Vector("/in/b.txt")))
  }

  test("inputPartitionReduce: partNNNNN suffix buckets, sorted within") {
    val files = Seq(
      "maptask00001-part00000", "maptask00000-part00001",
      "maptask00000-part00000", "maptask00001-part00001")
    assert(WireDispatch.inputPartitionReduce(files, 2, "/tmp/s") ===
      Vector(
        Vector("/tmp/s/maptask00000-part00000",
          "/tmp/s/maptask00001-part00000"),
        Vector("/tmp/s/maptask00000-part00001",
          "/tmp/s/maptask00001-part00001")))
  }

  test("both partitioners match the reference's own Python functions on random listings") {
    val refRoot = new java.io.File("/root/reference/map_reduce")
    val pyOk =
      try new ProcessBuilder("python3", "-c", "import click").start()
        .waitFor() == 0
      catch { case _: Exception => false }
    if (!refRoot.isDirectory || !pyOk)
      cancel("reference tree or python3+click unavailable")
    // deterministic randomized listings exercising: uneven division,
    // more mappers than files, single file, names that sort differently
    // than they were listed
    val rnd = new scala.util.Random(4855)
    val cases = (0 until 12).map { _ =>
      val nFiles = 1 + rnd.nextInt(9)
      val files = scala.util.Random.javaRandomToRandom(
        new java.util.Random(rnd.nextLong())).shuffle(
        (0 until nFiles).map(i => f"f${rnd.nextInt(99)}%02d_$i.txt").toList)
      val nm = 1 + rnd.nextInt(7)
      (files, nm)
    }
    val payload = new StringBuilder()
    payload.append(
      """import json, sys
        |sys.path.insert(0, "/root/reference/map_reduce")
        |from mapreduce.manager.__main__ import Manager
        |stub = type("S", (), {"signals": {"shutdown": False}})()
        |out = []
        |for files, nm, indir in json.load(sys.stdin):
        |    out.append(Manager.input_partition(stub, list(files), nm, indir))
        |json.dump(out, sys.stdout)
        |""".stripMargin)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val inJson = om.writeValueAsString(java.util.List.copyOf(
      scala.jdk.CollectionConverters.SeqHasAsJava(cases.map { case (fs, nm) =>
        java.util.List.of(
          java.util.List.copyOf(
            scala.jdk.CollectionConverters.SeqHasAsJava(fs).asJava),
          Integer.valueOf(nm), "/in")
      }).asJava))
    val pb = new ProcessBuilder("python3", "-c", payload.toString)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    proc.getOutputStream.write(inJson.getBytes("UTF-8"))
    proc.getOutputStream.close()
    val refOut = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val err = new String(proc.getErrorStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"reference run failed: $err")
    val refParts = om.readValue(refOut,
      classOf[java.util.List[java.util.List[java.util.List[String]]]])
    import scala.jdk.CollectionConverters._
    cases.zipWithIndex.foreach { case ((files, nm), i) =>
      val expect = refParts.get(i).asScala
        .map(_.asScala.toVector).toVector
      val got = WireDispatch.inputPartition(files, nm, "/in")
      assert(got === expect, s"case $i: files=$files nm=$nm")
    }
    // reduce side: synthesize map-output names like the worker writes
    // them (maptaskNNNNN-partNNNNN) in scrambled listing order
    val rcases = (0 until 8).map { _ =>
      val nr = 1 + rnd.nextInt(5)
      val nTasks = 1 + rnd.nextInt(4)
      val names = scala.util.Random.javaRandomToRandom(
        new java.util.Random(rnd.nextLong())).shuffle(
        (for (t <- 0 until nTasks; p <- 0 until nr)
          yield f"maptask$t%05d-part$p%05d").toList)
      (names, nr)
    }
    val rPayload =
      """import json, sys
        |sys.path.insert(0, "/root/reference/map_reduce")
        |from mapreduce.manager.__main__ import Manager
        |stub = type("S", (), {"signals": {"shutdown": False}})()
        |out = []
        |for files, nr, tdir in json.load(sys.stdin):
        |    out.append(Manager.input_partition_reduce(stub, list(files), nr, tdir))
        |json.dump(out, sys.stdout)
        |""".stripMargin
    val rIn = om.writeValueAsString(java.util.List.copyOf(
      scala.jdk.CollectionConverters.SeqHasAsJava(rcases.map { case (fs, nr) =>
        java.util.List.of(
          java.util.List.copyOf(
            scala.jdk.CollectionConverters.SeqHasAsJava(fs).asJava),
          Integer.valueOf(nr), "/tmp/s")
      }).asJava))
    val rProc = new ProcessBuilder("python3", "-c", rPayload).start()
    rProc.getOutputStream.write(rIn.getBytes("UTF-8"))
    rProc.getOutputStream.close()
    val rOut = new String(rProc.getInputStream.readAllBytes(), "UTF-8")
    val rErr = new String(rProc.getErrorStream.readAllBytes(), "UTF-8")
    assert(rProc.waitFor() == 0, s"reference reduce run failed: $rErr")
    val rRef = om.readValue(rOut,
      classOf[java.util.List[java.util.List[java.util.List[String]]]])
    rcases.zipWithIndex.foreach { case ((files, nr), i) =>
      val expect = rRef.get(i).asScala.map(_.asScala.toVector).toVector
      val got = WireDispatch.inputPartitionReduce(files, nr, "/tmp/s")
      assert(got === expect, s"reduce case $i: nr=$nr")
    }
  }
}
