package graft.mr

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.SparkSpec

/** E2E of the TCP submission daemon through a RAW SOCKET CLIENT doing
  * exactly what the reference `mapreduce-submit` does (reference
  * submit.py:80-87: connect, sendall the JSON dict, close): the one
  * reference entry point the in-process [[Submit]] facade didn't cover. */
class ManagerServerSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def stageExecutable(resource: String): String = {
    val src = Paths.get(getClass.getResource(resource).toURI)
    val dst = Paths.get(tmpDir("mgr-exec"), src.getFileName.toString)
    Files.copy(src, dst)
    assert(dst.toFile.setExecutable(true))
    dst.toString
  }

  /** submit.py's exact client behavior: one JSON message, then close. */
  private def send(port: Int, json: String): Unit = {
    val s = new java.net.Socket("localhost", port)
    try {
      s.getOutputStream.write(json.getBytes("UTF-8"))
      s.getOutputStream.flush()
    } finally s.close()
  }

  private def jobJson(in: String, out: String, m: String, r: String,
      nm: Int = 2, nr: Int = 2): String =
    s"""{"message_type": "new_manager_job",
       |"input_directory": "$in", "output_directory": "$out",
       |"mapper_executable": "$m", "reducer_executable": "$r",
       |"num_mappers": $nm, "num_reducers": $nr}""".stripMargin

  private def awaitFile(path: String, timeoutMs: Long = 60000): Boolean = {
    val t0 = System.currentTimeMillis()
    while (System.currentTimeMillis() - t0 < timeoutMs) {
      if (Files.exists(Paths.get(path))) return true
      Thread.sleep(100)
    }
    false
  }

  test("socket-submitted jobs run FIFO; bad JSON ignored; shutdown ends the server") {
    val mapSh = stageExecutable("/mr/exec/wc_map.sh")
    val reduceSh = stageExecutable("/mr/exec/wc_reduce.sh")
    val in = tmpDir("mgr-in")
    Files.writeString(Paths.get(in, "a.txt"), "to be or not to be\n")
    val out1 = tmpDir("mgr-out1") + "/r1"
    val out2 = tmpDir("mgr-out2") + "/r2"

    val srv = new ManagerServer(spark, port = 0).start()
    try {
      // garbage first: the reference's JSONDecodeError branch ignores it
      send(srv.boundPort, "{not json at all")
      send(srv.boundPort, jobJson(in, out1, mapSh, reduceSh))
      send(srv.boundPort, jobJson(in, out2, mapSh, reduceSh, nm = 1, nr = 1))

      assert(awaitFile(out1 + "/part-00000"), "job 0 output missing")
      assert(awaitFile(out2 + "/part-00000"), "job 1 output missing")
      val counts = Files.readAllLines(Paths.get(out1, "part-00000")).asScala ++
        Files.readAllLines(Paths.get(out1, "part-00001")).asScala
      assert(counts.map { l => val Array(k, v) = l.split("\t", 2); (k, v.toLong) }
        .toMap === Map("to" -> 2L, "be" -> 2L, "or" -> 1L, "not" -> 1L))
      assert(srv.failedJobCount === 0)

      // the reference deletes + recreates the output dir on receipt:
      // resubmitting over out1 must not fail on the existing directory
      send(srv.boundPort, jobJson(in, out1, mapSh, reduceSh))
      assert(awaitFile(out1 + "/part-00000"), "resubmitted job output missing")

      send(srv.boundPort, """{"message_type": "shutdown"}""")
      srv.awaitTermination()
      assert(srv.isShutdown)
      // the port is released: a fresh bind to it succeeds
      val probe = new java.net.ServerSocket(srv.boundPort)
      probe.close()
    } finally {
      if (!srv.isShutdown) {
        send(srv.boundPort, """{"message_type": "shutdown"}""")
        srv.awaitTermination()
      }
    }
  }

  test("concurrent clients: simultaneous submits all enqueue and run") {
    // the reference reads one connection at a time; concurrent clients
    // queue in the listen backlog — none may be dropped
    val mapSh = stageExecutable("/mr/exec/wc_map.sh")
    val reduceSh = stageExecutable("/mr/exec/wc_reduce.sh")
    val in = tmpDir("mgr-cc-in")
    Files.writeString(Paths.get(in, "a.txt"), "a b a\n")
    val outs = (0 until 4).map(i => tmpDir(s"mgr-cc-out$i") + s"/r$i")

    val srv = new ManagerServer(spark, port = 0).start()
    try {
      val threads = outs.map { out =>
        new Thread(() =>
          send(srv.boundPort, jobJson(in, out, mapSh, reduceSh, nm = 1, nr = 1)))
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      outs.foreach { out =>
        assert(awaitFile(out + "/part-00000"), s"missing output $out")
      }
      assert(srv.failedJobCount === 0)
    } finally {
      send(srv.boundPort, """{"message_type": "shutdown"}""")
      srv.awaitTermination()
    }
  }

  test("a failed job does not stop the queue (reference FIFO rule)") {
    val mapSh = stageExecutable("/mr/exec/wc_map.sh")
    val reduceSh = stageExecutable("/mr/exec/wc_reduce.sh")
    val in = tmpDir("mgr-in2")
    Files.writeString(Paths.get(in, "a.txt"), "x y x\n")
    val out = tmpDir("mgr-out3") + "/ok"

    val srv = new ManagerServer(spark, port = 0).start()
    try {
      // nonexistent mapper → the job throws inside the runner
      send(srv.boundPort, jobJson(in, tmpDir("mgr-bad") + "/bad",
        "/nonexistent/mapper.sh", reduceSh))
      send(srv.boundPort, jobJson(in, out, mapSh, reduceSh, nm = 1, nr = 1))
      assert(awaitFile(out + "/part-00000"), "job after failure missing")
      assert(srv.failedJobCount === 1)
    } finally {
      send(srv.boundPort, """{"message_type": "shutdown"}""")
      srv.awaitTermination()
    }
  }
}
