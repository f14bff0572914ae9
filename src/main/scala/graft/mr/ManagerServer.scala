package graft.mr

import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, ServerSocket, Socket, SocketTimeoutException}
import java.util.concurrent.LinkedBlockingQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession

/** Network job-submission daemon mirroring the reference manager's TCP
  * surface (reference map_reduce/mapreduce/manager/__main__.py:140-210):
  * a JSON message per connection, read until the client closes, then
  * dispatched on `message_type`. This closes the one reference entry
  * point a user couldn't exercise verbatim against the rebuild — the
  * `mapreduce-submit` script posts its job dict over a socket
  * (reference submit.py:80-87), and this listener accepts exactly that
  * message shape:
  *
  *   {"message_type": "new_manager_job", "input_directory": ...,
  *    "output_directory": ..., "mapper_executable": ...,
  *    "reducer_executable": ..., "num_mappers": N, "num_reducers": N}
  *
  * Fidelity notes, mirroring the reference by line:
  *  - jobs get an incrementing `job_id` and append to a FIFO queue run
  *    strictly one at a time (manager/__main__.py:91-104, 215-222); a
  *    failed job does not stop the queue (the Submit.runQueueCli rule);
  *  - the output directory is deleted and recreated on RECEIPT, not at
  *    run time (manager/__main__.py:95-101);
  *  - undecodable JSON is ignored and the server keeps listening
  *    (manager/__main__.py:193-196);
  *  - accept/recv use 1 s timeouts so the shutdown flag is polled, like
  *    the reference's `sock.settimeout(1)` loops.
  *
  * WORKER-SIDE WIRE PROTOCOL (the full 8-message inventory, SURVEY
  * §1.2): the reference's `mapreduce-worker` binary registers over TCP,
  * heartbeats over UDP, and reports task completion over TCP. This
  * manager now SPEAKS that half too, so the reference worker binary
  * connects cleanly instead of hanging on a missing ack:
  *  - `register` (worker/__main__.py:282-300): the manager connects BACK
  *    to (worker_host, worker_port) and sends `register_ack`
  *    (manager/__main__.py:23-55); a refused connect-back marks every
  *    live worker on that HOST dead — the reference's connection_refused
  *    matches host only (manager/__main__.py:57-66), quirk preserved. A
  *    re-registration of a live host:port marks the old entry dead and
  *    appends a fresh one ("dead and revived", manager/__main__.py:39-46).
  *  - `heartbeat` over UDP to the same host:port every 2 s
  *    (worker/__main__.py:49-63): refreshes last_heartbeat for the first
  *    matching non-dead entry (manager/__main__.py:106-138).
  *  - fault tolerance (manager/__main__.py:426-438): a 2 s poll marks any
  *    worker silent for > 10 s dead (both intervals constructor-tunable
  *    for tests, defaults reference-exact).
  *  - `finished` (manager/__main__.py:197-207): increments the finished
  *    counter and flips the FIRST host:port match back to ready — the
  *    reference does not check state on that scan, so a dead entry can be
  *    revived to ready; quirk preserved.
  *  TASK dispatch stays with Spark's scheduler (the substrate owns real
  *  data movement — SURVEY §2.2's documented delegation): registered
  *  workers are tracked and acked but not sent new_map_task messages.
  *
  * SHUTDOWN (`{"message_type": "shutdown"}`): forwards shutdown to every
  * non-dead registered worker by connecting to its host:port
  * (check_shutdown, manager/__main__.py:68-87), stops accepting, then:
  *  - default (drain): finishes the current job plus any already-accepted
  *    ones — a deliberate, documented deviation (accepted work is not
  *    silently lost);
  *  - `strictShutdown = true` (CLI `--strict-shutdown`): the reference's
  *    exact semantics — the run loop re-checks the shutdown flag and
  *    DROPS still-queued jobs (run_job's per-second check,
  *    manager/__main__.py:213-224); only the in-flight job completes.
  *
  * The worker fleet the reference dispatches to is Spark's scheduler:
  * each dequeued job runs through [[Submit.run]] (same executables
  * contract, byte-compat part-file output). On a real cluster this
  * daemon fronts a long-lived SparkSession the way the reference
  * manager fronts its worker pool. */
final class ManagerServer(spark: SparkSession, host: String = "localhost",
    port: Int = 0, strictShutdown: Boolean = false,
    heartbeatTimeoutMs: Long = 10000, faultPollMs: Long = 2000,
    runner: (SparkSession, Seq[String]) => Unit = Submit.run(_, _)) {

  private val queue = new LinkedBlockingQueue[java.util.Map[String, Object]]()
  private val numJobs = new AtomicInteger(0)
  @volatile private var shutdownFlag = false
  @volatile private var failedJobs = 0
  @volatile private var tasksFinished = 0
  @volatile private var droppedJobs = 0

  /** One registered worker — a LIST entry like the reference's
    * self.workers dicts (duplicates per host:port are possible by
    * design: re-registration appends). */
  private final class WorkerEntry(val host: String, val port: Int) {
    @volatile var state: String = "ready" // ready | busy | dead
    @volatile var lastHeartbeat: Long = System.currentTimeMillis()
  }
  private val workers =
    new java.util.concurrent.CopyOnWriteArrayList[WorkerEntry]()

  private val server = new ServerSocket()
  server.setReuseAddress(true)
  server.bind(new InetSocketAddress(host, port))
  server.setSoTimeout(1000)

  // UDP heartbeat listener on the SAME host:port as the TCP server
  // (reference UDP_server, manager/__main__.py:106-127)
  private val udp = new DatagramSocket(null)
  udp.setReuseAddress(true)
  udp.bind(new InetSocketAddress(host, server.getLocalPort))
  udp.setSoTimeout(1000)

  /** The bound port (useful when constructed with port=0 / ephemeral). */
  def boundPort: Int = server.getLocalPort
  def isShutdown: Boolean = shutdownFlag
  def failedJobCount: Int = failedJobs
  def finishedCount: Int = tasksFinished
  def droppedJobCount: Int = droppedJobs
  /** Registration-ordered (host, port, state) snapshot — test probe. */
  def workerStates: Seq[(String, Int, String)] = {
    import scala.jdk.CollectionConverters._
    workers.asScala.map(w => (w.host, w.port, w.state)).toSeq
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The reference's connection_refused (manager/__main__.py:57-66):
    * every live worker on that HOST is marked dead (host-only match —
    * reference quirk), a busy one's task is abandoned. */
  private def connectionRefused(workerHost: String): Unit = {
    import scala.jdk.CollectionConverters._
    for (w <- workers.asScala if w.host == workerHost && w.state != "dead") {
      println("worker died") // ref :64
      w.state = "dead"
    }
  }

  /** Connect back to the worker and send one JSON message, closing after
    * (the reference's with-socket sendall pattern). */
  private def sendToWorker(wHost: String, wPort: Int, json: String): Unit = {
    val s = new Socket()
    try {
      s.connect(new InetSocketAddress(wHost, wPort), 1000)
      s.getOutputStream.write(json.getBytes("UTF-8"))
      s.getOutputStream.flush()
    } catch {
      case _: java.net.ConnectException => connectionRefused(wHost)
      case _: Exception => connectionRefused(wHost)
    } finally {
      try s.close() catch { case _: Exception => () }
    }
  }

  private def handleRegister(dict: java.util.Map[String, Object]): Unit = {
    import scala.jdk.CollectionConverters._
    val wHost = Option(dict.get("worker_host")).map(_.toString).getOrElse(return)
    val wPort = Option(dict.get("worker_port")).map(_.toString.toInt)
      .getOrElse(return)
    println("Received worker registration") // ref :26 (LOGGER.info)
    // reference order: mark a live same-host:port entry dead, APPEND the
    // fresh entry, then ack over a new connection (ref :39-55)
    workers.asScala.find(w =>
        w.host == wHost && w.port == wPort && w.state != "dead")
      .foreach { w =>
        w.state = "dead"
        println("worker marked as dead and revived") // ref :44
      }
    workers.add(new WorkerEntry(wHost, wPort))
    sendToWorker(wHost, wPort, mapper.writeValueAsString(
      java.util.Map.of(
        "message_type", "register_ack",
        "worker_host", wHost,
        "worker_port", Integer.valueOf(wPort))))
  }

  private def handleFinished(dict: java.util.Map[String, Object]): Unit = {
    import scala.jdk.CollectionConverters._
    println("RECEIVED FINISHED MESSAGE") // ref :198
    tasksFinished += 1
    for {
      wHost <- Option(dict.get("worker_host")).map(_.toString)
      wPort <- Option(dict.get("worker_port")).map(_.toString.toInt)
    } workers.asScala.find(w => w.host == wHost && w.port == wPort)
      .foreach(_.state = "ready") // first match, state unchecked (ref :203)
  }

  private def handleHeartbeat(dict: java.util.Map[String, Object]): Unit = {
    import scala.jdk.CollectionConverters._
    for {
      wHost <- Option(dict.get("worker_host")).map(_.toString)
      wPort <- Option(dict.get("worker_port")).map(_.toString.toInt)
    } workers.asScala.find(w =>
        w.host == wHost && w.port == wPort && w.state != "dead")
      .foreach(_.lastHeartbeat = System.currentTimeMillis())
  }

  private def handleMessage(text: String): Unit = {
    val dict =
      try mapper.readValue(text, classOf[java.util.Map[String, Object]])
      catch { case _: Exception => return } // undecodable JSON: ignore
    dict.get("message_type") match {
      case "shutdown" =>
        println("Received shutdown message") // manager/__main__.py:71
        // forward shutdown to every non-dead worker (ref :72-86)
        import scala.jdk.CollectionConverters._
        for (w <- workers.asScala if w.state != "dead")
          sendToWorker(w.host, w.port, """{"message_type": "shutdown"}""")
        shutdownFlag = true
      case "register" => handleRegister(dict)
      case "finished" => handleFinished(dict)
      case "new_manager_job" =>
        val id = numJobs.getAndIncrement()
        dict.put("job_id", Integer.valueOf(id))
        // delete + recreate the output dir on receipt (ref :95-101)
        Option(dict.get("output_directory")).map(_.toString).foreach { od =>
          val f = new java.io.File(od)
          if (f.isDirectory) {
            def rm(x: java.io.File): Unit = {
              Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
            }
            rm(f)
          }
          f.mkdirs()
        }
        queue.put(dict)
      case _ => () // unknown types ignored
    }
  }

  private val acceptThread = new Thread(() => {
    while (!shutdownFlag) {
      val client: Socket =
        try server.accept()
        catch {
          case _: SocketTimeoutException => null
          case _: Exception => null // closed under us during shutdown
        }
      if (client != null) {
        try {
          client.setSoTimeout(1000)
          val buf = new java.io.ByteArrayOutputStream()
          val in = client.getInputStream
          val chunk = new Array[Byte](4096)
          var open = true
          while (open && !shutdownFlag) {
            val n =
              try in.read(chunk)
              catch { case _: SocketTimeoutException => 0 }
            if (n < 0) open = false
            else if (n > 0) buf.write(chunk, 0, n)
          }
          handleMessage(buf.toString("UTF-8"))
        } catch { case _: Exception => () }
        finally client.close()
      }
    }
    server.close()
  }, "graft-manager-tcp")

  private val udpThread = new Thread(() => {
    val buf = new Array[Byte](4096)
    while (!shutdownFlag) {
      val pkt = new DatagramPacket(buf, buf.length)
      val got =
        try { udp.receive(pkt); true }
        catch {
          case _: SocketTimeoutException => false
          case _: Exception => false
        }
      if (got) {
        val text = new String(pkt.getData, pkt.getOffset, pkt.getLength, "UTF-8")
        try {
          val dict = mapper.readValue(text, classOf[java.util.Map[String, Object]])
          if (dict.get("message_type") == "heartbeat") handleHeartbeat(dict)
        } catch { case _: Exception => () } // undecodable: ignore (ref :124)
      }
    }
    udp.close()
  }, "graft-manager-udp")

  private val faultThread = new Thread(() => {
    import scala.jdk.CollectionConverters._
    while (!shutdownFlag) {
      val now = System.currentTimeMillis()
      for (w <- workers.asScala
           if now - w.lastHeartbeat > heartbeatTimeoutMs && w.state != "dead")
        w.state = "dead" // busy-task reassignment is Spark's job here
      try Thread.sleep(faultPollMs)
      catch { case _: InterruptedException => () }
    }
  }, "graft-manager-fault")

  private val runnerThread = new Thread(() => {
    // drain mode keeps accepted work; strict mode mirrors the reference
    // run loop, which exits on the flag and drops still-queued jobs
    while (!shutdownFlag || (!strictShutdown && !queue.isEmpty)) {
      val job = queue.poll(200, java.util.concurrent.TimeUnit.MILLISECONDS)
      if (job != null) {
        println(s"running job ${job.get("job_id")}") // ref :216
        val argv = Seq(
          "-i", job.get("input_directory").toString,
          "-o", job.get("output_directory").toString,
          "-m", job.get("mapper_executable").toString,
          "-r", job.get("reducer_executable").toString,
          "--nmappers", job.get("num_mappers").toString,
          "--nreducers", job.get("num_reducers").toString)
        try runner(spark, argv)
        catch { case scala.util.control.NonFatal(e) =>
          failedJobs += 1
          System.err.println(
            s"job ${job.get("job_id")} failed: " +
              Option(e.getMessage).getOrElse(e.toString))
        }
      }
    }
    if (strictShutdown && !queue.isEmpty) {
      droppedJobs = queue.size()
      System.err.println(
        s"strict shutdown: dropping $droppedJobs queued job(s) " +
          "(reference run-loop semantics)")
      queue.clear()
    }
  }, "graft-manager-runner")

  def start(): this.type = {
    acceptThread.setDaemon(true)
    runnerThread.setDaemon(true)
    udpThread.setDaemon(true)
    faultThread.setDaemon(true)
    acceptThread.start()
    runnerThread.start()
    udpThread.start()
    faultThread.start()
    println(s"starting tcp server on manager") // ref :148
    this
  }

  /** Block until a shutdown message has been received AND the runner has
    * finished (drain mode: queue emptied; strict mode: current job only). */
  def awaitTermination(): Unit = {
    acceptThread.join()
    runnerThread.join()
  }
}

object ManagerServer {
  /** `runMain graft.mr.ManagerServer [--host h] [--port p]
    * [--strict-shutdown]` — listen until a shutdown message arrives
    * (reference default port 6000, map_reduce/bin/mapreduce:24). */
  def main(args: Array[String]): Unit = {
    var host = "localhost"
    var port = 6000
    var strict = false
    var rest = args.toList
    while (rest.nonEmpty) rest = rest match {
      case "--host" :: v :: t => host = v; t
      case "--port" :: v :: t => port = v.toInt; t
      case "--strict-shutdown" :: t => strict = true; t
      case other =>
        throw new IllegalArgumentException(s"unknown option: ${other.head}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = new ManagerServer(spark, host, port,
      strictShutdown = strict).start()
    try srv.awaitTermination()
    finally spark.stop()
  }
}
