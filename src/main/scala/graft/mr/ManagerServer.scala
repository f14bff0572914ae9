package graft.mr

import java.net.{InetSocketAddress, ServerSocket, Socket, SocketTimeoutException}
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
  *  - `{"message_type": "shutdown"}` stops accepting, then DRAINS the
  *    queue (current job plus any already-accepted ones) before ending
  *    (check_shutdown, manager/__main__.py:68-87 — the worker-forwarding
  *    half is absorbed by Spark's scheduler owning the workers). One
  *    deliberate deviation: the reference's run_job loop re-checks the
  *    shutdown flag each second and DROPS still-queued jobs; accepted
  *    work is not silently lost here;
  *  - accept/recv use 1 s timeouts so the shutdown flag is polled, like
  *    the reference's `sock.settimeout(1)` loops.
  *
  * The worker fleet the reference dispatches to is Spark's scheduler:
  * each dequeued job runs through [[Submit.run]] (same executables
  * contract, byte-compat part-file output). On a real cluster this
  * daemon fronts a long-lived SparkSession the way the reference
  * manager fronts its worker pool. */
final class ManagerServer(spark: SparkSession, host: String = "localhost",
    port: Int = 0) {

  private val queue = new LinkedBlockingQueue[java.util.Map[String, Object]]()
  private val numJobs = new AtomicInteger(0)
  @volatile private var shutdownFlag = false
  @volatile private var failedJobs = 0

  private val server = new ServerSocket()
  server.setReuseAddress(true)
  server.bind(new InetSocketAddress(host, port))
  server.setSoTimeout(1000)

  /** The bound port (useful when constructed with port=0 / ephemeral). */
  def boundPort: Int = server.getLocalPort
  def isShutdown: Boolean = shutdownFlag
  def failedJobCount: Int = failedJobs

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def handleMessage(text: String): Unit = {
    val dict =
      try mapper.readValue(text, classOf[java.util.Map[String, Object]])
      catch { case _: Exception => return } // undecodable JSON: ignore
    dict.get("message_type") match {
      case "shutdown" =>
        println("Received shutdown message") // manager/__main__.py:71
        shutdownFlag = true
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
      case _ => () // register/heartbeat/finished: Spark owns the workers
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

  private val runnerThread = new Thread(() => {
    while (!shutdownFlag || !queue.isEmpty) {
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
        try Submit.run(spark, argv)
        catch { case scala.util.control.NonFatal(e) =>
          failedJobs += 1
          System.err.println(
            s"job ${job.get("job_id")} failed: " +
              Option(e.getMessage).getOrElse(e.toString))
        }
      }
    }
  }, "graft-manager-runner")

  def start(): this.type = {
    acceptThread.setDaemon(true)
    runnerThread.setDaemon(true)
    acceptThread.start()
    runnerThread.start()
    println(s"starting tcp server on manager") // ref :148
    this
  }

  /** Block until a shutdown message has been received AND the queue has
    * drained (current job included). */
  def awaitTermination(): Unit = {
    acceptThread.join()
    runnerThread.join()
  }
}

object ManagerServer {
  /** `runMain graft.mr.ManagerServer [--host h] [--port p]` — listen
    * until a shutdown message arrives (reference default port 6000,
    * map_reduce/bin/mapreduce:24). */
  def main(args: Array[String]): Unit = {
    var host = "localhost"
    var port = 6000
    args.sliding(2, 2).foreach {
      case Array("--host", v) => host = v
      case Array("--port", v) => port = v.toInt
      case other =>
        throw new IllegalArgumentException(s"unknown option: ${other.mkString(" ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = new ManagerServer(spark, host, port).start()
    try srv.awaitTermination()
    finally spark.stop()
  }
}
