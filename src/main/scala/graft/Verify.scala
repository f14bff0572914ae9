package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Atomic = directly comparable by the driver's pandas sort/hash.
    * ArrayType/MapType/StructType are not (numpy arrays are unhashable). */
  private[graft] def isAtomic(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    dt match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _ => true
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional: restrict to named queries (fast local iteration)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var failures = 0
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // HARD requirement: every output column must be atomic. The
        // driver's pandas comparator cannot sort/hash array/map/struct
        // cells (round 7's one red row, q_scalar_map) — the local gate
        // emulator stringified them and passed vacuously. Failing HERE
        // makes the local loop catch it before the driver does; nested
        // results must be serialized (e.g. sorted array_join) instead.
        val nested = df.schema.fields.collect {
          case f if !isAtomic(f.dataType) => s"${f.name}: ${f.dataType.sql}"
        }
        if (nested.nonEmpty)
          throw new IllegalStateException(
            s"non-atomic output column(s) ${nested.mkString(", ")} — " +
              "the driver gate cannot compare nested types; serialize them")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        failures += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Which queries this run ATTEMPTED (post-filter): lets check.py fail a
    // query that threw (its output dir is absent) instead of skipping it.
    val ran = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
      .map(q).mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/ran.json"), ran)
    spark.stop()
    // Exit nonzero on ANY query failure — a throwing query used to leave
    // only a stderr line, and any harness calling Verify without check.py
    // (which catches the missing output dir) saw exit 0. The artifacts
    // above are all written first, so the driver's compare still runs.
    if (failures > 0) {
      System.err.println(s"[verify] $failures quer${if (failures == 1) "y" else "ies"} failed")
      sys.exit(1)
    }
  }
}
