package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout introspection: per-column parquet FOOTER statistics
  * (row-group counts, value counts, null counts, compressed/uncompressed
  * byte totals) collected distributedly — the manifest/stats-collection
  * job every lakehouse maintenance pipeline runs before compaction,
  * cost-based pruning, or a storage-budget report. The reference has no
  * storage introspection at all (its sink is plain text parts,
  * SURVEY.md §2.4); this is the capability a 100 TB corpus needs to
  * answer "which columns pay for themselves" without scanning data.
  *
  * Scale shape: footer reads ONLY — a parquet footer is KBs regardless
  * of file size, so the job reads |files|·KB, never data pages; file
  * paths are parallelized across executors (one task per file here,
  * batches of files per task at fleet scale) and the per-column rollup
  * is an ordinary hash aggregation. No driver-side I/O beyond the
  * listing.
  *
  * Gate: DuckDB's `parquet_metadata()` table function reads the same
  * footers independently — the oracle aggregates it per column, so any
  * disagreement in chunk accounting (value counts, null counts, byte
  * totals) between the parquet-hadoop walk and DuckDB's reader fails
  * the hash. Null counts are emitted as NULLABLE (a writer may omit
  * statistics; DuckDB surfaces NULL there too). */
object ParquetMeta {

  /** One row per (table, row-group, column chunk) from the footers of
    * the given fixture tables, read inside executors. */
  private def chunkRows(spark: SparkSession, dir: String,
      tables: Seq[String]): DataFrame = {
    import spark.implicits._
    val paths = tables.map(t => (t, s"$dir/$t.parquet"))
    spark.sparkContext.parallelize(paths, paths.size).flatMap {
      case (tbl, p) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks
          import scala.jdk.CollectionConverters._
          blocks.asScala.flatMap { b =>
            b.getColumns.asScala.map { c =>
              val st = c.getStatistics
              val nulls: Option[Long] =
                if (st != null && st.isNumNullsSet) Some(st.getNumNulls)
                else None
              (tbl, c.getPath.toDotString, c.getValueCount, nulls,
                c.getTotalSize, c.getTotalUncompressedSize)
            }
          }.toSeq
        } finally reader.close()
    }.toDF("tbl", "col", "n_values", "null_count",
      "compressed_bytes", "uncompressed_bytes")
  }

  /** Per-column footer rollup over three representative fixture tables
    * (narrow text-heavy, wide numeric, event stream). */
  def qParquetMeta(spark: SparkSession, dir: String): DataFrame =
    chunkRows(spark, dir, Seq("documents", "lineitem", "events"))
      .groupBy("tbl", "col")
      .agg(count(lit(1)).as("n_row_groups"),
        sum(col("n_values")).cast("bigint").as("n_values"),
        sum(col("null_count")).cast("bigint").as("null_count"),
        sum(col("compressed_bytes")).cast("bigint").as("compressed_bytes"),
        sum(col("uncompressed_bytes")).cast("bigint")
          .as("uncompressed_bytes"))
      .orderBy("tbl", "col")

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_parquet_meta" -> qParquetMeta _)

  /** The oracle reads the same footers through DuckDB's own parquet
    * reader (`parquet_metadata()`). The file paths are hardcoded to the
    * gate sf like every [[graft.OracleExport.oraclePath]] reference —
    * the driver contract runs the correctness gate at sf0.01. */
  private val GateSf = "/root/testdata/sf0.01"
  val oracles: Map[String, String] = Map(
    "q_parquet_meta" ->
      Seq("documents", "lineitem", "events").map { t =>
        s"""SELECT '$t' AS tbl, path_in_schema AS col,
           |  COUNT(*) AS n_row_groups,
           |  CAST(SUM(num_values) AS BIGINT) AS n_values,
           |  CAST(SUM(stats_null_count) AS BIGINT) AS null_count,
           |  CAST(SUM(total_compressed_size) AS BIGINT) AS compressed_bytes,
           |  CAST(SUM(total_uncompressed_size) AS BIGINT) AS uncompressed_bytes
           |FROM parquet_metadata('$GateSf/$t.parquet')
           |GROUP BY path_in_schema""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) z ORDER BY tbl, col"))
}
