package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Range sharding with SAMPLED cut points — the global-sorted-layout
  * (terasort) write pattern: to produce a totally ordered corpus layout
  * you never globally sort the data; you pick k−1 key cut points from a
  * small sample, route every row to its range shard with a pure
  * function, and sort WITHIN shards at write time. Spark's own
  * `RangePartitioner` does exactly this — but with a nondeterministic
  * reservoir sample (re-runs produce different bounds, task retries can
  * see different partitionings mid-job). This pass replaces the
  * reservoir with the repo's content-hash sample (md5 threshold — the
  * q_sample_bernoulli idiom), making bounds a pure function of the
  * corpus: reproducible across runs, engines, partitionings, and task
  * retries, which is what lets a DuckDB oracle re-derive the ENTIRE
  * layout — sample, ranks, cut points, assignment, and per-shard
  * extents — with no exported state.
  *
  * Scale shape: one narrow filter pass yields the ~25% sample; the rank
  * sort runs on the SAMPLE only (the single-task window is bounded by
  * the sample size — at 100 TB you lower the threshold, not the
  * design); cut points are k−1 driver-held longs (the bounded-scalar
  * pattern of the IVF centroids); assignment is a 15-element
  * higher-order fold per row (no join, no shuffle); the only shuffle is
  * the k-sized stats aggregation. The write path composes as
  * `repartition(shard) + sortWithinPartitions(rkey)` — one shuffle, no
  * global sort — with q_export_manifest's manifest pattern.
  *
  * The rank key is `n_chars·2³² + doc_id`: unique by construction, so
  * sample ranks, cut points, and shard extents are all deterministic
  * with no tie rule needed. Output gates the whole layout: per-shard
  * row counts (balance), min/max keys (ranges must not overlap — the
  * global-order witness), and an id checksum. */
object RangeShard {

  private val K = 16

  def qRangeShard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        (col("n_chars").cast("long") * lit(4294967296L) + col("doc_id"))
          .as("rkey"))
    val sample = d.filter(
      substring(md5(concat(col("doc_id").cast("string"), lit(":rs"))),
        1, 4) <= "3fff")
    val m = sample.count()
    require(m >= K, s"range-shard sample too small: $m rows")
    // cut points at ranks ⌊i·m/K⌋ — the sample sort is single-task by
    // design (unpartitioned window), bounded by the sample size
    val ranks = (1 until K).map(i => i * m / K)
    val bounds = sample.select(col("rkey"))
      .withColumn("rn", row_number().over(Window.orderBy("rkey")))
      .filter(col("rn").isin(ranks: _*))
      .orderBy("rkey").collect().map(_.getLong(0))
    val bArr = array(bounds.toIndexedSeq.map(lit): _*)
    // shard = |{cut points <= key}|: 0 below the first cut, K-1 at top
    d.withColumn("shard", size(filter(bArr, b => b <= col("rkey"))))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min("rkey").as("min_key"), max("rkey").as("max_key"),
        sum("doc_id").cast("bigint").as("sum_ids"))
      .select(col("shard").cast("int").as("shard"), col("n_rows"),
        col("min_key"), col("max_key"), col("sum_ids"))
      .orderBy("shard")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_shard" -> qRangeShard _)

  /** The oracle re-derives the FULL layout: same hash sample, same
    * ranks, same cut points, same assignment fold, same stats. */
  val oracles: Map[String, String] = Map(
    "q_range_shard" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(n_chars AS BIGINT) * 4294967296 + doc_id AS rkey
        |  FROM documents),
        |s AS (SELECT rkey FROM d
        |      WHERE substr(md5(doc_id::VARCHAR || ':rs'), 1, 4) <= '3fff'),
        |r AS (SELECT rkey, ROW_NUMBER() OVER (ORDER BY rkey) AS rn FROM s),
        |m AS (SELECT COUNT(*) AS m FROM s),
        |b AS (SELECT r.rkey AS bound
        |      FROM r, m, generate_series(1, 15) g(i)
        |      WHERE r.rn = (g.i * m.m) // 16),
        |a AS (SELECT d.doc_id, d.rkey,
        |        (SELECT COUNT(*) FROM b WHERE b.bound <= d.rkey) AS shard
        |      FROM d)
        |SELECT CAST(shard AS INT) AS shard,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(MIN(rkey) AS BIGINT) AS min_key,
        |  CAST(MAX(rkey) AS BIGINT) AS max_key,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM a GROUP BY 1 ORDER BY shard""".stripMargin)
}
