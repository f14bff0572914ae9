package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Content-defined chunking (CDC) — byte-level dedup of a crawl corpus.
  * The storage-dedup counterpart of the document-level near-dup family:
  * re-crawled or boilerplate-heavy documents share long byte runs that
  * whole-document hashing misses, and FIXED-size blocks lose alignment
  * after a single insertion. A content-defined chunker (LBFS lineage,
  * Muthitacharoen et al. SOSP'01; gear hash per Xia et al.'s FastCDC,
  * USENIX ATC'16) cuts where the CONTENT says so, so shared runs chunk
  * identically regardless of offset shifts.
  *
  * Chunker spec (both engines implement it independently):
  *  - gear rolling hash over utf-8 bytes, h' = (2h + gear[b]) mod 2^32,
  *    h reset to 0 at each chunk start; gear = 256 splitmix64-derived
  *    constants masked to 31 bits (exported for the oracle; pinned by
  *    CdcSpec against an independent BigInt splitmix64);
  *  - boundary at the first position p with chunk length >= MIN (32) and
  *    h % 128 == 0; forced at length MAX (512); the last chunk takes the
  *    remainder. Avg chunk ~160 bytes on the fixture.
  *
  * The REPLAY trick that makes this SQL-oracle-able: 2^(p-i) mod 2^32
  * vanishes for p-i >= 32, so once a chunk is >= 32 bytes old the
  * rolling h equals a START-INDEPENDENT 32-byte window hash W_p. The
  * boundary test only ever fires at length >= MIN = 32 — so candidates
  * {p : W_p % 128 == 0} are computable POSITION-WISE (no sequential
  * fold), and chunk selection is a shallow recursive CTE (min candidate
  * in [s+31, s+511], else the cap).
  *
  * Scale shape: the chunker is a narrow map over the binary column
  * (mapPartitions, zero shuffle); the dedup stats are one hash agg on
  * the chunk digest — the same two-stage shape as exact doc dedup, at
  * chunk granularity. At 100 TB the chunk table is the content-
  * addressed store index; nothing here is driver-sided. */
object Cdc {

  private[ops] val Min = 32
  private[ops] val Max = 512
  private[ops] val MaskMod = 128
  private val Mod32 = 1L << 32

  /** splitmix64 (Steele et al., public domain reference constants). */
  private[ops] def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 256 gear constants, masked to 31 bits (keeps every oracle-side
    * product inside BIGINT — see the scaladoc arithmetic bound). */
  private[ops] val Gear: Array[Long] =
    Array.tabulate(256)(i => splitmix64(0x67726166L + i) & 0x7FFFFFFFL)

  /** Chunk [start, len) list for one payload — the reference rolling
    * implementation (reset-at-chunk-start gear hash). */
  private[ops] def chunks(b: Array[Byte]): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var s = 0
    while (s < b.length) {
      var h = 0L
      var p = s
      var end = -1
      val cap = math.min(s + Max - 1, b.length - 1)
      while (end < 0 && p <= cap) {
        h = (2 * h + Gear(b(p) & 0xFF)) % Mod32
        if (p - s + 1 >= Min && h % MaskMod == 0) end = p
        else if (p == cap) end = cap
        p += 1
      }
      out += ((s, end - s + 1))
      s = end + 1
    }
    out.result()
  }

  /** Chunk digest = md5 over the UPPERCASE HEX of the chunk bytes (not
    * the raw bytes): this DuckDB build has no md5(BLOB) overload, and a
    * digest of the hex string is equally content-addressed (hex is a
    * bijection) while computable as md5(substr(hex(blob), ...)) there.
    *
    * The MessageDigest is per-thread, not per-chunk: at ~160-byte
    * average chunks a corpus partition digests millions of chunks, and
    * getInstance's provider lookup + allocation in that loop is the
    * codec-per-row anti-pattern. digest() resets the instance. */
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  private val HexU = "0123456789ABCDEF".getBytes("US-ASCII")

  private def md5hex(b: Array[Byte], off: Int, len: Int): String = {
    val hex = new Array[Byte](len * 2)
    var i = 0
    while (i < len) {
      val v = b(off + i) & 0xFF
      hex(2 * i) = HexU(v >> 4)
      hex(2 * i + 1) = HexU(v & 0xF)
      i += 1
    }
    md5Local.get().digest(hex).map(x => f"$x%02x").mkString
  }

  /** The session-shared chunk table (doc_id, idx, start, len, chunk_md5). */
  private[graft] def chunkTable(spark: SparkSession, dir: String): DataFrame =
    Tables.materializeSharedBy(spark, "cdcchunks", dir) {
      import spark.implicits._
      Tables(spark, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, bytes) =>
          chunks(bytes).zipWithIndex.map { case ((s, l), i) =>
            (id, i, s, l, md5hex(bytes, s, l))
          }
        }).toDF("doc_id", "idx", "start", "len", "chunk_md5")
    }

  /** The gear table as a DataFrame (exported for the oracle replay). */
  private def gearTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Gear.toSeq.zipWithIndex.map { case (g, i) => (i, g) }.toDF("i", "g")
  }

  /** Every chunk of every document — boundaries AND content digests.
    * Hash-gated: the oracle re-derives all of it in DuckDB from the
    * corpus + the exported gear constants (position-wise window hashes,
    * then the recursive chunk-selection CTE, then md5 over the blob
    * slices). A boundary bug, hash bug, or digest bug on either side
    * breaks the gate. */
  def qCdcChunks(spark: SparkSession, dir: String): DataFrame = {
    graft.OracleExport.export(gearTable(spark), "cdcgear", dir)
    chunkTable(spark, dir).orderBy("doc_id", "idx")
  }

  /** Corpus-level byte-dedup report over the chunk table: how many
    * bytes a content-addressed store would hold vs raw. Exact integer
    * witnesses only. */
  def qCdcDedup(spark: SparkSession, dir: String): DataFrame = {
    graft.OracleExport.export(gearTable(spark), "cdcgear", dir)
    val ch = chunkTable(spark, dir)
    // min, not first: equal-digest chunks have equal len, but first() is
    // formally nondeterministic and would taint the invariance sweep
    val perDigest = ch.groupBy("chunk_md5")
      .agg(count(lit(1)).as("cnt"), min(col("len")).as("len"))
    perDigest.agg(
      sum(col("cnt")).cast("bigint").as("n_chunks"),
      count(lit(1)).cast("bigint").as("n_distinct"),
      sum(col("cnt") * col("len")).cast("bigint").as("total_bytes"),
      sum(col("len")).cast("bigint").as("distinct_bytes"),
      (sum(col("cnt") * col("len")) - sum(col("len")))
        .cast("bigint").as("dup_bytes"))
  }

  /** The incremental re-crawl path — the use case CDC exists for: a new
    * snapshot's documents dedup against the EXISTING chunk index with no
    * realignment scans. The "new snapshot" here is a deterministic
    * prefix edit of every 10th document ("UPDATE " prepended) — a shift
    * that kills fixed-block dedup outright; content-defined boundaries
    * resynchronize after the first common cut (pinned in CdcSpec), so
    * most chunk digests still hit the index. Per edited doc: chunk
    * counts and reused-vs-new byte totals against the baseline index.
    * Shuffle shape: chunk the delta (narrow map over the EDITED docs
    * only — cost ∝ |batch|, never |index| scans), one digest-keyed
    * semi-join against the index — identical to q_dedup_incremental's
    * batch-probes-index discipline at chunk granularity. */
  def qCdcIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.OracleExport.export(gearTable(spark), "cdcgear", dir)
    val index = chunkTable(spark, dir).select("chunk_md5").distinct()
    val edited = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        encode(concat(lit("UPDATE "), col("text")), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        chunks(bytes).map { case (s, l) => (id, l, md5hex(bytes, s, l)) }
      }).toDF("doc_id", "len", "chunk_md5")
    edited
      .join(index.withColumn("hit", lit(1)), Seq("chunk_md5"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("n_chunks"),
        sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_reused"),
        sum(col("len") * coalesce(col("hit"), lit(0)))
          .cast("bigint").as("reused_bytes"),
        sum(col("len") * (lit(1) - coalesce(col("hit"), lit(0))))
          .cast("bigint").as("new_bytes"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_chunks" -> qCdcChunks _,
    "q_cdc_dedup" -> qCdcDedup _,
    "q_cdc_incremental" -> qCdcIncremental _)

  /** Shared oracle CTE prefix: bytes → window hashes → candidate
    * positions → recursive chunk selection → chunk rows. CTE names are
    * prefixed with `ns` so two corpora (baseline + edited snapshot) can
    * be chunked in one statement; `docsSql` supplies (doc_id, text). */
  private def chunkCte: String =
    chunkCteNs("", "SELECT doc_id, text FROM documents", withGear = true)

  private def chunkCteNs(ns: String, docsSql: String,
      withGear: Boolean): String = {
    val gearCtes =
      s"""gear AS (
         |  SELECT list(g ORDER BY i) AS gl
         |  FROM '${graft.OracleExport.oraclePath("cdcgear")}'),
         |p2 AS ( -- 2^k mod 2^32 for k = 0..31
         |  SELECT list_transform(range(32), k ->
         |    CAST(power(2, CAST(k AS INT)) AS BIGINT)) AS p2l),
         |""".stripMargin
    (if (withGear) gearCtes else "") +
      s"""${ns}d AS (
         |  SELECT doc_id, hex(encode(text)) AS h,
         |         octet_length(encode(text)) AS n
         |  FROM ($docsSql)),
         |${ns}bv AS ( -- byte values, then per-position 32-byte window hashes
         |  SELECT doc_id, n,
         |    list_transform(range(n), i -> CAST('0x' ||
         |      substr(h, CAST(2 * i + 1 AS INT), 2) AS BIGINT)) AS b
         |  FROM ${ns}d),
         |${ns}wh AS ( -- W_p = sum(gear[b_(p-k)] * 2^k) mod 2^32, k = 0..31
         |  SELECT doc_id, n,
         |    list_transform(range(n), p ->
         |      CASE WHEN p < 31 THEN -1
         |      ELSE list_sum(list_transform(range(32), k ->
         |        (gl[CAST(b[CAST(p - k + 1 AS INT)] AS INT) + 1]
         |          * p2l[CAST(k + 1 AS INT)]) % 4294967296)) % 4294967296
         |      END) AS w
         |  FROM ${ns}bv, gear, p2),
         |${ns}cand AS ( -- boundary-candidate positions (hash % 128 == 0)
         |  SELECT doc_id, n, list_sort(list_filter(
         |    list_transform(range(n), p ->
         |      CASE WHEN p >= 31 AND w[CAST(p + 1 AS INT)] % ${MaskMod} = 0
         |           THEN p ELSE -1 END), x -> x >= 0)) AS cands
         |  FROM ${ns}wh),
         |${ns}sel(doc_id, s, idx, e) AS ( -- recursive chunk selection
         |  SELECT doc_id, 0, 0,
         |    COALESCE(list_min(list_filter(cands,
         |      p -> p >= ${Min - 1} AND p <= LEAST(${Max - 1}, n - 1))),
         |      LEAST(${Max - 1}, n - 1))
         |  FROM ${ns}cand WHERE n > 0
         |  UNION ALL
         |  SELECT w.doc_id, w.e + 1, w.idx + 1,
         |    COALESCE(list_min(list_filter(c.cands,
         |      p -> p >= w.e + ${Min} AND p <= LEAST(w.e + ${Max}, c.n - 1))),
         |      LEAST(w.e + ${Max}, c.n - 1))
         |  FROM ${ns}sel w JOIN ${ns}cand c USING (doc_id)
         |  WHERE w.e + 1 < c.n),
         |${ns}ch AS ( -- digest = md5 over the hex slice (no md5(BLOB) here)
         |  SELECT s.doc_id, s.idx, s.s AS start, s.e - s.s + 1 AS len,
         |    md5(substr(d.h, CAST(2 * s.s + 1 AS INT),
         |        CAST(2 * (s.e - s.s + 1) AS INT))) AS chunk_md5
         |  FROM ${ns}sel s JOIN ${ns}d d USING (doc_id))""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_cdc_chunks" ->
      s"""WITH RECURSIVE $chunkCte
         |SELECT doc_id, CAST(idx AS INT) AS idx, CAST(start AS INT) AS start,
         |  CAST(len AS INT) AS len, chunk_md5
         |FROM ch ORDER BY doc_id, idx""".stripMargin,
    // Full replay of BOTH corpora: the baseline index from documents and
    // the edited snapshot's chunks from the same prefix-edit expression,
    // then the digest-keyed classification — boundaries, digests, and
    // reuse accounting all derived twice.
    "q_cdc_incremental" ->
      s"""WITH RECURSIVE $chunkCte,
         |${chunkCteNs("e",
            "SELECT doc_id, 'UPDATE ' || text AS text FROM documents " +
              "WHERE doc_id % 10 = 0", withGear = false)},
         |idx AS (SELECT DISTINCT chunk_md5 FROM ch)
         |SELECT e.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |  CAST(SUM(CASE WHEN i.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_reused,
         |  CAST(SUM(CASE WHEN i.chunk_md5 IS NOT NULL THEN e.len ELSE 0 END)
         |       AS BIGINT) AS reused_bytes,
         |  CAST(SUM(CASE WHEN i.chunk_md5 IS NULL THEN e.len ELSE 0 END)
         |       AS BIGINT) AS new_bytes
         |FROM ech e LEFT JOIN idx i USING (chunk_md5)
         |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin,
    "q_cdc_dedup" ->
      s"""WITH RECURSIVE $chunkCte,
         |pd AS (
         |  SELECT chunk_md5, COUNT(*) AS cnt, MIN(len) AS len
         |  FROM ch GROUP BY chunk_md5)
         |SELECT CAST(SUM(cnt) AS BIGINT) AS n_chunks,
         |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |  CAST(SUM(cnt * len) AS BIGINT) AS total_bytes,
         |  CAST(SUM(len) AS BIGINT) AS distinct_bytes,
         |  CAST(SUM(cnt * len) - SUM(len) AS BIGINT) AS dup_bytes
         |FROM pd""".stripMargin)
}
