package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column handling: media as opaque `binary` payloads with typed
  * metadata, plus a batched decode/feature-extract stage.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake ([[FakeDecode]]) — but the Spark-side
  * plumbing is real and tested: binary columns, typed Dataset rows, a
  * mapPartitions batch stage shaped exactly like a Pandas-UDF/mapInPandas
  * decode (iterator-in/iterator-out, one codec init per partition, never
  * one per row), and fixed-size feature vectors out.
  *
  * Payloads here are the utf-8 bytes of documents.text standing in for
  * media bytes; at 100 TB the same plan reads real bytes from parquet
  * binary columns and the per-partition batching amortizes codec setup. */
object Multimodal {

  /** One "media" row: id + raw bytes + declared metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], declared_len: Long)

  /** Deterministic fake decoder — stands in for an image/audio codec.
    * Batch-oriented: constructed once per partition (like a codec). */
  final class FakeDecode {
    /** "Decode" → fake (width, height) from payload size. */
    def dims(payload: Array[Byte]): (Int, Int) =
      (payload.length % 640, payload.length % 480)
    /** "Feature-extract" → 16-bin histogram of high nibbles. */
    def features(payload: Array[Byte]): Array[Long] = {
      val bins = new Array[Long](16)
      payload.foreach(b => bins((b & 0xF0) >> 4) += 1)
      bins
    }
    /** "Frame-sample" → every 16th byte of the first 128 (stride read). */
    def frameSample(payload: Array[Byte]): Array[Int] =
      payload.take(128).grouped(16).map(_.head.toInt).toArray
  }

  /** documents.text as binary payloads (media stand-in). */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        col("n_chars").cast("long").as("declared_len"))

  /** Metadata audit over binary payloads — byte length + content digest,
    * SQL-expressible → oracle-checked. */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    payloads(spark, dir)
      .select(col("doc_id"),
        length(col("payload")).as("payload_len"),
        sha2(col("payload"), 256).as("digest"),
        col("declared_len"))
      .orderBy("doc_id")

  /** Batched decode + feature extraction through the typed Dataset API.
    * Feature vectors are emitted as comma-joined strings (not raw arrays)
    * so downstream row-comparators can sort/hash the frame.
    *
    * Fully hash-gated (r10): [[FakeDecode]] is pure byte arithmetic, so
    * the oracle recomputes every column INDEPENDENTLY in DuckDB from
    * `hex(encode(text))` — high nibble = odd hex digit, byte value = the
    * digit pair (signed like Scala's Byte.toInt via the >127 branch).
    * No export replay, no circularity: a decode bug on either side fails
    * the hash. */
  def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = payloads(spark, dir).as[MediaRow]
    ds.mapPartitions { rows =>
      val codec = new FakeDecode // one per partition, as a real codec would be
      rows.map { r =>
        val (w, h) = codec.dims(r.payload)
        (r.doc_id, w, h,
          codec.features(r.payload).mkString(","),
          codec.frameSample(r.payload).mkString(","))
      }
    }.toDF("doc_id", "width", "height", "nibble_hist", "frame_sample")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> qMultimodalMeta _,
    "q_multimodal_features" -> qMultimodalFeatures _)

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS payload_len,
        |  sha256(text) AS digest,
        |  n_chars AS declared_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Independent FakeDecode replay over the hex encoding of the payload
    // bytes: odd hex digits are high nibbles (histogram bins), digit
    // pairs are byte values (frame samples, signed like Scala Byte).
    "q_multimodal_features" ->
      """WITH p AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |         octet_length(encode(text)) AS n
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, n,
        |    list_transform(range(n), i ->
        |      strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1)) - 1) AS hi,
        |    list_transform(range(n), i ->
        |      (strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1)) - 1) * 16
        |      + strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1)) - 1) AS bv
        |  FROM p
        |)
        |SELECT doc_id,
        |  CAST(n % 640 AS INT) AS width,
        |  CAST(n % 480 AS INT) AS height,
        |  array_to_string(list_transform(range(16), g ->
        |    CAST(len(list_filter(hi, x -> x = g)) AS VARCHAR)), ',') AS nibble_hist,
        |  array_to_string(list_transform(range(CAST(ceil(least(n,128)/16.0) AS BIGINT)), k ->
        |    CAST(CASE WHEN bv[CAST(16*k+1 AS INT)] > 127
        |              THEN bv[CAST(16*k+1 AS INT)] - 256
        |              ELSE bv[CAST(16*k+1 AS INT)] END AS VARCHAR)), ',') AS frame_sample
        |FROM b ORDER BY doc_id""".stripMargin)
}
