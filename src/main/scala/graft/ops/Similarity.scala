package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Near-duplicate detection over `documents`: exact shingle-Jaccard with
  * PPJoin-style prefix filtering, banded MinHash-LSH, and SimHash with
  * chunk banding. The reference has no similarity operators (SURVEY.md
  * §2.4); these are the training-data-curation ops the rebuild adds,
  * following the banded-join pattern of V-SMART-Join (PAPERS.md) rather
  * than any O(n²) cross join.
  *
  * Scale design, per operator:
  *  - exact Jaccard: candidates come from a self-join on PREFIX shingles
  *    only (global rarity order) — provably complete for the threshold,
  *    and it skips exactly the hot high-df shingles that would skew a
  *    naive inverted-index join;
  *  - MinHash-LSH: shuffle key is (band, signature) — equal-signature
  *    buckets only, never all pairs;
  *  - SimHash: shuffle key is (chunk index, 16-bit chunk) — by pigeonhole
  *    any pair within Hamming distance 3 shares one of 4 chunks, so the
  *    banding is exact (recall 1.0) for the ≤3 threshold.
  */
object Similarity {

  /** Word 3-shingles, one row per distinct (doc_id, shingle).
    * Deduplication happens ROW-LOCALLY via array_distinct before the
    * explode — per-doc shingle dedup needs no shuffle, and this subtree is
    * replicated into every consumer branch, so a post-explode .distinct()
    * would pay its exchange once per branch. */
  def shingles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")))
        .as("shingle"))

  private def shingleSets(sh: DataFrame): DataFrame =
    sh.groupBy("doc_id")
      .agg(collect_set(col("shingle")).as("sset"), count(lit(1)).as("n"))

  /** Exact all-pairs Jaccard >= t via prefix filtering (PPJoin family):
    * order every doc's shingles by global (document-frequency, shingle)
    * rarity, keep only the first n - ceil(t*n) + 1 as join keys — any pair
    * with J >= t must collide on at least one prefix shingle, so the
    * candidate set is complete; then verify exactly on full shingle sets. */
  def qJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val t = 0.8
    // the shingle set feeds 5 plan branches and Catalyst replicates the
    // scan+explode+distinct subtree; measured A/B: re-running the codegen
    // subtree beats localCheckpoint block ser/deser here (3.5-4.2s vs
    // 4.8-5.8s warm), so no materialization
    val sh = shingles(spark, dir)
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id").orderBy(asc("df"), asc("shingle"))
    // the self-join key is xxhash64(shingle), not the string: 8-byte keys
    // keep the exchange small and the join-strategy choice stable (a
    // borderline-size broadcast of the string side caused 3-6x run-to-run
    // swings); a hash collision can only ADD a candidate pair, which the
    // exact verification below filters out
    val prefix = sh.join(dfreq, "shingle")
      .withColumn("pos", row_number().over(w))
      .join(sz, "doc_id")
      .filter(col("pos") <= col("n") - ceil(col("n") * t) + 1)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh_h"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sh_h") === col("b.sh_h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sets = shingleSets(sh)
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sset").as("sa"),
        col("n").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sset").as("sb"),
        col("n").as("nb")), "doc_b")
      .withColumn("common",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jac",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jac") >= t)
      .select("doc_a", "doc_b", "common", "jac")
      .orderBy("doc_a", "doc_b")
  }

  private val MinhashK = 32
  private val Bands = 8
  private val RowsPerBand = MinhashK / Bands

  /** Banded MinHash-LSH near-dup candidates, verified with exact Jaccard.
    * k=32 salted xxhash64 min-hashes, 8 bands × 4 rows: P(candidate) at
    * J=0.8 is 1-(1-0.8^4)^8 ≈ 0.99 — candidates are then exactly verified,
    * so output precision is 1.0 (recall is the LSH probability; hence no
    * SQL oracle — the driver records a rows-only check). */
  def qMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val t = 0.7
    val sh = shingles(spark, dir) // no checkpoint — see qJaccardPairs
    val minhashCols = (0 until MinhashK).map(i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"mh$i"))
    val minh = sh.groupBy("doc_id").agg(minhashCols.head, minhashCols.tail: _*)
    val bandStructs = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until RowsPerBand).map(r =>
          col(s"mh${b * RowsPerBand + r}")): _*).as("sig"))
    }
    val banded = minh
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sets = shingleSets(sh)
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sset").as("sa"),
        col("n").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sset").as("sb"),
        col("n").as("nb")), "doc_b")
      .withColumn("common",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jac",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jac") >= t)
      .select("doc_a", "doc_b", "jac")
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash near-dup pairs within Hamming distance 3.
    * Per-token xxhash64 bit votes (+1/-1 per bit, token multiset) via the
    * custom [[graft.functions.SimHashAgg]] aggregate (one int[64] buffer
    * vs 64 conditional-SUM slots), then candidate generation by 4×16-bit
    * chunk equality — exact for the ≤3 threshold by pigeonhole.
    * No oracle: xxhash64 is engine-specific. */
  def qSimhashNeardup(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val hashed = toks.groupBy("doc_id")
      .agg(graft.functions.SimHashAgg.simhash(col("h")).as("simhash"))
    val chunks = hashed.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c => struct(lit(c).as("c"),
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))
          .as("chunk"))): _*)).as("cs"))
      .select(col("doc_id"), col("simhash"),
        col("cs.c").as("c"), col("cs.chunk").as("chunk"))
    chunks.as("a").join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** End-to-end dedup pipeline, the composition a corpus-curation job
    * runs: (1) exact dedup — keep the min doc_id of each content-hash
    * group; (2) near-dup removal — among exact survivors, drop any doc
    * with a Jaccard >= 0.8 partner of smaller id (single greedy pass by
    * id, NOT transitive closure — deterministic and SQL-expressible).
    * Returns the clean corpus. */
  def qDedupPipeline(spark: SparkSession, dir: String): DataFrame = {
    val t = 0.8
    val docs = Tables(spark, dir, "documents")
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val survivors = docs
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("doc_id", "lang", "n_chars")
    val sh = shingles(spark, dir)
      .join(survivors.select("doc_id"), "doc_id")
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pw = Window.partitionBy("doc_id").orderBy(asc("df"), asc("shingle"))
    val prefix = sh.join(dfreq, "shingle")
      .withColumn("pos", row_number().over(pw))
      .join(sz, "doc_id")
      .filter(col("pos") <= col("n") - ceil(col("n") * t) + 1)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh_h"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sh_h") === col("b.sh_h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sets = shingleSets(sh)
    val removed = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sset").as("sa"),
        col("n").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sset").as("sb"),
        col("n").as("nb")), "doc_b")
      .withColumn("common", size(array_intersect(col("sa"), col("sb"))))
      .filter(col("common").cast("double")
        / (col("na") + col("nb") - col("common")) >= t)
      .select(col("doc_b").as("doc_id")).distinct()
    survivors.join(removed, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_pipeline" -> qDedupPipeline _,
    "q_jaccard_pairs" -> qJaccardPairs _,
    "q_minhash_lsh" -> qMinhashLsh _,
    "q_simhash_neardup" -> qSimhashNeardup _)

  /** q_minhash_lsh / q_simhash_neardup are deliberately oracle-less:
    * their semantics depend on engine-specific hash functions (recall of
    * LSH banding, xxhash64 bit patterns) — rows-only checks. */
  val oracles: Map[String, String] = Map(
    "q_dedup_pipeline" ->
      """WITH survivors AS (
        |  SELECT doc_id, lang, n_chars, text FROM (
        |    SELECT doc_id, lang, n_chars, text,
        |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn
        |    FROM documents) s WHERE rn = 1),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') l
        |  FROM survivors),
        |sh AS (
        |  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS shingle
        |  FROM toks, UNNEST(range(1, len(l) - 1)) u(i)),
        |sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
        |p AS (
        |  SELECT a.doc_id da, b.doc_id db, COUNT(*) common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |removed AS (
        |  SELECT DISTINCT db AS doc_id
        |  FROM p JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
        |  WHERE CAST(common AS DOUBLE) / (x.n + y.n - common) >= 0.8)
        |SELECT doc_id, lang, n_chars FROM survivors
        |WHERE doc_id NOT IN (SELECT doc_id FROM removed)
        |ORDER BY doc_id""".stripMargin,
    "q_jaccard_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') l
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS shingle
        |  FROM toks, UNNEST(range(1, len(l) - 1)) u(i)),
        |sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
        |p AS (
        |  SELECT a.doc_id da, b.doc_id db, COUNT(*) common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da AS doc_a, db AS doc_b, CAST(common AS BIGINT) AS common,
        |  CAST(common AS DOUBLE) / (x.n + y.n - common) AS jac
        |FROM p JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
        |WHERE CAST(common AS DOUBLE) / (x.n + y.n - common) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin)
}
