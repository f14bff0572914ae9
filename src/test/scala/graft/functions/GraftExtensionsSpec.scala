package graft.functions

import org.apache.spark.sql.SparkSession
import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("post-hoc registration makes decimal_dot/float_dot SQL-callable") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT decimal_dot(a, b) AS dd, float_dot(a, b) AS fd FROM (
        |  SELECT array(cast(0.5 as float), cast(2.0 as float)) a,
        |         array(cast(4.0 as float), cast(0.25 as float)) b)""".stripMargin)
      .collect().head
    assert(r.getDouble(0) === 2.5)
    assert(r.getDouble(1) === 2.5)
  }

  test("extension builders resolve through the injectFunction tuple shape") {
    // exercise the exact dot-product builder functions the extension
    // injects (the winnow/simhash builders are SQL-tested below)
    GraftExtensions.functions
      .filter { case (name, _, _) => name.endsWith("_dot") }
      .foreach { case (name, info, builder) =>
        assert(info.getName === name)
        val e = builder(Seq(
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            Array(1.0f), org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)),
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            Array(2.0f), org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType))))
        assert(e.eval(null) === 2.0)
      }
  }

  test("winnow + simhash are SQL-callable after registration") {
    GraftExtensions.register(spark)
    val s = "the quick brown fox jumps over the lazy dog"
    val fps = spark.sql(
      s"SELECT winnow_fingerprints('$s', 4, 3) AS fp").collect()
      .head.getSeq[Long](0)
    assert(fps == Winnow.fingerprints(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), 4, 3)
      .toLongArray().toSeq)
    val pos = spark.sql(
      s"SELECT winnow_fingerprint_positions('$s', 4, 3) AS p").collect()
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(pos.map(_.getLong(0)) == fps)
    assert(pos.map(_.getInt(1)) == pos.map(_.getInt(1)).sorted)
    // SQL aggregate form over per-token hashes matches the Column API
    import spark.implicits._
    Seq((1L, "aa"), (1L, "bb"), (2L, "aa"))
      .toDF("doc_id", "tok").createOrReplaceTempView("toks_ext_test")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash64(xxhash64(tok)) AS sh
        |FROM toks_ext_test GROUP BY doc_id ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaCol = Seq((1L, "aa"), (1L, "bb"), (2L, "aa"))
      .toDF("doc_id", "tok")
      .groupBy("doc_id")
      .agg(SimHashAgg.simhash(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("tok"))).as("sh"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql == viaCol)
  }
}
