package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.Tables.dec

/** Skew-mitigation pattern: salted two-stage aggregation. At 100 TB a
  * hot grouping key funnels into one reduce task; salting splits it into
  * S sub-keys for the partial stage, then a second (tiny) stage merges the
  * S partials. This spec proves the rewrite is result-identical on a
  * deliberately skewed dataset (decimal-exact sums, so equality is exact,
  * not approximate). */
class SkewSpec extends SparkSpec {

  test("saltedAgg equals direct aggregation for random data, keys, and salt counts") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // Zipfian-ish key pool (one hot key) + 2-decimal measures (exact in
    // Tables.dec); salt column deliberately CORRELATED with rows, not keys
    val rowGen = for {
      k <- Gen.frequency((8, Gen.const("hot")), (2, Gen.oneOf("a", "b", "c")))
      v <- Gen.choose(-99999, 99999).map(_ / 100.0)
      id <- Gen.choose(0L, 1000L)
    } yield (k, v, id)
    val prop = Prop.forAll(Gen.listOfN(60, rowGen), Gen.choose(1, 16)) {
      (rows: List[(String, Double, Long)], nSalts: Int) =>
        import spark.implicits._
        val df = rows.toDF("key", "v", "id")
        def collect(d: org.apache.spark.sql.DataFrame) =
          d.collect().map(r => r.getString(0) ->
            (Option(r.getDecimal(1)).map(_.toPlainString), r.getLong(2),
              r.getLong(3))).toMap
        val direct = collect(df.groupBy("key").agg(
          sum(dec(col("v"))).as("s"), count(lit(1)).as("n"),
          min(col("id")).as("m")))
        val salted = collect(Skew.saltedAgg(df, Seq("key"), col("id"), nSalts,
          Seq(Skew.sumDec("s", col("v")), Skew.countAll("n"),
            Skew.minOf("m", col("id")))))
        direct == salted
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  test("salted two-stage aggregation equals direct aggregation exactly") {
    val li = Tables(spark, sf("sf0.001"), "lineitem")
      // skew it: collapse most keys onto one hot flag value
      .withColumn("key", when(col("l_orderkey") % 10 < 8, lit("HOT"))
        .otherwise(col("l_returnflag")))

    val direct = li.groupBy("key")
      .agg(sum(dec(col("l_quantity"))).as("q"), count(lit(1)).as("n"))

    val salted = Skew.saltedAgg(li, Seq("key"), col("l_orderkey"), 16, Seq(
      Skew.sumDec("q", col("l_quantity")),
      Skew.countAll("n")))

    val d = direct.collect().map(r => r.getString(0) ->
      (r.getDecimal(1), r.getLong(2))).toMap
    val s = salted.collect().map(r => r.getString(0) ->
      (r.getDecimal(1), r.getLong(2))).toMap
    assert(s.keySet === d.keySet)
    d.foreach { case (k, (q, n)) =>
      assert(s(k)._1.compareTo(q) === 0, s"sum for $k")
      assert(s(k)._2 === n, s"count for $k")
    }
  }

  test("saltedJoin equals the plain join and stays a shuffle join on (key, salt)") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val toks = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
    val dim = toks.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
    val salted = Skew.saltedJoin(toks, dim, "token",
      xxhash64(col("doc_id")), nSalts = 8)
    val plain = toks.join(dim, "token")
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2))
    assert(salted.select("token", "doc_id", "df").collect().map(key).sorted
      .toSeq === plain.select("token", "doc_id", "df").collect().map(key)
      .sorted.toSeq)
    val plan = salted.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      "salt demo degraded to a broadcast join")
    assert(plan.contains("__salt"), "join lost the salt key")
  }
}
