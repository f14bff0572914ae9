package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ThetaSketchAgg.{thetaSketch, thetaEstimate, thetaSetOp}

/** Theta sketch kernel pins: exact mode below the nominal entry count
  * (what the gate oracle relies on), partition-order invariance (what
  * hash-gating relies on), and the sampling-mode error envelope above
  * nominal (what production at real cardinalities relies on). */
class ThetaSpec extends SparkSpec {

  test("exact mode: estimates and set ops equal exact set algebra") {
    import spark.implicits._
    // two overlapping key sets, both far below 4096
    val a = (0L until 600L).toDF("k").withColumn("g", lit("a"))
    val b = (400L until 900L).toDF("k").withColumn("g", lit("b"))
    val sk = a.unionByName(b).groupBy("g").agg(thetaSketch(col("k")).as("sk"))
    val row = sk.filter(col("g") === "a").select(col("sk").as("sa"))
      .crossJoin(sk.filter(col("g") === "b").select(col("sk").as("sb")))
      .select(thetaEstimate(col("sa")).as("ea"),
        thetaEstimate(col("sb")).as("eb"),
        thetaSetOp(col("sa"), col("sb"), "intersect").as("i"),
        thetaSetOp(col("sa"), col("sb"), "union").as("u"),
        thetaSetOp(col("sa"), col("sb"), "anotb").as("d"))
      .head()
    assert(row.getLong(0) == 600L)
    assert(row.getLong(1) == 500L)
    assert(row.getLong(2) == 200L) // 400..599
    assert(row.getLong(3) == 900L) // 0..899
    assert(row.getLong(4) == 400L) // 0..399
  }

  test("estimates are partition-order invariant") {
    import spark.implicits._
    val ks = (0L until 3000L).map(k => k * 2654435761L % 100003L)
    def est(parts: Int): Long = ks.toDF("k").repartition(parts)
      .agg(thetaEstimate(thetaSketch(col("k"))).as("e"))
      .head().getLong(0)
    assert(est(1) == est(13))
  }

  test("sampling mode (>4096 distinct): estimate within 5% of truth") {
    import spark.implicits._
    val n = 100000L
    val e = (0L until n).toDF("k")
      .agg(thetaEstimate(thetaSketch(col("k"))).as("e")).head().getLong(0)
    assert(math.abs(e - n).toDouble / n < 0.05, s"estimate $e vs $n")
  }
}
