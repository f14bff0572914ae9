package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Delta-join maintenance: the refresh must equal the full recompute,
  * and the fixture must actually exercise the ΔA⋈ΔB cross term (else
  * the gate would pass with the classic omission bug). */
class DeltaSpec extends SparkSpec {

  private val dir = sf("sf0.01")

  test("incremental refresh == direct full join") {
    val inc = Delta.qIncrementalJoin(spark, dir).collect()
    val cust = graft.Tables(spark, dir, "customer")
    val ord = graft.Tables(spark, dir, "orders")
    val nat = graft.Tables(spark, dir, "nation")
    val full = cust.join(ord, col("c_custkey") === col("o_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(graft.Tables.dec(col("o_totalprice"))).cast("double")
          .as("revenue"))
      .orderBy("n_name").collect()
    assert(inc.toSeq === full.toSeq)
  }

  test("snapshot diff: identities reconcile, every change class realized") {
    val rows = Delta.qSnapshotDiff(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet === Set("added", "removed", "changed", "unchanged"))
    val v1 = graft.Tables(spark, dir, "orders").count()
    assert(rows("removed")._1 + rows("changed")._1 +
      rows("unchanged")._1 === v1)
    // every changed row is exactly +1.00
    assert(math.abs(rows("changed")._2 - rows("changed")._1) < 1e-9)
    assert(math.abs(rows("unchanged")._2) < 1e-9)
  }

  test("the fixture exercises the cross term (new-cust x new-order rows exist)") {
    val cust = graft.Tables(spark, dir, "customer")
    val ord = graft.Tables(spark, dir, "orders")
    val n = cust.filter(col("c_custkey") % 7 === 3)
      .join(ord.filter(col("o_orderkey") % 5 === 4),
        col("c_custkey") === col("o_custkey"))
      .count()
    assert(n > 0, "cross term empty: gate cannot witness the omission bug")
  }
}
