package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Erasure cascade: counts reconcile per table, the fixture actually
  * erases something at every hop, and the lineitem hop equals an
  * independent recompute of the two-hop closure. */
class ErasureSpec extends SparkSpec {

  test("erasure report reconciles and the cascade is exact") {
    val dir = sf("sf0.001")
    val rows = Erasure.qUserErasure(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("customer", "lineitem", "orders"))
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3),
        s"${r.getString(0)}: before != erased + after")
      assert(r.getLong(2) > 0, s"${r.getString(0)}: cascade erased nothing")
    }
    // independent closure: lineitems of orders of erased customers
    val ord = graft.Tables(spark, dir, "orders")
    val li = graft.Tables(spark, dir, "lineitem")
    val doomedOrders = ord.filter(col("o_custkey") % 37 === 5)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val liErased = li.filter(col("l_orderkey")
      .isin(doomedOrders.toSeq: _*)).count()
    assert(rows.find(_.getString(0) == "lineitem").get.getLong(2) === liErased)
  }
}
