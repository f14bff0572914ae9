package graft.ops

import graft.SparkSpec

/** TPC-H batch two (ops.Tpch): result sanity on the sf0.001 fixture plus
  * the plan shapes the Scaladocs promise (the oracle hash gate at sf0.01
  * is the value-level check; these pin the SCALE-relevant structure). */
class TpchSpec extends SparkSpec {

  private def run(q: String) =
    graft.SparkEntry.queries(q)(spark, sf("sf0.001"))

  private def plan(q: String): String =
    run(q).queryExecution.executedPlan.toString

  // NOTE: plan toString TRUNCATES the PushedFilters list — assert on the
  // scan's DataFilters / Filter text, which prints the full predicates.
  test("q6: all three predicates and only two columns reach the scan") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains(">= 0.03)"), p)
    assert(p.contains("< 24.0)"), p)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "IsNotNull(l_discount), IsNotNull(l_quantity)"), p)
    // column pruning: money columns not in the filter set stay unread
    assert(!p.contains("l_tax"), p)
  }

  test("q4: correlated EXISTS decorrelates to ONE semi join, no distinct") {
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), p)
    // the lateness predicate must ride the join, not a post-join filter
    assert(p.contains("INTERVAL '60' DAY"), p)
    // a semi join already dedups; a Distinct/expand would double-shuffle
    assert(!p.contains("HashAggregate(keys=[o_orderkey"), p)
    val rows = run("q4_order_priority").collect()
    assert(rows.nonEmpty)
    // counts are per-priority positive counts
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("q19: side-local predicate envelopes push to both scans") {
    val p = plan("q19_disjunctive")
    // lineitem side: quantity envelope as an OR-of-ranges below the join
    assert(p.contains("(l_quantity#") && p.contains(">= 1.0)"), p)
    // part side: brand/size disjunction below the join
    assert(p.contains("= Brand#12)"), p)
    val rev = run("q19_disjunctive").collect()(0)
    assert(!rev.isNullAt(0) && rev.getDouble(0) > 0)
  }

  test("q18: threshold respected and ordering total") {
    val rows = run("q18_large_orders").collect()
    assert(rows.forall(_.getDouble(5) > 300))
    val prices = rows.map(_.getDouble(4))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("q21: sole-late-supplier counts match an independent local recompute") {
    // recompute on the driver from raw collects (sf0.001 is tiny): late
    // lines, multi-supplier orders, sole-late condition
    val dir = sf("sf0.001")
    // the fixture's dates surface as TIMESTAMP_NTZ on Spark 4.1 — cast to
    // instant TIMESTAMP (UTC session) so collect() yields java.sql.Timestamp
    import org.apache.spark.sql.functions.col
    val li = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate").cast("timestamp")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val od = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast("timestamp"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toMap
    val names = graft.Tables(spark, dir, "supplier")
      .select("s_suppkey", "s_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // per-LINE late rows, multiplicity kept: Q21's l1 ranges over late
    // lineitem rows, so a supplier twice-late in one order counts twice
    val lateLines = li.filter { case (ok, _, ship) =>
      ship.getTime > od(ok).getTime + 90L * 86400 * 1000
    }.map { case (ok, sk, _) => (ok, sk) }
    val suppsPerOrder = li.map(t => (t._1, t._2)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val latePerOrder = lateLines.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val expected = lateLines.filter { case (ok, sk) =>
      (suppsPerOrder(ok) - sk).nonEmpty && (latePerOrder(ok) - sk).isEmpty
    }.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      .map { case (sk, n) => (names(sk), n) }
    val got = run("q21_waiting_supplier").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // LIMIT 50 truncates the tail; every returned row must match exactly
    got.foreach { case (s, n) => assert(expected.get(s).contains(n), s) }
    assert(got.nonEmpty)
  }

  test("q21: correlated EXISTS/NOT EXISTS form equals the registered window form") {
    val a = run("q21_waiting_supplier").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = Tpch.q21CorrelatedForm(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a === b)
  }

  test("q22: every reported customer group is dormant and above-mean") {
    val dir = sf("sf0.001")
    val rows = run("q22_dormant_customers").collect()
    assert(rows.nonEmpty)
    // cntry strictly increasing = deterministic total order
    val ks = rows.map(_.getInt(0))
    assert(ks.sameElements(ks.sorted.distinct))
  }

  test("q8: market share is a fraction; q13: distribution sums to all customers") {
    val shares = run("q8_market_share").collect()
    assert(shares.nonEmpty)
    shares.foreach { r =>
      val s = r.getDouble(1)
      assert(s >= 0.0 && s <= 1.0, s"share $s out of [0,1]")
    }
    val dist = run("q13_order_distribution").collect()
    val nCust = graft.Tables(spark, sf("sf0.001"), "customer").count()
    assert(dist.map(_.getLong(1)).sum === nCust) // every customer in exactly one bucket
  }

  test("q15: all rows tie at the max; q17: one non-null scalar") {
    val top = run("q15_top_supplier").collect()
    assert(top.nonEmpty)
    assert(top.map(_.getDouble(2)).distinct.length === 1) // all equal the max
    val q17 = run("q17_small_quantity").collect()
    assert(q17.length === 1 && !q17(0).isNullAt(0) && q17(0).getDouble(0) > 0)
  }

  test("q10/q14/q16 return sane shapes") {
    assert(run("q10_returned_items").collect().length <= 20)
    val promo = run("q14_promo_effect").collect()(0).getDouble(0)
    assert(promo > 0 && promo < 100, promo)
    val sv = run("q16_supplier_variety").collect()
    assert(sv.nonEmpty)
    assert(sv.forall(_.getLong(3) > 0))
  }
}
