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
    // referential integrity asserted by NAME: a lineitem orderkey absent
    // from orders would otherwise surface as an opaque
    // NoSuchElementException here — and the registered window form would
    // silently DROP such rows while the EXISTS oracle counts them, so a
    // fixture drift must fail loudly, not mask a semantic divergence
    li.foreach { case (ok, _, _) =>
      assert(od.contains(ok), s"lineitem orderkey $ok missing from orders")
    }
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

  test("partsupp derivation matches a driver-side recompute") {
    // the synthetic bridge is the oracle-export input for Q2/Q11/Q20, so
    // its derivation (distinct pairs + xxhash64-derived measures) is
    // pinned here against an independent recompute from raw collects
    import org.apache.spark.sql.functions.{col, xxhash64, lit, pmod}
    val dir = sf("sf0.001")
    val ps = Tpch.partsupp(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getDouble(3))))
      .toMap
    val pairs = graft.Tables(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    assert(ps.keySet === pairs.toSet)
    // recompute the hash-derived measures through Spark's own xxhash64
    // (the derivation contract is "same key pair -> same values")
    import spark.implicits._
    val re = pairs.toSeq.toDF("pk", "sk")
      .select(col("pk"), col("sk"),
        (pmod(xxhash64(col("pk"), col("sk"), lit("availqty")),
          lit(9999L)) + 1).cast("int").as("aq"),
        ((pmod(xxhash64(col("pk"), col("sk"), lit("supplycost")),
          lit(99999L)) + 1).cast("double") / 100).as("sc"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getInt(2), r.getDouble(3)))).toMap
    assert(re === ps)
    ps.values.foreach { case (aq, sc) =>
      assert(aq >= 1 && aq <= 9999, aq)
      assert(sc >= 0.01 && sc <= 999.99, sc)
    }
  }

  test("q2: every row carries its part's regional min cost; order total") {
    val dir = sf("sf0.001")
    val rows = run("q2_min_cost_supplier").collect()
    assert(rows.nonEmpty)
    // recompute the regional min per part from the derived partsupp
    import org.apache.spark.sql.functions.col
    val eurSupp = graft.Tables(spark, dir, "supplier")
      .join(graft.Tables(spark, dir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.Tables(spark, dir, "region")
        .filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val minCost = Tpch.partsupp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .filter(t => eurSupp.contains(t._2))
      .groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    rows.foreach { r =>
      assert(r.getDouble(5) === minCost(r.getLong(3)),
        s"part ${r.getLong(3)} not at regional min")
    }
  }

  test("q11: value threshold is the global fraction; q20: counts positive") {
    val q11 = run("q11_important_stock").collect()
    assert(q11.nonEmpty)
    val vals = q11.map(_.getDouble(1))
    assert(vals.sameElements(vals.sortBy(-_))) // value DESC total order head
    val q20 = run("q20_promotion_candidates").collect()
    assert(q20.nonEmpty)
    assert(q20.forall(_.getLong(2) > 0))
    val names = q20.map(_.getString(0))
    assert(names.sameElements(names.sorted))
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
