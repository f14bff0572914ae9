package graft.ops

import graft.SparkSpec

/** Pins the physical-plan shapes SCALE.md promises, so a regression that
  * silently changes a plan (lost pushdown, dropped broadcast) fails CI
  * rather than only showing up as a slow bench. */
class PlanShapeSpec extends SparkSpec {

  private def plan(q: String): String = {
    val df = graft.SparkEntry.queries(q)(spark, sf("sf0.001"))
    df.queryExecution.executedPlan.toString
  }

  test("q1_pricing: filter pushed to the scan, partial aggregation present") {
    val p = plan("q1_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("partial_sum"), p)
    // column pruning: unused orderkey never read
    assert(!p.contains("l_orderkey"), p)
  }

  test("q_join_broadcast: every join is a broadcast join (no shuffle join)") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)"), p)
  }

  test("q_filter_project: predicates pushed, pruned read schema") {
    val p = plan("q_filter_project")
    // (plan toString truncates long filter lists — assert on the
    // untruncated prefix)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount)"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipda"), p)
    assert(!p.contains("l_tax"), p)
  }

  test("q_topk: TakeOrdered, not a global sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_dedup_pipeline: final plan scans the materialized intermediates, not the corpus") {
    // the shingle/survivor subtrees are materialized to session-temp
    // parquet; if the final plan reads documents.parquet directly, the
    // round-2 17x subtree replication has regressed
    val p = plan("q_dedup_pipeline")
    assert(!p.contains("documents.parquet"), p)
    assert(p.contains("graft-mat-shsurv"), p)
    assert(p.contains("graft-mat-survivors"), p)
  }

  test("q_cosine_ivf: final plan scans the materialized embedding table once-per-branch") {
    val p = plan("q_cosine_ivf")
    assert(!p.contains("embeddings.parquet"), p)
    assert(p.contains("graft-mat-emb"), p)
  }
}
