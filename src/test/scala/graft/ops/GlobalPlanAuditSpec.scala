package graft.ops

import graft.SparkSpec

/** Whole-registry plan audit: every registered query's physical plan is
  * screened for the two unconditional scale-killers — a cartesian
  * product, and a broadcast nested-loop join whose build side isn't a
  * deliberate scalar (1-row aggregate) broadcast. A future query or a
  * Spark-version plan drift that introduces either fails here by NAME,
  * instead of surfacing as an unexplainable bench blowup at 100 TB.
  *
  * Queries that legitimately cross-join a SCALAR aggregate (global mean,
  * corpus-level constant) are allowlisted explicitly — the allowlist is
  * the documentation of every intentional nested-loop in the library.
  *
  * KNOWN LIMIT: the screen reads the executedPlan STRING before any
  * action runs, i.e. AQE's initial plan at sf0.001 statistics — a join
  * AQE re-plans into a nested loop at RUNTIME (or only at gate/bench
  * scale) is invisible here. Runtime re-plans to BNLJ require an
  * empty/degenerate build side (AQE only converts to broadcast when a
  * side is SMALL), so the exposure is join-type edge cases, not the
  * all-pairs blowups this audit exists to catch; the per-query
  * PlanShapeSpec assertions that collect() first cover the adaptive
  * final plans for the layout-critical queries. */
class GlobalPlanAuditSpec extends SparkSpec {

  // the EXACT set of queries whose plan intentionally contains a
  // BroadcastNestedLoopJoin, each with its bounded build side named —
  // asserted by equality below, so a new nested loop AND a stale entry
  // both fail the audit
  private val deliberateNestedLoops: Set[String] = Set(
    "q22_dormant_customers", // 1-row global positive-balance mean
    "q11_important_stock", // 1-row national stock total (group-vs-global
                           // HAVING threshold is an inequality, so the
                           // scalar join can't become an equi hash join)
    "q_dedup_incremental", // 1-row corpus/batch cut threshold
    "q_neardup_incremental", // same 1-row cut, minhash-index sibling
    "q_phash_incremental", // same 1-row cut, perceptual-index sibling
    "q_cc_incremental", // same 1-row cut (batch-edge filter + is_new flag)
    "q_cosine_topk", // bounded query-vector side of the brute-force baseline
    // (q_ann_recall_curve needs no entry since the r20 optimization
    // round: its 20-query brute-force truth moved into the prewarmed
    // annrctruth artifact)
    "q_ann_filtered", // bounded 64-query broadcast truth pass of the
                      // pre/post-filter recall comparison (the exact
                      // filtered ground truth IS the point)
    "q_range_band", // the band table IS the bounded broadcast side of a
                    // non-equi range join — the operator's semantics
    "q_zorder_layout", // 1-row corpus min/max quantization bounds
    // (q15_top_supplier needs no entry: its argmax equality filter is
    // pushed into the scalar join as an equi-condition → BroadcastHashJoin)
    "q_constraints", // 1-row n_checked scalar beside the FK violation count
    "q_tfidf_keywords", // 1-row corpus doc count N in the tf·N/df score
    "q_bm25", // two 1-row corpus scalars (N, total length) in the
              // keyword pass and the idf/avgdl normalizers
    "q_pmi_collocations", // 1-row (t_tok, t_big) corpus scalars in the
                          // PMI ratio
    "q_mix_waterfill", // 1-row (capped count, capped mass, n) scalars
                       // beside the per-lang allocation rows
    // (q_lex_cosine needs no entry since r17's materialize: the weight
    // frame with its scalar-N broadcast is written to parquet once, so
    // the consumer plan reads a scan — materializing a frame REMOVES its
    // build-side BNLJ from the audited plan; shrink this list in the
    // same commit as any such materialize)
    "q_emb_whitening", // 64-row broadcast W table applied per vector
                       // (the LUT build-side pattern)
    "q_dsir_select", // 1-row smoothing-total scalar (P, Q) beside the
                     // <=4096-row broadcast bucket table (md5 % 4096)
    "q_temperature_sample", // 1-row min-language count the rates derive from
    "q_triangles", // three 1-row census scalars (node/edge/wedge/triangle
                   // counts) cross-joined into the single stats row
    "q_sketch_setops", // non-equi pair expansion of the 5-ROW cohort
                       // sketch table (one sketch per event type)
    "q_cms_freq", // 5-row sketch table × 5-row broadcast probe list
    "q_nb_classify", // 5-row broadcast class table × test grams (the
                     // NB scoring fan-out; the model join is equi)
    // (q_pq_planted needs no entry since r20: its truth + ADC scoring
    // crossJoins moved into the prewarmed pqptruth/pqpadc artifacts —
    // the audited query plan reads two parquet scans)
    // (q_opq_recall likewise since the r20 optimization round: both
    // decoded-ranking crossJoins moved into the prewarmed
    // opqpq3/opqopq3 artifacts — the audited plan is three scans +
    // two equi joins + the rollup)
    "q_modularity") // 1-row global edge-count scalar beside the community
                    // stats row (the lit(1)=lit(1) key constant-folds away)

  test("cartesian products never; nested-loop joins exactly the deliberate bounded set") {
    val dir = sf("sf0.001")
    val plans = graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, q) =>
        val plan =
          try q(spark, dir).queryExecution.executedPlan.toString
          catch { case e: Throwable =>
            fail(s"$name failed to plan: ${e.getMessage}")
          }
        (name, plan)
    }
    val cartesians = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(cartesians.isEmpty, s"cartesian products in: $cartesians")
    val nested = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") => n
    }.toSet
    assert(nested === deliberateNestedLoops,
      s"unexpected: ${nested -- deliberateNestedLoops}; " +
        s"stale allowlist: ${deliberateNestedLoops -- nested}")
  }
}
