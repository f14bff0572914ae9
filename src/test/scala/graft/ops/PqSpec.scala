package graft.ops

import graft.SparkSpec

/** Product quantization (q_pq_recall): codebook shape/finiteness, nibble
  * codes in range, and the measured recall floor. The ADC arithmetic
  * itself is gated end-to-end by the DuckDB oracle (reconstruction from
  * the exported codes/books + sequential-fold sims); these pins catch
  * training-side regressions the export gate can't see. */
class PqSpec extends SparkSpec {

  test("codebooks are 8x16x8, finite, and distinct per subspace") {
    val books = Vectors.pqBooks(spark, sf("sf0.001"))
    assert(books.length === 8)
    books.foreach { sub =>
      assert(sub.length === 16)
      sub.foreach { cw =>
        assert(cw.length === 8)
        cw.foreach(v => assert(!v.isNaN && !v.isInfinite))
      }
      // Lloyd rounds must have separated the 16 codewords (collapsed
      // codebooks would silently destroy recall)
      assert(sub.map(_.toSeq).distinct.length === 16,
        "duplicate codewords in a subspace")
    }
  }

  test("codes are nibbles: every c0..c7 in [0, 16)") {
    val codes = Vectors.pqCodes(spark, sf("sf0.001"))
    val mm = codes.selectExpr(
      "least(c0,c1,c2,c3,c4,c5,c6,c7) AS lo",
      "greatest(c0,c1,c2,c3,c4,c5,c6,c7) AS hi")
      .selectExpr("min(lo)", "max(hi)").head()
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < 16)
  }

  test("recall floor on the near-orthogonal worst case") {
    val r = Vectors.qPqRecall(spark, sf("sf0.001")).head()
    val (np, nh, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nh >= 0 && nh <= np)
    assert(bp === nh * 10000L / np, "recall_bp arithmetic drifted")
    // measured 0.205 at sf0.01 (see qPqRecall scaladoc); floor well
    // below the measurement so machine-independent, well above chance
    assert(bp >= 1000, s"PQ recall collapsed: $bp bp")
  }

  test("IVFADC: stage arithmetic, rerank lift, and recall floors") {
    val r = Vectors.qIvfAdc(spark, sf("sf0.001")).head()
    val np = r.getLong(1)
    val (adcH, adcBp) = (r.getLong(2), r.getLong(3))
    val (rrH, rrBp) = (r.getLong(4), r.getLong(5))
    assert(adcH >= 0 && adcH <= np && rrH >= 0 && rrH <= np)
    assert(adcBp === adcH * 10000L / np, "adc_recall_bp arithmetic drifted")
    assert(rrBp === rrH * 10000L / np, "rr_recall_bp arithmetic drifted")
    // the exact rerank of the 10-deep ADC shortlist beats the raw
    // compressed-domain top-3 on the fixture (sf0.01: 1826 -> 3646 bp);
    // not a theorem (the IVF and LSH candidate sets differ) but a stable
    // fixture fact — a regression here means a stage got disconnected
    assert(rrH >= adcH, s"rerank lost recall: adc=$adcH rr=$rrH")
    // floors well below the measured values, well above chance
    assert(adcBp >= 800, s"ADC recall collapsed: $adcBp bp")
    assert(rrBp >= 1600, s"reranked recall collapsed: $rrBp bp")
  }
}
