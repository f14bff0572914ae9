package graft

import graft.SparkSpec

/** Pins the OracleExport contract the gate oracles depend on: stable
  * sf-keyed paths, once-per-JVM writes, and the Bench disable switch. */
class OracleExportSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("oraclePath is the sf0.01-keyed glob the oracle SQL embeds") {
    assert(OracleExport.oraclePath("x") ==
      "/tmp/graft-oracle-export/x-_root_testdata_sf0.01/*.parquet")
  }

  test("export writes once per (tag, dir), honors the disable conf") {
    import spark.implicits._
    val dir = "/spec/only" // path key, no table reads involved
    val base = "/tmp/graft-oracle-export/spectag-_spec_only"
    graft.Tables.registerTempDir(s"spec:$base", base)
    val out = new java.io.File(base)
    // disabled: nothing written
    spark.conf.set("spark.graft.oracleExport", "false")
    OracleExport.export(Seq(1L).toDF("v"), "spectag", dir)
    assert(!out.exists())
    // enabled: written once; a second call with DIFFERENT data must be a
    // no-op (per-JVM once semantics — the content is a pure function of
    // (tag, dir) for real callers, so the first write is authoritative)
    spark.conf.set("spark.graft.oracleExport", "true")
    try {
      OracleExport.export(Seq(1L, 2L).toDF("v"), "spectag", dir)
      assert(out.exists())
      val n1 = spark.read.parquet(base).count()
      assert(n1 == 2)
      OracleExport.export(Seq(1L, 2L, 3L).toDF("v"), "spectag", dir)
      assert(spark.read.parquet(base).count() == 2)
    } finally spark.conf.unset("spark.graft.oracleExport")
  }

  test("re-export under a different knob key throws; same key is a no-op") {
    import spark.implicits._
    val dir = "/spec/knobguard"
    val base = "/tmp/graft-oracle-export/knobtag-_spec_knobguard"
    graft.Tables.registerTempDir(s"spec:$base", base)
    OracleExport.export(Seq(1L).toDF("v"), "knobtag", dir, "k12.w8")
    // same knobs: silent reuse (the per-JVM once semantics)
    OracleExport.export(Seq(9L).toDF("v"), "knobtag", dir, "k12.w8")
    assert(spark.read.parquet(base).as[Long].collect().toSeq == Seq(1L))
    // different knobs: the export path is fixed and the oracle SQL reads
    // it — serving knob-A content to a knob-B gate must throw, not desync
    val e = intercept[IllegalStateException] {
      OracleExport.export(Seq(2L).toDF("v"), "knobtag", dir, "k9.w4")
    }
    assert(e.getMessage.contains("k12.w8") && e.getMessage.contains("k9.w4"))
  }

  test("a failed export write is retried by the next caller") {
    import spark.implicits._
    val dir = "/spec/retry"
    val base = "/tmp/graft-oracle-export/retrytag-_spec_retry"
    graft.Tables.registerTempDir(s"spec:$base", base)
    // first attempt: evaluation throws mid-write → the in-flight mark
    // must be rolled back (mark-before-write used to pin the failure
    // for the whole JVM and the gate then read a missing export)
    val bad = Seq(1L).toDF("v")
      .select(org.apache.spark.sql.functions.expr(
        "cast(raise_error('injected export failure') as bigint)").as("v"))
    intercept[Throwable] { OracleExport.export(bad, "retrytag", dir) }
    // second attempt with good data must actually write
    OracleExport.export(Seq(7L).toDF("v"), "retrytag", dir)
    assert(spark.read.parquet(base).as[Long].collect().toSeq == Seq(7L))
  }

  test("a gated consumer round-trips through its export identically") {
    // the minhash signature export is the widest one (33 columns): the
    // re-read export must equal the shared table it was written from
    val dir = sf("sf0.001")
    val sig = ops.Similarity.minhashSignatures(spark, dir)
    // SAME knob key as qMinhashLsh's production export: the suites share
    // one JVM, and the knob guard (rightly) throws if the same tag+dir
    // is exported under two different keys in one session
    OracleExport.export(sig, "minhsig", dir, "k=32.b=8")
    val back = spark.read.parquet(
      "/tmp/graft-oracle-export/minhsig-_root_testdata_sf0.001")
    assert(back.schema == sig.schema)
    val a = sig.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
