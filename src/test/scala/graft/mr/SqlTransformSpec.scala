package graft.mr

import graft.{SparkSpec, Tables}

/** SQL-layer twin of the reference's executable contract: Spark's
  * `SELECT TRANSFORM(...) USING 'cmd'` streams rows through an external
  * command exactly like the reference pipes lines through mapper
  * executables (reference worker/__main__.py:104-125) — SURVEY.md §2.1 O3
  * mapping option 2.
  *
  * Gotcha: the default TRANSFORM field delimiter is Hive's \u0001 (^A), not
  * the tab the reference convention uses — ROW FORMAT DELIMITED must be
  * declared on BOTH sides for tab-separated scripts (a bare `cat` test
  * can't catch this: symmetric delimiters round-trip). */
class SqlTransformSpec extends SparkSpec {

  test("TRANSFORM ... USING streams tab-delimited rows through a script") {
    Tables(spark, sf("sf0.001"), "documents")
      .selectExpr("doc_id", "lang").createOrReplaceTempView("t_docs")
    val script = java.nio.file.Paths
      .get(getClass.getResource("/mr/exec/upper_map.sh").toURI)
    val out = spark.sql(
      s"""SELECT TRANSFORM(doc_id, lang)
         |  ROW FORMAT DELIMITED FIELDS TERMINATED BY '\\t'
         |  USING 'sh $script'
         |  AS (doc_id STRING, lang_up STRING)
         |  ROW FORMAT DELIMITED FIELDS TERMINATED BY '\\t'
         |FROM t_docs""".stripMargin)
    val rows = out.collect()
    assert(rows.length === 500)
    assert(rows.forall(r => r.getString(1) == r.getString(1).toUpperCase))
    assert(rows.exists(_.getString(1) == "EN"))
  }
}
