package graft.ops

import graft.SparkSpec

/** SCD2 structural invariants beyond the DuckDB gate's content hash. */
class ScdSpec extends SparkSpec {

  test("scd2 merge: exactly one current version per key, closed rows chain") {
    val rows = Scd.qScdUpsert(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        Option(r.getString(3)), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, vs) =>
      // exactly one open (current) version per key
      assert(vs.count(_._5) == 1, s"key $k")
      // a closed row's valid_to is the successor version's valid_from
      vs.filter(v => !v._5).foreach { closed =>
        assert(vs.exists(v => v._5 && v._3 == closed._4.get), s"key $k")
      }
      // keys are either 1-row (untouched) or 2-row (closed + opened)
      assert(vs.length == 1 || vs.length == 2, s"key $k")
    }
    // the batch touched SOME keys (otherwise the merge proved nothing)
    assert(rows.exists(!_._5))
  }
}
