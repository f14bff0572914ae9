package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The planted-fixture NB floor (q_pq_planted discipline): with the
  * class markers present the classifier must be near-perfect; with them
  * stripped it must collapse toward the prior — proving the accuracy
  * comes from the learned class-conditionals, not from a leak. */
class ClassifySpec extends SparkSpec {

  test("planted fixture: per-class accuracy floor binds at >= 95%") {
    val rows = Classify.qNbClassify(spark, sf("sf0.001")).collect()
    assert(rows.length === Classify.NClasses)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, r.toString)
      assert(r.getLong(3) >= 9500L,
        s"class ${r.getString(0)} accuracy ${r.getLong(3)}bp < floor")
    }
    val again = Classify.qNbClassify(spark, sf("sf0.001")).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("stripping the markers collapses accuracy toward the prior") {
    val noMarkers = Classify.grams(spark)
      .filter(!col("g").startsWith("m"))
    val rows = Classify.classify(noMarkers).collect()
    val (correct, total) =
      (rows.map(_.getLong(2)).sum, rows.map(_.getLong(1)).sum)
    // shared-topical tokens carry no class signal: anything much above
    // the ~20% prior means the scorer is reading a leak
    assert(correct * 100 <= total * 40,
      s"marker-free accuracy $correct/$total — signal leak")
  }
}
