package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import SpaceSavingTopK.spaceSavingTopK

class SpaceSavingTopKSpec extends SparkSpec {

  private def words(dir: String) =
    Tables(spark, dir, "documents")
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word") =!= "")

  test("with capacity >= vocabulary the sketch equals exact top-k") {
    val w = words(sf("sf0.001"))
    val exact = w.groupBy("word").count()
      .orderBy(desc("count"), asc("word")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sketch = w.select(spaceSavingTopK(col("word"), 10, 4096).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sketch.map(t => (t._1, t._2)) === exact)
    assert(sketch.forall(_._3 === 0L), "exact regime must report zero error")
  }

  test("small capacity keeps the error bounds on near-uniform data") {
    val w = words(sf("sf0.001"))
    val trueCounts = w.groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = w.select(spaceSavingTopK(col("word"), 5, 8).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sketch.nonEmpty)
    // upper-bound property: est >= true count; est - err <= true count
    sketch.foreach { case (item, est, err) =>
      val truth = trueCounts.getOrElse(item, 0L)
      assert(est >= truth, s"$item est=$est < true=$truth")
      assert(est - err <= truth, s"$item lower bound violated")
    }
    // (no presence assertion here: the corpus is near-uniform, so no word
    // clears the count > N/m presence guarantee — that's the next test)
  }

  test("heavy hitters above N/m are guaranteed present under tiny capacity") {
    import spark.implicits._
    // skewed stream: 'hot' dominates, 200 singletons churn the counters
    val rows = Seq.fill(5000)("hot") ++ Seq.fill(800)("warm") ++
      (1 to 200).map(i => s"rare_$i")
    val df = spark.sparkContext.parallelize(rows, 8).toDF("word")
    val sketch = df.select(spaceSavingTopK(col("word"), 3, 8).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // N = 6000, m = 8 -> any item with count > 750 must be present
    assert(sketch.exists(_._1 == "hot"))
    assert(sketch.exists(_._1 == "warm"))
    val hot = sketch.find(_._1 == "hot").get
    assert(hot._2 >= 5000 && hot._2 - hot._3 <= 5000)
  }
}
