package graft.mr

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Property: for ANY corpus, the full MapReduce dataflow (flatMap → MD5
  * shuffle → sorted streaming reduce) produces exactly the in-memory
  * word counts — SURVEY.md §5.2 tier 3. */
class MapReducePropertySpec extends SparkSpec {

  private val wordGen = Gen.oneOf(
    "the", "a", "fox", "dog", "zebra", "Straße", "日本語", "x1", "y2")
  private val lineGen = Gen.listOf(wordGen).map(_.mkString(" "))
  private val corpusGen = Gen.listOfN(20, lineGen)

  test("MR word count equals in-memory groupBy count for random corpora") {
    val prop = Prop.forAll(corpusGen, Gen.choose(1, 5)) {
      (lines: List[String], reducers: Int) =>
        val expected = lines.flatMap(_.split("\\s+")).filter(_.nonEmpty)
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val rdd = spark.sparkContext.parallelize(lines, 3)
        val got = MapReduceJob.shuffle(rdd.flatMap(WordCount.mapper), reducers)
          .mapPartitions(WordCount.reducer)
          .collect()
          .map { l =>
            val k = MapReduceJob.tabKey(l)
            k -> l.substring(k.length + 1).toLong
          }.toMap
        got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }
}
