package graft.ops

import graft.SparkSpec

/** JL projection distortion: buckets must concentrate around ratio 1
  * (bucket 20 = [1.0, 1.05)), the histogram must cover every vector,
  * and the operator must be deterministic across invocations (the sign
  * matrix is hash-derived, not RNG). */
class VectorsJlSpec extends SparkSpec {

  test("distortion concentrates near 1 and covers all vectors") {
    val dir = sf("sf0.01")
    val rows = Vectors.qJlDistortion(spark, dir).collect()
    val total = rows.map(_.getLong(1)).sum
    val n = graft.Tables(spark, dir, "embeddings").count()
    assert(total === n, "histogram lost vectors")
    // E[ratio]=1, sd ~ sqrt(2/k) ≈ 0.35 at k=16: the mass within
    // ratio ∈ [0.5, 1.5] (buckets 10..29) should dominate
    val near = rows.filter(r => r.getInt(0) >= 10 && r.getInt(0) <= 29)
      .map(_.getLong(1)).sum
    assert(near.toDouble / total > 0.7,
      s"JL concentration violated: $near/$total within ±50%")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0 && r.getDouble(3) >= r.getDouble(2))
    }
  }

  test("deterministic across invocations") {
    val dir = sf("sf0.01")
    val a = Vectors.qJlDistortion(spark, dir).collect().toSeq
    val b = Vectors.qJlDistortion(spark, dir).collect().toSeq
    assert(a === b)
  }
}
