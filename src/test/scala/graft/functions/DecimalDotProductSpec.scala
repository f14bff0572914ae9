package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec
import DecimalDotProduct.decimalDot

class DecimalDotProductSpec extends SparkSpec {

  /** The reference pipeline the expression must match bit-for-bit. */
  private val dotViaHof = graft.ops.Vectors.dotViaHof _

  test("matches the decimal HOF pipeline on the embeddings fixture") {
    val emb = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
    val bad = emb.select(
        dotViaHof(col("embedding"), col("embedding")).as("ref"),
        decimalDot(col("embedding"), col("embedding")).as("fast"))
      .filter(col("ref") =!= col("fast"))
      .count()
    assert(bad === 0L)
  }

  test("matches the decimal HOF pipeline on adversarial random floats") {
    val rnd = new scala.util.Random(42)
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    def vec(): Array[Float] = Array.fill(64) {
      rnd.nextInt(4) match {
        case 0 => (rnd.nextFloat() - 0.5f) * 20f   // up to ±10
        case 1 => (rnd.nextFloat() - 0.5f) * 1e-6f // tiny
        case 2 => rnd.nextInt(2000).toFloat / 1000f - 1f // landing near ties
        case _ => rnd.nextFloat() - 0.5f
      }
    }
    val rows = (1 to 500).map(_ => Row(vec(), vec()))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val bad = df.select(
        dotViaHof(col("a"), col("b")).as("ref"),
        decimalDot(col("a"), col("b")).as("fast"))
      .filter(col("ref") =!= col("fast"))
      .count()
    assert(bad === 0L)
  }

  test("scale9 equals authoritative BigDecimal rounding on edge values") {
    val cases = Seq(0.15f, -0.15f, 0.1f, 1.0000005f, -1.0000005f, 0f,
      9.999999f, -9.999999f, 0.0000000005f, 1.5e-10f)
    cases.foreach { f =>
      val d = f.toDouble
      val expected = java.math.BigDecimal.valueOf(d).movePointRight(9)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      assert(DecimalDotProduct.scale9(d) === expected, s"f=$f")
    }
  }
}
