package graft.functions

import org.apache.spark.sql.SparkSession
import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("post-hoc registration makes decimal_dot/float_dot SQL-callable") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT decimal_dot(a, b) AS dd, float_dot(a, b) AS fd FROM (
        |  SELECT array(cast(0.5 as float), cast(2.0 as float)) a,
        |         array(cast(4.0 as float), cast(0.25 as float)) b)""".stripMargin)
      .collect().head
    assert(r.getDouble(0) === 2.5)
    assert(r.getDouble(1) === 2.5)
  }

  test("extension builders resolve through the injectFunction tuple shape") {
    // exercise the exact builder functions the extension injects
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      assert(info.getName === name)
      val e = builder(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Array(1.0f), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Array(2.0f), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType))))
      assert(e.eval(null) === 2.0)
    }
  }
}
