package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring: registers graft's native expressions as
  * SQL functions so `spark.sql("SELECT decimal_dot(a, b) ...")` works.
  *
  * Use at session build time:
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or via config:
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * or post-hoc on a live session: GraftExtensions.register(spark).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", "", name, usage, "", "", "", "", "", "", "built-in")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("decimal_dot",
        info("decimal_dot",
          "decimal_dot(a, b) - exact-decimal dot product of float arrays"),
        (args: Seq[Expression]) => DecimalDotProduct(args(0), args(1))),
      ("float_dot",
        info("float_dot",
          "float_dot(a, b) - double-precision dot product of float arrays"),
        (args: Seq[Expression]) => FloatDotProduct(args(0), args(1))))

  /** Register on an already-built session (temp functions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
