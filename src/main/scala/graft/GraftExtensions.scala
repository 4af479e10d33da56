package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** SQL-surface registration for the engine's custom Catalyst
  * expressions, so `spark.sql("SELECT dot_product(a, b) ...")` uses the
  * same codegen kernel as the Column API.
  *
  * Two deployment paths:
  *  - cluster config: `spark.sql.extensions=graft.GraftExtensions`
  *    (the standard SparkSessionExtensions injection), or
  *  - runtime: `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotProductDescriptor)
  }
}

object GraftExtensions {

  private def buildDotProduct(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "dot_product(arrayA, arrayB)")
    DotProduct(
      Cast(exprs(0), ArrayType(DoubleType)),
      Cast(exprs(1), ArrayType(DoubleType)))
  }

  private[graft] val dotProductDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    buildDotProduct)

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", buildDotProduct, "scala_udf")
}
