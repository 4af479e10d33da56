package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the dot product of two
  * `array<double>` columns.
  *
  * Why not `aggregate(zip_with(...))`: Spark's higher-order functions
  * are evaluated interpreted (lambda per element, boxed), which showed
  * up as the dominant cost in the embedding-similarity benchmarks. This
  * expression stays inside whole-stage codegen: the generated code is a
  * tight primitive `double` loop over the two `ArrayData`, no
  * allocation, no virtual dispatch per element.
  *
  * Float semantics match the higher-order formulation exactly
  * (sequential left-to-right accumulation starting at 0.0), so results
  * are bit-identical with the DuckDB oracle's list_dot_product shape.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // callers (graft.functions.Similarity) cast both sides to
  // array<double> explicitly, so no input-type coercion is needed here.
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
