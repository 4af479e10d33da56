package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression producing the unit-normalized copy of an
  * `array<double>` column: `x_i / sqrt(sum(x_i * x_i))`.
  *
  * This is the scale lever for cosine scoring: normalize each vector
  * ONCE per row (here, or at ingest), and every pairwise cosine becomes
  * a single [[DotProduct]] instead of three (dot + two norms) — at N×M
  * candidate pairs that is 3× less floating-point work, and the norms
  * are no longer recomputed quadratically.
  *
  * Why not `transform(a, x -> x / norm)`: higher-order functions are
  * interpreted, and an aliased norm column gets re-inlined into the
  * lambda by CollapseProject, re-evaluating the norm per ELEMENT. This
  * expression stays in whole-stage codegen with one norm per row.
  *
  * Float semantics: sum of squares is a sequential left fold, then one
  * IEEE sqrt and one divide per element — the same op sequence as
  * DuckDB's `list_transform(e, x -> x / sqrt(list_dot_product(e, e)))`,
  * so results are bit-identical for the oracle compare.
  */
case class UnitVector(child: Expression) extends UnaryExpression {
  // callers (graft.functions.Similarity) cast to array<double> first.
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    val nrm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = x.getDouble(i) / nrm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double v = $a.getDouble($i);
         |  $s += v * v;
         |}
         |double $nrm = java.lang.Math.sqrt($s);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $a.getDouble($i) / $nrm;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitVector =
    copy(child = newChild)
}
