package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructField, StructType}

/** Symmetric int8 quantization of an `array<double>` unit vector as
  * one codegen pass — `struct(scale, q)` with `scale = max|x| / 127`
  * and `q[i] = floor(x[i] / scale)`. The HOF spelling
  * (`array_max(transform(abs)) ... transform(floor(x / scale))`) walks
  * the vector twice through interpreted lambdas on what is the
  * full-corpus ingest projection of the 4x-smaller-scan path
  * ([[graft.operators.Ann.quantizeInt8]]).
  *
  * Bit parity with the HOF form: same IEEE max / divide / floor on the
  * same values in the same order (floor, never round-half — see the
  * quantizeInt8 scaladoc for why that keeps engines identical). */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def nullSafeEval(a: Any): Any =
    Int8Quantize.quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Int8Quantize$$.MODULE$$.quantize($a);")

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)

  override def prettyName: String = "int8_quantize"
}

object Int8Quantize {

  /** Shared by interpreted eval and generated code. */
  def quantize(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(arr.getDouble(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val scale = maxAbs / 127.0
    val q = new Array[Any](n)
    i = 0
    // all-zero vector: scale is 0 and v/scale would be 0.0/0.0 = NaN —
    // emit zero codes instead (dot products with the zero vector stay
    // 0 rather than silently poisoning downstream sums with NaN)
    while (i < n) {
      q(i) = if (scale == 0.0) 0.0 else math.floor(arr.getDouble(i) / scale)
      i += 1
    }
    InternalRow(scale, new GenericArrayData(q))
  }

  def quantizeCol(ue: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(Int8Quantize(Bridge.expression(ue)))
  }
}
