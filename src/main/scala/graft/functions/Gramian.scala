package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Gramian accumulator for covariance/PCA over an embedding column as
  * a native `TypedImperativeAggregate` — the scale form of the
  * second-moment pass.
  *
  * The declarative alternative (each row explodes its d(d+1)/2
  * upper-triangle products into struct rows, then a (i,j)-group
  * aggregation) is correct but carries a d^2/2 ROW blowup per input
  * row: fine at d=8 (36 structs), ruinous at production embedding
  * widths (d=768 -> ~295k structs per row, a ~300,000x scan
  * amplification before the exchange). This aggregate does the same
  * arithmetic with ZERO extra rows: each input row adds its products
  * into a flat per-partition buffer of `1 + d + d(d+1)/2` doubles
  * (count, per-dim sums, upper-triangle product sums); partials merge
  * elementwise like any partial aggregate, so the exchange carries
  * one ~8*(d^2/2+d+1)-byte buffer per partition — ~2.4 MB at d=768,
  * independent of corpus size.
  *
  * Covariance derives from the buffer as cov(i,j) = P_ij/n -
  * (S_i/n)(S_j/n) — the same final float ops as the exploded form's
  * `avg(p) - avg(e_i)*avg(e_j)`, so [[graft.operators.Pca]] keeps its
  * oracle parity (partial-sum ORDER differs, but that is already
  * partitioning-dependent in any distributed sum; the gates' round-6/
  * round-4 tolerances absorb the ~1e-15 drift).
  *
  * Rows whose array is null, shorter than `d`, or null in ANY of the
  * first `d` elements are skipped whole — a per-dim partial presence
  * would silently mix denominators (and a null element read as 0.0
  * would corrupt the sums while still counting the row).
  */
case class GramianAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  require(d >= 1, "GramianAgg needs d >= 1")

  private val len = 1 + d + d * (d + 1) / 2

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](len)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() >= d && !hasNullPrefix(arr)) {
        val e = new Array[Double](d)
        var i = 0
        while (i < d) { e(i) = arr.getDouble(i); i += 1 }
        buf(0) += 1.0
        i = 0
        var p = 1 + d
        while (i < d) {
          buf(1 + i) += e(i)
          var j = i
          while (j < d) { buf(p) += e(i) * e(j); p += 1; j += 1 }
          i += 1
        }
      }
    }
    buf
  }

  private def hasNullPrefix(arr: ArrayData): Boolean = {
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i)) return true
      i += 1
    }
    false
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { b1(i) += b2(i); i += 1 }
    b1
  }

  /** Flat buffer: [n, S_0..S_{d-1}, P_00, P_01, .., P_0{d-1}, P_11, ..]
    * — upper triangle row-major; index of P_ij (i<=j) is
    * `1 + d + i*d - i*(i-1)/2 + (j-i)`. */
  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(len * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(len)(bb.getDouble())
  }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): GramianAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): GramianAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): GramianAgg =
    copy(child = newChild)

  override def prettyName: String = "gramian"
}

object Gramian {

  /** Gramian Column over an `array<double>` column: one
    * `array<double>` of `1 + d + d(d+1)/2` entries (see
    * [[GramianAgg.eval]] for the layout). */
  def gramian(c: Column, d: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(GramianAgg(Bridge.expression(c), d).toAggregateExpression())
  }
}
