package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-min sketch over a non-negative integer key column: point
  * frequency estimates for ANY key from `depth * width` counters —
  * the third leg of the mergeable-summary catalog (g13 HLL =
  * distinct counts, g14 Misra-Gries = heavy-hitter membership, this =
  * point estimates with a one-sided error bound).
  *
  * Guarantees (Cormode & Muthukrishnan): estimate >= true count
  * always; estimate <= true + eps*N with probability 1 - delta for
  * width = ceil(e/eps), depth = ceil(ln 1/delta). Counters are exact
  * sums and `merge` is pointwise addition, so the sketch — and every
  * estimate — is fully deterministic and independent of row order,
  * partitioning, and merge shape. That is what lets the gate
  * (`g15_cms_counts`) hash-match a DuckDB oracle that replays the
  * same pairwise-independent hashes in plain SQL arithmetic:
  * h_r(x) = ((a_r * x + b_r) mod p) mod width, p = 2^31 - 1.
  *
  * At 100 TB: a groupBy(count) over an unbounded-cardinality key
  * shuffles the full distinct-key volume; this carries depth*width
  * longs (4 KB at 4x128) per partition and merges like any built-in
  * sketch. Keys must be non-negative for oracle parity (the Scala
  * side floorMods and is correct for negatives too).
  */
object CountMin {

  val P: Long = 2147483647L // Mersenne prime 2^31 - 1
  // fixed pairwise-independent hash coefficients, row r = (A(r), B(r));
  // the DuckDB oracle inlines the same values
  val A: Array[Long] = Array(1103633425L, 962287286L, 1847980503L, 735693217L,
    1113829321L, 1406932606L)
  val B: Array[Long] = Array(12345L, 67891L, 24682L, 98531L, 55555L, 77777L)

  def bucket(r: Int, x: Long, width: Int): Int =
    (((A(r) * java.lang.Math.floorMod(x, P) + B(r)) % P) % width).toInt

  /** Probe shared by interpreted eval and generated code. */
  def estimate(sketch: Array[Byte], key: Long, depth: Int, width: Int): Long = {
    val bb = ByteBuffer.wrap(sketch).order(ByteOrder.LITTLE_ENDIAN)
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = bb.getLong((r * width + bucket(r, key, width)) << 3)
      if (c < min) min = c
      r += 1
    }
    min
  }

  /** Inner-product estimate from two sketches (Cormode &
    * Muthukrishnan §4.2): min over rows of the bucket-wise product
    * sum. Estimates `sum_k fA(k) * fB(k)` — the equi-join cardinality
    * of the two sketched streams on the sketched key — one-sided
    * (never under), without executing any join. */
  def innerProduct(a: Array[Byte], b: Array[Byte], depth: Int, width: Int): Long = {
    val ba = ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      var s = 0L
      var j = 0
      while (j < width) {
        val idx = (r * width + j) << 3
        s += ba.getLong(idx) * bb.getLong(idx)
        j += 1
      }
      if (s < min) min = s
      r += 1
    }
    min
  }

  /** Aggregate a long column into a serialized sketch (`binary`,
    * little-endian, `depth * width` long counters). */
  def build(c: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      CmsBuild(Bridge.expression(c), depth, width).toAggregateExpression())
  }

  /** Point estimate of `key`'s frequency from a built sketch column. */
  def estimateCol(sketch: Column, key: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      CmsEstimate(Bridge.expression(sketch), Bridge.expression(key), depth, width))
  }

  /** Join-cardinality estimate from two sketch columns. */
  def innerProductCol(a: Column, b: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      CmsInnerProduct(Bridge.expression(a), Bridge.expression(b), depth, width))
  }
}

/** Builds the counter matrix. Buffer is the flat long matrix; `merge`
  * is pointwise addition (counters are exact partial sums). */
case class CmsBuild(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth > 0 && depth <= CountMin.A.length,
    s"depth must be in [1, ${CountMin.A.length}]")
  require(width > 0, "width must be positive")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        buf(r * width + CountMin.bucket(r, x, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length << 3).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length >>> 3)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsBuild =
    copy(child = newChild)
  override def prettyName: String = "cms_build"
}

/** `cms_estimate(sketch, key)` — min over the key's depth counters;
  * stays inside whole-stage codegen (one static-shaped call per row,
  * the sketch arrives as a broadcast column value). */
case class CmsEstimate(left: Expression, right: Expression, depth: Int, width: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(sketch: Any, key: Any): Any =
    CountMin.estimate(sketch.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static-shaped call on the Scala object — nothing serialized into
    // the plan's reference array
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CountMin$$.MODULE$$.estimate($a, $b, $depth, $width);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cms_estimate"
}

/** `cms_inner_product(sketchA, sketchB)` — the join-size estimate;
  * same codegen shape as [[CmsEstimate]]. */
case class CmsInnerProduct(left: Expression, right: Expression, depth: Int, width: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    CountMin.innerProduct(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CountMin$$.MODULE$$.innerProduct($a, $b, $depth, $width);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsInnerProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cms_inner_product"
}
