package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter build (native `TypedImperativeAggregate`) + membership
  * probe (codegen `BinaryExpression`) over string columns — the
  * broadcast-sketch leg of the machinery catalog, next to the HLL
  * union (g13) and Misra-Gries (g14) mergeable summaries.
  *
  * Shape at 100 TB: a membership set too large to broadcast as a join
  * hash map (hundreds of millions of benchmark n-grams) still fits as
  * BITS — `numBits = 2^27` is 16 MB regardless of item count. Build
  * once over the small side, ship the binary to every executor, and
  * the big-side scan drops non-members inside whole-stage codegen
  * before any exchange. False positives (rate ~ (1-e^{-hn/m})^h) are
  * then removed by an exact join whose input is already reduced to
  * ~true-match volume — so the END RESULT is exact and the sketch only
  * ever changes WHERE the work happens, never the answer
  * ([[graft.operators.Dedup.contaminationBloom]]).
  *
  * Determinism: MurmurHash3 over the UTF-8 bytes with two fixed seeds,
  * double hashing g_i = h1 + i*h2 (Kirsch-Mitzenmacher) — same bits on
  * every run, merge is bitwise OR (commutative, idempotent), so build
  * output and probe decisions are order-independent.
  */
object Bloom {

  private val Seed1 = 0x2f7e1badL.toInt
  private val Seed2 = 0x6b43a9b5L.toInt

  /** Bit positions for an item: double hashing over the UTF-8 bytes.
    * `numBits` must be a power of two (mask instead of mod). */
  def setBits(words: Array[Long], item: UTF8String, numHashes: Int): Unit = {
    val bytes = item.getBytes
    val mask = (words.length << 6) - 1
    val h1 = MurmurHash3.bytesHash(bytes, Seed1)
    val h2 = MurmurHash3.bytesHash(bytes, Seed2)
    var i = 0
    while (i < numHashes) {
      val bit = (h1 + i * h2) & mask
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  /** Probe helper shared by interpreted eval and generated code (the
    * codegen references this object and calls it per row — one static
    * method call, no allocation). */
  def mightContain(bloom: Array[Byte], item: UTF8String, numHashes: Int): Boolean = {
    val bytes = item.getBytes
    val mask = (bloom.length << 3) - 1
    val h1 = MurmurHash3.bytesHash(bytes, Seed1)
    val h2 = MurmurHash3.bytesHash(bytes, Seed2)
    var i = 0
    while (i < numHashes) {
      val bit = (h1 + i * h2) & mask
      if ((bloom(bit >>> 3) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Aggregate a string column into a serialized Bloom filter
    * (`binary`, little-endian long words, `numBits / 8` bytes). */
  def build(c: Column, numBits: Int, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      BloomBuild(Bridge.expression(c), numBits, numHashes).toAggregateExpression())
  }

  /** Membership probe of `item` against a built filter column. */
  def mightContainCol(bloom: Column, item: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      BloomMightContain(Bridge.expression(bloom), Bridge.expression(item), numHashes))
  }
}

/** Builds the bit array. Buffer is the raw long words; `merge` is
  * bitwise OR, so partial aggregates combine exactly like any built-in
  * sketch and the result is independent of row order and partitioning. */
case class BloomBuild(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    "numBits must be a power of two >= 64")
  require(numHashes > 0, "numHashes must be positive")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.setBits(buf, v.asInstanceOf[UTF8String], numHashes)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuild =
    copy(child = newChild)
  override def prettyName: String = "bloom_build"
}

/** `might_contain(bloom, item)` — stays inside whole-stage codegen so
  * the prefilter runs at scan speed; the serialized filter arrives as
  * a (broadcast) column value, probed byte-wise without deserializing
  * to words. */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(bloom: Any, item: Any): Any =
    Bloom.mightContain(bloom.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static-shaped call on the Scala object — nothing serialized into
    // the plan's reference array
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Bloom$$.MODULE$$.mightContain($a, $b, $numHashes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain"
}
