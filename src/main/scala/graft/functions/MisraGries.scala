package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a native Catalyst
  * `TypedImperativeAggregate` — the custom-AGGREGATE leg of the
  * machinery catalog (next to the codegen scalar expressions
  * [[DotProduct]]/[[UnitVector]]/[[ArrayCountInSet]]): `k` counters of
  * bounded memory per group, one pass, partial-aggregated and MERGED
  * across partitions like any built-in aggregate.
  *
  * Guarantee (deterministic, order-independent): any item with true
  * frequency > n/(k+1) within its group IS in the summary — the
  * classic Misra-Gries bound, preserved under partial-aggregate merge
  * by the Agarwal et al. "Mergeable Summaries" prune (pointwise sum,
  * subtract the (k+1)-th largest counter, keep positives). The
  * ESTIMATES depend on arrival/merge order (undercounts by at most
  * n/(k+1)); the MEMBERSHIP guarantee does not — so gates assert
  * membership of exact-count heavy hitters, never the estimates.
  *
  * At 100 TB this is the "frequent values of an unbounded-cardinality
  * column" primitive: a full groupBy(count) needs an exchange keyed by
  * the VALUE (shuffle volume = distinct values); this needs k counters
  * per group-partition and merges like a sketch — the same
  * pre-aggregate-once/merge-cheaply family as g13's HLL union.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "MisraGries needs k > 0 counters")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // classic MG step: full summary + unseen item decrements
          // every counter; zeroed counters vacate their slots.
          // In-place walk of the table (mapValuesInPlace +
          // filterInPlace) — no per-row key-array allocation and no
          // per-key rehash, which an adversarial high-cardinality
          // stream would otherwise pay on EVERY row once the summary
          // fills
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (item, c) => b1.update(item, b1.getOrElse(item, 0L) + c) }
    if (b1.size > k) {
      // Mergeable-Summaries prune: subtract the (k+1)-th largest
      // counter from all, keep positives — total error stays ≤ n/(k+1)
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - 1 - k)
      val keys = b1.keys.toArray
      keys.foreach { key =>
        val c = b1(key) - sub
        if (c <= 0L) b1.remove(key) else b1.update(key, c)
      }
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      out.writeUTF(item)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val item = in.readUTF()
      buf.update(item, in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)

  override def prettyName: String = "heavy_hitters"
}

object MisraGries {

  /** Heavy-hitters summary Column: `array<struct<item, est>>` of at
    * most `k` entries, counts descending. Membership (not estimates)
    * is the deterministic contract — see the class scaladoc. */
  def heavyHitters(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MisraGries(Bridge.expression(c), k).toAggregateExpression())
  }
}
