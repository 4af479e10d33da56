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

/** K-minimum-values distinct sketch as a native Catalyst
  * `TypedImperativeAggregate` — the SET-OPERATION member of the sketch
  * family: HLL (g13) unions, Misra-Gries (g14) ranks, CMS (g15/g16)
  * counts, but none of them can INTERSECT. KMV can (Beyer et al.,
  * "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations", SIGMOD'07; the theta-sketch lineage): because the
  * sketch IS the k smallest hashes, the union of two sketches is the
  * k smallest of the merged sets, and the intersection estimate is
  * the Jaccard of the combined-k window scaled by the union estimate
  * — closed under both operations from the same 2 KB state.
  *
  * DETERMINISM is the design choice that separates this from a
  * library sketch: the hash is md5 of the value's string form and the
  * sketch keeps the k lexicographically smallest hex digests — a
  * total order any engine reproduces exactly, so the sketch CONTENT
  * (not just its estimate) is oracle-checkable: DuckDB replays it as
  * `ORDER BY md5(x) LIMIT k`. Estimates derive from the k-th hash by
  * INTEGER arithmetic — `(k-1) * 2^56 div hex56(h_k)` — one floor
  * division over the digest's first 14 hex chars (56 bits; 63·2^56
  * still fits a signed 64-bit), so estimate parity is bit-exact too.
  *
  * At 100 TB: a per-group `count(distinct x)` exchanges every
  * distinct value; this exchanges ≤ k digests per group-partition and
  * merges like any partial aggregate. Cross-table set arithmetic
  * (distinct users in A ∩ B) runs on stored 2 KB sketches with NO
  * join between the fact tables at all.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[String]]
  with UnaryLike[Expression] {

  require(k > 1, "KmvSketch needs k > 1")

  override def createAggregationBuffer(): mutable.TreeSet[String] =
    mutable.TreeSet.empty

  private def admit(buf: mutable.TreeSet[String], h: String): Unit =
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf += h; buf -= buf.last }

  override def update(buf: mutable.TreeSet[String],
      input: InternalRow): mutable.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) admit(buf, KmvSketch.md5Hex(v.toString))
    buf
  }

  override def merge(b1: mutable.TreeSet[String],
      b2: mutable.TreeSet[String]): mutable.TreeSet[String] = {
    b2.foreach(admit(b1, _))
    b1
  }

  /** The sketch itself: ≤ k digests, ascending — deterministic under
    * any arrival order, partitioning, or merge tree. */
  override def eval(buf: mutable.TreeSet[String]): Any =
    new GenericArrayData(
      buf.toArray[String].map(UTF8String.fromString): Array[Any])

  override def serialize(buf: mutable.TreeSet[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeUTF)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[String]
    var i = 0
    while (i < n) { buf += in.readUTF(); i += 1 }
    buf
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)

  override def prettyName: String = "kmv_sketch"
}

object KmvSketch {

  private[functions] def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** KMV sketch Column: ascending `array<string>` of ≤ k md5 digests. */
  def kmv(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(KmvSketch(Bridge.expression(c), k).toAggregateExpression())
  }

  import org.apache.spark.sql.functions._

  /** True integer division (SQL `div`) — Column./ is floating-point,
    * and double rounding of 60-bit operands would break the bit-exact
    * estimate contract. */
  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** Distinct-count estimate from a sketch column: exact size when the
    * sketch never saturated, else `(k-1)·2^56 div hex56(h_k)` — pure
    * integer arithmetic, bit-identical in any engine. */
  def estimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(intDiv(
        lit((k - 1).toLong * (1L << 56)),
        conv(substring(element_at(sketch, k), 1, 14), 16, 10).cast("long")))

  /** Union sketch: k smallest of the combined digest sets. */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Intersection estimate (Beyer et al. §5): |combined-k window ∩ A
    * ∩ B| / k × unionEstimate — integer multiply-then-div so the
    * scaling introduces no float. */
  def intersectionEstimate(a: Column, b: Column, k: Int): Column = {
    val comb = unionSketch(a, b, k)
    val rho = size(array_intersect(comb, array_intersect(a, b))).cast("long")
    // combined window may hold < k digests (small unions are exact)
    val denom = least(size(comb).cast("long"), lit(k.toLong))
    intDiv(rho * estimate(comb, k), denom)
  }
}
