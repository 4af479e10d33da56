package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketch as a native `TypedImperativeAggregate` —
  * the member the sketch family was missing: HLL (g13) counts
  * distincts, Misra-Gries (g14) ranks heavy hitters, CMS (g15/g16)
  * counts points, KMV (g21/g22) intersects sets; none answers "what
  * is p99?". Exact `percentile_disc` needs a per-group sort of every
  * value — at 100 TB an exchange of the full fact table per
  * percentile query; this sketch is one linear scan into a bounded
  * bucket map that merges like any partial aggregate and is stored
  * once, queried for every q.
  *
  * The bucket rule is the DDSketch idea (relative-error log buckets;
  * Masson, Rim, Lee — VLDB'19) made ENGINE-EXACT by using base-2
  * integer arithmetic instead of a float `log_gamma`: a value `v > 0`
  * with floor-log2 `b` keeps only its top `k+1` significant bits —
  * `lo = (v >> (b-k)) << (b-k)` (values below `2^(k+1)` are exact;
  * 0 maps to 0). Every arithmetic step is an integer shift, so bucket
  * assignment is bit-identical in ANY engine — the DuckDB oracle
  * replays it with `bin()`/`>>`/`<<` — and the sketch CONTENT
  * (sorted (bucket_lo, count) pairs), not just its estimates, is
  * hash-gateable, the same determinism discipline as KMV.
  *
  * Error bound: a bucket spans `[lo, lo + 2^(b-k))` with `lo >= 2^b`,
  * so width/lo <= 2^-k — the bucket's lower bound under-estimates any
  * member by at most that relative error (k=5 -> 3.1%). Quantile
  * extraction picks the bucket holding the ceil(q·n)-th value:
  * `est <= exact_percentile_disc(q) <= est + (width-1)`.
  *
  * State: at most k·2^k-ish live buckets per group in practice
  * (one per (octave, mantissa) pair actually present — 2^k per octave,
  * ~64 octaves max for int64), a few KB; merge is map-add.
  */
case class LogHistogram(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]]
  with UnaryLike[Expression] {

  require(k >= 1 && k <= 20, "LogHistogram needs 1 <= k <= 20")

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Long, Long],
      input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val lo = LogHistogram.bucketFloor(v.asInstanceOf[Long], k)
      buf.update(lo, buf.getOrElse(lo, 0L) + 1L)
    }
    buf
  }

  override def merge(b1: mutable.HashMap[Long, Long],
      b2: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] =
    LogHistogram.mergeMaps(b1, b2)

  /** The sketch itself: (bucket_lo, n) structs ascending by lo —
    * deterministic under any arrival order, partitioning, or merge
    * tree. */
  override def eval(buf: mutable.HashMap[Long, Long]): Any =
    LogHistogram.evalMap(buf)

  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] =
    LogHistogram.serializeMap(buf)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] =
    LogHistogram.deserializeMap(bytes)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lo", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): LogHistogram =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): LogHistogram =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): LogHistogram =
    copy(child = newChild)

  override def prettyName: String = "log_histogram"
}

/** WEIGHTED twin of [[LogHistogram]]: each value contributes `weight`
  * to its bucket instead of 1 — the form mass-weighted corpus
  * statistics need. The canonical use: token-mass length quantiles
  * ("the document length below which half the corpus TOKENS sit",
  * value = weight = doc token count), which is what sizes sequence-
  * packing capacity — the unweighted median answers "typical doc",
  * not "where the token mass lives", and the two diverge hard on
  * long-tailed corpora. Same engine-exact integer buckets, same
  * bounded map state and elementwise merge; the oracle replays it as
  * `GROUP BY bucket SUM(weight)`. Null value/weight and weight 0 rows
  * contribute nothing; negative weights are rejected. */
case class WeightedLogHistogram(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k >= 1 && k <= 20, "WeightedLogHistogram needs 1 <= k <= 20")

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Long, Long],
      input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = left.eval(input)
    val w = right.eval(input)
    if (v != null && w != null) {
      val wl = w.asInstanceOf[Long]
      require(wl >= 0L, s"weighted_log_histogram requires weight >= 0, got $wl")
      if (wl > 0L) {
        val lo = LogHistogram.bucketFloor(v.asInstanceOf[Long], k)
        buf.update(lo, buf.getOrElse(lo, 0L) + wl)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[Long, Long],
      b2: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] =
    LogHistogram.mergeMaps(b1, b2)

  override def eval(buf: mutable.HashMap[Long, Long]): Any =
    LogHistogram.evalMap(buf)

  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] =
    LogHistogram.serializeMap(buf)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] =
    LogHistogram.deserializeMap(bytes)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lo", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedLogHistogram =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): WeightedLogHistogram =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedLogHistogram =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "weighted_log_histogram"
}

object LogHistogram {

  /** Truncate `v` to its top k+1 significant bits — the bucket's
    * inclusive lower bound. Exact below 2^(k+1); 0 -> 0. Requires
    * v >= 0 (relative-error buckets have no sign convention; callers
    * split sign ranges if they need them). */
  def bucketFloor(v: Long, k: Int): Long = {
    require(v >= 0L, s"log_histogram requires non-negative values, got $v")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(v | 1L)
    if (b <= k) v
    else {
      val shift = b - k
      (v >> shift) << shift
    }
  }

  private[functions] def mergeMaps(b1: mutable.HashMap[Long, Long],
      b2: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    b2.foreach { case (lo, n) => b1.update(lo, b1.getOrElse(lo, 0L) + n) }
    b1
  }

  private[functions] def evalMap(buf: mutable.HashMap[Long, Long]): Any =
    new GenericArrayData(buf.toArray.sortBy(_._1).map { case (lo, n) =>
      new GenericInternalRow(Array[Any](lo, n)): Any
    })

  private[functions] def serializeMap(
      buf: mutable.HashMap[Long, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (lo, n) => out.writeLong(lo); out.writeLong(n) }
    out.flush()
    bos.toByteArray
  }

  private[functions] def deserializeMap(
      bytes: Array[Byte]): mutable.HashMap[Long, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) { buf.update(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  /** Sketch Column over a long column: ascending `array<struct<lo,n>>`. */
  def sketch(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(LogHistogram(Bridge.expression(c), k).toAggregateExpression())
  }

  /** Weighted sketch Column: bucket mass = SUM(weight). */
  def weightedSketch(value: Column, weight: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WeightedLogHistogram(Bridge.expression(value),
      Bridge.expression(weight), k).toAggregateExpression())
  }
}
