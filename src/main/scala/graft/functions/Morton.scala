package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleave — the multi-dimensional data-layout
  * key. Sorting/range-partitioning a table by `interleave(x, y)` makes
  * every contiguous slice of rows a small bounding box in (x, y) space,
  * so per-file parquet min/max statistics prune scans that filter on
  * EITHER dimension — a linear sort by `x` alone leaves the `y` min/max
  * of every file at full width and prunes nothing for `y` predicates.
  *
  * 100 TB: this is a WRITE-side operator. One
  * `repartitionByRange(zorder(x, y)).sortWithinPartitions(...)` at
  * ingest buys every later reader two-dimensional file skipping from
  * plain parquet stats — no index structure, no extra storage, no read
  * path changes (ZOrderSpec measures the bounding-box tightening).
  * The expression itself is a per-row bit loop: codegen-inlined,
  * branch-free, no allocation, never a shuffle.
  *
  * Bit budget: the low `bits` of each input interleave into `2*bits`
  * output bits (x at even positions, y at odd); `bits <= 31` keeps the
  * result in a positive long. Callers bucket raw values into
  * `[0, 2^bits)` first (floor-scaling or modulo), which also bounds
  * skew: equal-width z-cells over bucketed values, not raw outliers.
  */
object Morton {

  /** Interleave the low `bits` of `x` (even positions) and `y` (odd). */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Inverse of [[interleave]]: (x, y) from a z-value. */
  def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var x = 0L
    var y = 0L
    var i = 0
    while (i < bits) {
      x |= ((z >>> (2 * i)) & 1L) << i
      y |= ((z >>> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  /** Column form: `zorder(x, y, bits)` over two integral columns. */
  def zorder(x: Column, y: Column, bits: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MortonInterleave(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long")), bits))
  }
}

/** Codegen Morton interleave: a fixed-trip-count bit loop the JIT
  * unrolls; stays inside whole-stage codegen (no UDF boundary, no
  * boxing). */
case class MortonInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    Morton.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($x >>> $i) & 1L) << (2 * $i);
         |  $z |= (($y >>> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)
}
