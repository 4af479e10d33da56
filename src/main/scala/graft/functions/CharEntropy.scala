package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution Shannon entropy of a string as a native
  * codegen expression — the model-free "gibberish / compression-bait"
  * quality signal (low entropy = repeated-character spam, high
  * entropy = random noise/base64 blobs; natural language sits in a
  * narrow band, so both tails are curation drop candidates).
  *
  * Returns `struct(n_chars, n_distinct_chars, entropy_bits)` over the
  * string's Unicode CODE POINTS (matching SQL `len`/`substr`
  * character semantics, not UTF-16 units):
  * `entropy_bits = -Σ (n_c/n)·log2(n_c/n)` over each distinct code
  * point's count `n_c`.
  *
  * Why an expression and not the relational spelling (explode one row
  * per character, count per (doc, char), fold): that shape multiplies
  * the corpus by its CHARACTER count before the exchange — a ~10^3×
  * row blowup that turns a quality-scoring scan into the job's
  * dominant shuffle. This is a per-row scalar: one pass over the
  * string inside whole-stage codegen (one static call per row), zero
  * extra rows, zero shuffle. The DuckDB oracle runs the relational
  * form; round-6 absorbs the sub-ulp log/summation-order drift.
  *
  * Determinism: terms accumulate in SORTED code-point order, so the
  * result is a pure function of the string (never of partitioning).
  * `0.0 - acc` (not `-acc`) keeps the all-same-character case at
  * positive zero, matching SQL `0 - SUM(...)`.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct_chars", LongType, nullable = false),
    StructField("entropy_bits", DoubleType, nullable = false)))

  override def nullSafeEval(s: Any): Any =
    CharEntropy.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CharEntropy$$.MODULE$$.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}

object CharEntropy {

  private val Log2 = math.log(2.0)

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): InternalRow = {
    val cps = s.toString.codePoints().toArray
    java.util.Arrays.sort(cps)
    val n = cps.length
    var distinct = 0L
    var acc = 0.0
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && cps(j) == cps(i)) j += 1
      distinct += 1
      val p = (j - i).toDouble / n
      acc += p * (math.log(p) / Log2)
      i = j
    }
    new GenericInternalRow(Array[Any](n.toLong, distinct, 0.0 - acc))
  }
}
