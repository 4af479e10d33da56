package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-grams of an `array<string>` column as a native codegen
  * expression — the ARRAY-form shingler for plans that cannot use the
  * relational posexplode+lead form (streaming projections like
  * [[graft.streaming.EventStream.decontaminateStream]], where a
  * per-doc window is not streamable).
  *
  * Why not `transform(sequence(...), i -> concat_ws(...))`: that
  * spelling evaluates interpreted — a lambda invocation plus k boxed
  * `element_at` calls PER GRAM, on what is the per-row hot path of
  * ingest-time shingling. This stays inside whole-stage codegen: one
  * static call per row, a tight loop with `UTF8String.concatWs` per
  * gram, no per-element dispatch.
  *
  * Semantics match the HOF form exactly: `n - k + 1` grams in
  * document order, empty array when the document has fewer than `k`
  * words (FunctionsSpec pins the equivalence).
  */
case class WordGrams(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "WordGrams needs k >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    WordGrams.grams(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordGrams$$.MODULE$$.grams($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)

  override def prettyName: String = "word_grams"
}

object WordGrams {

  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def grams(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) {
        parts(j) = words.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Disjoint chunk helper for [[WordChunks]]: ceil(n/cs) chunks of
    * `cs` words (last one shorter), document order. */
  def chunks(words: ArrayData, cs: Int): ArrayData = {
    val n = words.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val m = (n + cs - 1) / cs
    val out = new Array[Any](m)
    var c = 0
    while (c < m) {
      val from = c * cs
      val len = math.min(cs, n - from)
      val parts = new Array[UTF8String](len)
      var j = 0
      while (j < len) {
        parts(j) = words.getUTF8String(from + j)
        j += 1
      }
      out(c) = UTF8String.concatWs(Space, parts: _*)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Sliding-window helper for [[WordWindows]]: 1 chunk for n <=
    * window, else 2 + (n - window - 1) / stride, each a
    * (n_tokens, joined chunk) struct. */
  def windows(words: ArrayData, window: Int, stride: Int): ArrayData = {
    val n = words.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val m = if (n <= window) 1 else 2 + (n - window - 1) / stride
    val out = new Array[Any](m)
    var c = 0
    while (c < m) {
      val from = c * stride
      val len = math.min(window, n - from)
      val parts = new Array[UTF8String](len)
      var j = 0
      while (j < len) {
        parts(j) = words.getUTF8String(from + j)
        j += 1
      }
      out(c) = InternalRow(len.toLong, UTF8String.concatWs(Space, parts: _*))
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** Sliding word windows of an `array<string>` column for
  * [[TextQuality.slidingChunks]] (RAG/embedding chunking — the shape
  * that feeds a corpus into an embedding model): `window`-token chunks
  * every `stride` tokens, emitted as `array<struct<n_tokens, chunk>>`
  * so the per-chunk join and size never re-run downstream. A doc
  * shorter than `window` yields exactly one chunk. */
case class WordWindows(child: Expression, window: Int, stride: Int)
    extends UnaryExpression {

  require(window >= 1 && stride >= 1, "WordWindows needs window, stride >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("chunk", StringType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(a: Any): Any =
    WordGrams.windows(a.asInstanceOf[ArrayData], window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordGrams$$.MODULE$$.windows($a, $window, $stride);")

  override protected def withNewChildInternal(newChild: Expression): WordWindows =
    copy(child = newChild)

  override def prettyName: String = "word_windows"
}

/** Disjoint word chunks of an `array<string>` column — the codegen
  * chunker behind [[graft.operators.Dedup.chunkDedup]] (the CCNet
  * paragraph-hash stage, a corpus-scale hot path) and
  * [[TextQuality.scrubRepeats]]. Same motivation as [[WordGrams]]:
  * the `transform(sequence, i -> concat_ws(slice(...)))` spelling is
  * an interpreted lambda + a materialized slice per CHUNK. */
case class WordChunks(child: Expression, chunkWords: Int) extends UnaryExpression {

  require(chunkWords >= 1, "WordChunks needs chunkWords >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    WordGrams.chunks(a.asInstanceOf[ArrayData], chunkWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordGrams$$.MODULE$$.chunks($a, $chunkWords);")

  override protected def withNewChildInternal(newChild: Expression): WordChunks =
    copy(child = newChild)

  override def prettyName: String = "word_chunks"
}
