package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row SCRIPT-MIX analysis — the multilingual-corpus curation
  * signal language-ID alone misses: a "mostly English" document that
  * is 40% CJK codepoints is a mixed-script artifact (scraped
  * boilerplate, concatenated translations, mojibake) that routing and
  * tokenizer-budget decisions need to see. Counts each Unicode code
  * point into coarse script classes by EXPLICIT integer ranges —
  * never `\p{Script=...}` character classes, whose definitions vary
  * by regex engine and Unicode table version — so the result is
  * bit-identical in any engine and the DuckDB oracle replays it with
  * `unicode()` range comparisons:
  *
  *   latin    U+0041-U+005A, U+0061-U+007A
  *   digit    U+0030-U+0039
  *   cyrillic U+0400-U+04FF
  *   cjk      U+4E00-U+9FFF (unified ideographs)
  *   other    everything else (whitespace, punctuation, all other
  *            scripts)
  *
  * `dominant` is the argmax with a FIXED precedence on ties
  * (latin > digit > cyrillic > cjk > other) — deterministic, not
  * map-order dependent. One pass per row inside whole-stage codegen;
  * the relational explode-per-character form is the same ~10^3× row
  * blowup [[CharEntropy]] documents, and production never runs it.
  */
case class ScriptMix(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_latin", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("n_cyrillic", LongType, nullable = false),
    StructField("n_cjk", LongType, nullable = false),
    StructField("n_other", LongType, nullable = false),
    StructField("dominant", StringType, nullable = false)))

  override def nullSafeEval(s: Any): Any =
    ScriptMix.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ScriptMix$$.MODULE$$.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): ScriptMix =
    copy(child = newChild)

  override def prettyName: String = "script_mix"
}

object ScriptMix {

  private val names =
    Array("latin", "digit", "cyrillic", "cjk", "other").map(UTF8String.fromString)

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): InternalRow = {
    val counts = new Array[Long](5)
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) {
      val cp = it.nextInt()
      val cls =
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) 0
        else if (cp >= '0' && cp <= '9') 1
        else if (cp >= 0x0400 && cp <= 0x04FF) 2
        else if (cp >= 0x4E00 && cp <= 0x9FFF) 3
        else 4
      counts(cls) += 1L
    }
    // argmax with fixed precedence: first class holding the max wins
    var best = 0
    var i = 1
    while (i < 5) { if (counts(i) > counts(best)) best = i; i += 1 }
    new GenericInternalRow(Array[Any](counts(0), counts(1), counts(2),
      counts(3), counts(4), names(best)))
  }
}
