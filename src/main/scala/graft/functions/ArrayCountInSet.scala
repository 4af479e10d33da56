package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of elements of an `array<string>` column that belong to a
  * fixed marker set — the kernel behind stopword-ratio and language-ID
  * scoring (TextAnalysis.markerCount).
  *
  * Why not `size(filter(arr, w => w.isin(markers)))`: higher-order
  * functions evaluate interpreted — a lambda and an O(|markers|)
  * `isin` per TOKEN. At corpus scale token-level scoring is the hot
  * path of every quality/langid pass. This expression stays in
  * whole-stage codegen: one hash-set probe per token, no allocation
  * (the HOF materializes the filtered array only to take its size).
  */
case class ArrayCountInSet(child: Expression, markers: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  @transient private lazy val markerSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](markers.size * 2)
    markers.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && markerSet.contains(arr.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("markerSet", markerSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $a.numElements();
         |long $cnt = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayCountInSet =
    copy(child = newChild)
}
