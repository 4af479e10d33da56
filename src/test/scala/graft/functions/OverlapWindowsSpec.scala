package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Overlap windowing (t38) pinned on its boundary rules: start
  * positions are 0, s, 2s, ... strictly below the token count; the
  * trailing window truncates (never pads); stride == window
  * degenerates to d14's disjoint chunking; consecutive windows share
  * exactly w - s tokens. */
class OverlapWindowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windows(text: String, w: Int, s: Int): Seq[(Int, Seq[String])] =
    Seq(text).toDF("text")
      .select(explode(TextAnalysis.overlapWindows(
        TextAnalysis.words(col("text")), w, s)).as("x"))
      .select(col("x.start"), col("x.chunk"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[String](1).toList)).toSeq

  test("starts, truncation, overlap and the disjoint degenerate case") {
    val ws = windows("a b c d e f g h i j", 4, 3)
    assert(ws.map(_._1) == Seq(0, 3, 6, 9))
    assert(ws.head._2 == List("a", "b", "c", "d"))
    // consecutive windows share w - s = 1 token
    assert(ws(0)._2.last == ws(1)._2.head)
    // trailing window truncates at the document end
    assert(ws.last._2 == List("j"))
    // total emitted = n + (n_windows - 1) * (w - s) when only the
    // tail truncates fully within the last stride
    assert(ws.map(_._2.length).sum == 13)

    // stride == window -> disjoint cover, d14's chunking
    val dj = windows("a b c d e f g", 3, 3)
    assert(dj.map(_._2) ==
      Seq(List("a", "b", "c"), List("d", "e", "f"), List("g")))
    assert(dj.flatMap(_._2) == List("a", "b", "c", "d", "e", "f", "g"))
  }
}
