package graft.functions

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Pins the t35 fused profile's two claims (round-12 verdict item 5):
  * (1) column-for-column equality with the five per-gate outputs it
  * fuses (t1 stats, t2 langid, t19 classifier, t26 entropy, t28 script
  * mix — including t19's shuffle re-expressed as an in-row fold), and
  * (2) the plan reads `documents` EXACTLY ONCE with zero exchanges —
  * the whole point of fusing at 100 TB. */
class TextProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def byDoc(df: DataFrame, cols: Seq[String]): Map[Long, Seq[Any]] =
    df.selectExpr("doc_id" +: cols: _*).collect()
      .map(r => r.getLong(0) -> (1 to cols.size).map(r.get)).toMap

  private lazy val fused = SparkEntry.queries("t35_text_profile")(spark, dir)

  test("fused == t1_text_stats column-for-column") {
    val cols = Seq("n_words", "n_distinct_words", "ttr", "avg_word_len",
      "stop_ratio", "quality")
    assert(byDoc(fused, cols) ==
      byDoc(SparkEntry.queries("t1_text_stats")(spark, dir), cols))
  }

  test("fused == t2_langid column-for-column") {
    val cols = Seq("s_de", "s_en", "s_es", "s_fr", "s_zh", "pred_lang",
      "matches_label")
    assert(byDoc(fused, cols) ==
      byDoc(SparkEntry.queries("t2_langid")(spark, dir), cols))
  }

  test("fused == t19_quality_classifier (the in-row fold equals the shuffle)") {
    val cols = Seq("n_tokens", "sum_w", "keep")
    assert(byDoc(fused, cols) ==
      byDoc(SparkEntry.queries("t19_quality_classifier")(spark, dir), cols))
  }

  test("fused == t26_char_entropy column-for-column") {
    val cols = Seq("n_chars", "n_distinct_chars", "entropy_bits")
    assert(byDoc(fused, cols) ==
      byDoc(SparkEntry.queries("t26_char_entropy")(spark, dir), cols))
  }

  test("fused == t28_script_mix column-for-column (same salt)") {
    val cols = Seq("n_latin", "n_digit", "n_cyrillic", "n_cjk", "n_other",
      "dominant")
    assert(byDoc(fused, cols) ==
      byDoc(SparkEntry.queries("t28_script_mix")(spark, dir), cols))
  }

  test("plan: ONE scan of documents, zero exchanges before the gate's sort") {
    // the profile itself (pre-orderBy) must be a pure scan-side
    // projection: one FileScan, no Exchange anywhere
    val prof = graft.functions.TextQuality.textProfile(
      graft.Tables.load(spark, dir, "documents"))
    val plan = prof.queryExecution.executedPlan.toString
    val scans = "FileScan|Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly 1 scan, got $scans:\n$plan")
    assert(!plan.contains("Exchange"),
      s"fused profile must be exchange-free:\n$plan")
  }
}
