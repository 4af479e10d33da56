package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The m17 video keyframe dedup gate pinned on the fingerprint's two
  * load-bearing properties: ORDER SENSITIVITY (a re-cut video with the
  * same keyframes in a different order must NOT collide — the md5 is
  * over the frame-ordered phash string, Chromaprint's discipline, not
  * a bag-of-frames hash) and injected-copy non-vacuity (the d34/m16
  * construction guarantees multi-doc groups on any generation). */
class VideoKeyframeDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("injected copies land in dup groups with the original as keeper") {
    val out = graft.SparkEntry
      .queries("m17_video_keyframe_dup")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty, "injected copies must produce dup groups")
    // every group's keeper is a real (pre-offset) doc id and each group
    // holds at least two docs
    assert(out.forall(_.getLong(2) >= 2L))
  }

  test("m18: every injected 2/3-trim is contained in its original " +
    "above threshold; no containment without >= 60% shared frames") {
    val out = graft.SparkEntry
      .queries("m18_video_trim_containment")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty, "injected trims must produce containment pairs")
    // d24's threshold inequality holds on every emitted row
    assert(out.forall { case (_, _, inter, na) => inter * 10 >= na * 6 })
    // at least one pair is a (trimmed copy, original) with the
    // injected id offset: doc_a = doc_b + off and doc_b % 97 == 0
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val off = docs.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col("doc_id"))).head().getLong(0) + 1
    assert(out.exists { case (a, b, _, _) => a == b + off && b % 97 == 0 },
      s"no injected trim->original pair found (off=$off)")
  }

  test("the sequence fingerprint is order-sensitive") {
    // two synthetic 'videos' with identical keyframe SETS in different
    // ORDER: text A = block X ++ pad ++ block Y, text B = Y ++ pad ++ X
    // (blocks are 300 bytes = one keyframe stride each, pads keep the
    // frame grid aligned). A bag-of-frames hash would collide; the
    // ordered fingerprint must not.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // blocks need INTERNAL structure: a constant-char block aHashes to
    // the all-ones phash regardless of the char (every cell equals the
    // mean), so order flips would be invisible. Ascending vs
    // descending byte ramps give distinct per-keyframe hashes.
    val x = ("abcdefghijklmnopqrst" + "a" * 80) * 3
    val y = ("tsrqponmlkjihgfedcba" + "t" * 80) * 3
    val docs = Seq((1L, x + y), (2L, y + x)).toDF("doc_id", "text")
    val nFrames =
      expr("(greatest(CAST(length(text) AS BIGINT), 1L) - 1) div 100")
    val kf = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), nFrames)).as("f"))
      .filter(col("f") % 3 === 0)
    val cells = (0 until 16).map(i =>
      expr(s"ascii(substr(text, CAST(f*100 + ${100 * i / 16} + 1 AS INT), 1))")
        .as(s"c$i"))
    val sumC = (0 until 16).map(i => col(s"c$i")).reduce(_ + _)
    val bits = (0 until 16).map(i =>
      when(lit(16) * col(s"c$i") >= col("s"), lit(1L << i))
        .otherwise(lit(0L))).reduce(_ + _)
    val fps = kf.select(col("doc_id") +: col("f") +: cells: _*)
      .withColumn("s", sumC)
      .select(col("doc_id"), col("f"), bits.as("phash"))
      .groupBy("doc_id").agg(
        expr("md5(concat_ws(',', transform(" +
          "array_sort(collect_list(struct(f, phash))), " +
          "x -> CAST(x.phash AS STRING))))").as("fp"),
        expr("sort_array(collect_list(phash))").as("bag"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[Long](2)))
    val Seq(a, b) = fps.sortBy(_._1).toSeq
    assert(a._3 == b._3, "same keyframe multiset by construction")
    assert(a._2 != b._2, "re-cut order must change the fingerprint")
  }
}
