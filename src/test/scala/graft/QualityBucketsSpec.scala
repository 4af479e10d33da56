package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent-reference pin for the e7 quality-bucket gate: the whole
  * bucket+keep rule (head >= 1180 ppm, mid >= 1100, tail below; mid
  * kept at hash-prefix < "80", tail at < "29") is recomputed in plain
  * Scala from the t17 familiarity scores and compared as a SET against
  * the gate output — so a silent edit to either threshold, the >= vs >
  * direction, or a keep-rate nibble flips this spec, not just the
  * corpus-dependent DuckDB hash. Edge coverage is asserted non-vacuous:
  * the corpus must exercise both sides of both thresholds. */
class QualityBucketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("e7 bucket thresholds and keep rates match an independent replica") {
    val dir = "/root/testdata/sf0.001"
    val fam = graft.functions.TextQuality
      .bigramFamiliarity(Tables.load(spark, dir, "documents"))
      .select("doc_id", "familiarity_ppm").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // both sides of both edges must exist, or the threshold direction
    // is untested (vacuous-edge control)
    assert(fam.values.exists(_ >= 1180), "no head docs — edge untested")
    assert(fam.values.exists(p => p >= 1100 && p < 1180), "no mid docs")
    assert(fam.values.exists(_ < 1100), "no tail docs")

    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val expected = fam.flatMap { case (id, ppm) =>
      val bucket =
        if (ppm >= 1180) "head" else if (ppm >= 1100) "mid" else "tail"
      val prefix = md5hex(s"qb|$id").substring(0, 2)
      val keep = bucket match {
        case "head" => true
        case "mid"  => prefix < "80"
        case "tail" => prefix < "29"
      }
      if (keep) Some((id, bucket, ppm)) else None
    }.toSet

    val got = SparkEntry.queries("e7_quality_buckets")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    assert(got == expected)
    // all three branches survive sampling (the gate's own non-vacuity)
    assert(Set("head", "mid", "tail").subsetOf(got.map(_._2)))
  }
}
