package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit pin for Sampling.tokenBudget beyond its hash gate: the admitted
  * set is exactly the per-source prefix of the deterministic
  * (md5("tb|"+doc_id), doc_id) ordering whose PRECEDING token sum is
  * under budget — recomputed here independently with java MessageDigest,
  * no Spark functions shared with the implementation. */
class TokenBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("admits the deterministic hash-ordered prefix per source") {
    // 6 docs of 10 tokens in source A, 3 docs of 5 tokens in source B
    val docs = ((1 to 6).map(i => (i.toLong, Seq.fill(10)("w").mkString(" "), "A")) ++
      (7 to 9).map(i => (i.toLong, Seq.fill(5)("w").mkString(" "), "B")))
      .toDF("doc_id", "text", "source")
    val budget = 25L
    val got = Sampling.tokenBudget(docs, budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // independent expectation: per source, order by (md5("tb|"+id), id),
    // admit while the running token sum BEFORE the doc is < budget
    val fixture = ((1 to 6).map(i => (i.toLong, 10L, "A")) ++
      (7 to 9).map(i => (i.toLong, 5L, "B")))
    val expected = fixture.groupBy(_._3).flatMap { case (_, ds) =>
      val ordered = ds.sortBy(d => (md5hex(s"tb|${d._1}"), d._1))
      ordered.scanLeft((0L, Option.empty[Long])) {
        case ((before, _), (id, n, _)) => (before + n, Some(id))
      }.sliding(2).collect {
        case Seq((before, _), (_, Some(id))) if before < budget => id
      }
    }.toSet
    // A admits exactly 3 of its 6 (0/10/20 < 25, 30 is not); B admits all 3
    assert(expected.count(_ <= 6) == 3 && expected.count(_ >= 7) == 3)
    assert(got == expected)

    // deterministic: a second run admits the identical set
    val again = Sampling.tokenBudget(docs, budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got)
  }
}
