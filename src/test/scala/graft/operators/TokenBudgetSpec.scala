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

  test("resume: batched admission equals arrival-order single-pass, any split") {
    // 12 docs across 2 sources, varying sizes; try several split points
    val fixture = (1 to 12).map { i =>
      (i.toLong, Seq.fill(3 + i % 5)("w").mkString(" "),
        if (i % 2 == 0) "A" else "B")
    }
    val budget = 14L
    def admitted(ds: Seq[(Long, String, String)],
                 offsets: Map[String, Long]): Seq[Long] =
      ds.groupBy(_._3).toSeq.flatMap { case (src, rows) =>
        val ordered = rows.sortBy(r => (md5hex(s"tb|${r._1}"), r._1))
        var before = offsets.getOrElse(src, 0L)
        ordered.flatMap { case (id, text, _) =>
          val keep = if (before < budget) Some(id) else None
          before += text.split(" ").length.toLong
          keep
        }
      }
    for (split <- Seq(3, 6, 9)) {
      val (d1, d2) = fixture.splitAt(split)
      val b1 = d1.toDF("doc_id", "text", "source")
      val b2 = d2.toDF("doc_id", "text", "source")
      val consumed = b1.select(col("source"),
          size(split_part_tokens(col("text"))).cast("long").as("n"))
        .groupBy("source").agg(sum(col("n")).as("consumed_tok"))
      val got = (Sampling.tokenBudget(b1, budget).select("doc_id").collect() ++
        Sampling.tokenBudgetResume(b2, budget, consumed)
          .select("doc_id").collect()).map(_.getLong(0)).toSet
      val want = (admitted(d1, Map.empty) ++ admitted(d2,
        d1.groupBy(_._3).map { case (s, rs) =>
          s -> rs.map(_._2.split(" ").length.toLong).sum
        })).toSet
      assert(got === want, s"split at $split")
    }
  }

  private def split_part_tokens(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.split(c, " ")
}
