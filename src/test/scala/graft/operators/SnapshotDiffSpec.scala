package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SnapshotDiff pinned on CDC semantics — including the null-payload
  * edges the struct-wrapped presence encoding exists for — and on the
  * plan shape (aggregation, not a join). */
class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = true)))

  private def df(rows: (Long, java.lang.Long)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)

  private def diffOf(old: Seq[(Long, java.lang.Long)],
                  neu: Seq[(Long, java.lang.Long)]) =
    SnapshotDiff.diff(df(old: _*), df(neu: _*), "k", "v")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(_._1).toSeq

  test("insert, delete, update, unchanged — the four-way split") {
    val got = diffOf(
      old = Seq(1L -> 10L, 2L -> 20L, 3L -> 30L),
      neu = Seq(2L -> 20L, 3L -> 31L, 4L -> 40L))
    assert(got === Seq(
      (1L, "delete", Some(10L), None),
      (3L, "update", Some(30L), Some(31L)),
      (4L, "insert", None, Some(40L))))
  }

  test("null payloads: null→value and value→null are updates, null→null is not") {
    val got = diffOf(
      old = Seq(1L -> null, 2L -> 5L, 3L -> null),
      neu = Seq(1L -> 7L, 2L -> null, 3L -> null))
    assert(got === Seq(
      (1L, "update", None, Some(7L)),
      (2L, "update", Some(5L), None)))
  }

  test("identical snapshots diff to nothing; empty sides are pure inserts/deletes") {
    val snap: Seq[(Long, java.lang.Long)] = Seq(1L -> java.lang.Long.valueOf(1L), 2L -> java.lang.Long.valueOf(2L))
    assert(diffOf(snap, snap) === Seq.empty)
    assert(diffOf(Seq.empty[(Long, java.lang.Long)], snap).map(_._2) === Seq("insert", "insert"))
    assert(diffOf(snap, Seq.empty[(Long, java.lang.Long)]).map(_._2) === Seq("delete", "delete"))
  }

  test("plan: one hash aggregation, no join anywhere") {
    val plan = SnapshotDiff.diff(
      df(1L -> 1L), df(1L -> 2L), "k", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"diff should not join:\n$plan")
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"diff should shuffle exactly once, saw $n:\n$plan")
  }

  test("closure: applyDiff(old, diff(old, neu)) == neu, random snapshots") {
    val rnd = new scala.util.Random(29)
    def snap(): Seq[(Long, java.lang.Long)] =
      (1L to 60L).filter(_ => rnd.nextBoolean())
        .map(k => k -> java.lang.Long.valueOf(rnd.nextInt(5).toLong))
    (1 to 5).foreach { _ =>
      val old = snap(); val neu = snap()
      val changes = SnapshotDiff.diff(df(old: _*), df(neu: _*), "k", "v")
      val applied = SnapshotDiff.applyDiff(df(old: _*), changes, "k", "v")
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).sortBy(_._1).toSeq
      val want = neu.map { case (k, v) => k -> Option[Any](v) }.sortBy(_._1)
      assert(applied == want)
    }
    // null payloads survive the round trip (null→v update, v→null update)
    val old = Seq(1L -> java.lang.Long.valueOf(7L),
      2L -> null.asInstanceOf[java.lang.Long])
    val neu = Seq(1L -> null.asInstanceOf[java.lang.Long],
      2L -> java.lang.Long.valueOf(9L))
    val applied = SnapshotDiff.applyDiff(df(old: _*),
      SnapshotDiff.diff(df(old: _*), df(neu: _*), "k", "v"), "k", "v")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).sortBy(_._1).toSeq
    assert(applied == Seq(1L -> None, 2L -> Some(9L)))
  }
}
