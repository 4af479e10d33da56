package graft.operators

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Compaction pinned on three claims: the distributed exclusive
  * prefix sum equals the sequential definition on a multi-partition
  * shuffled input; planBuckets is a partition of the manifest into
  * contiguous ~target runs; and the plan contains NO WindowExec —
  * the whole point is never funneling the manifest through the
  * single-partition `SUM() OVER (ORDER BY)` window. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic sizes, deliberately shuffled arrival order
  private val files: Seq[(Long, Long)] =
    (0L until 200L).map(i => i -> (37L + (i * 31L) % 211L))
  private def manifest = new scala.util.Random(7).shuffle(files)
    .toDF("id", "bytes").repartition(7)

  test("exclusive prefix sum equals the sequential definition") {
    val got = Compaction.withExclusivePrefixSum(
        manifest, "cum", Seq(col("id")), "bytes")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    var acc = 0L
    files.foreach { case (id, b) =>
      assert(got(id) == acc, s"cum($id)")
      acc += b
    }
    assert(got.size == files.size)
  }

  test("planBuckets partitions the manifest into contiguous ~target runs") {
    val target = 1000L
    val plan = Compaction.planBuckets(manifest, "id", "bytes", target)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

    // every file accounted for, exactly once
    assert(plan.map(_._2).sum == files.size)
    assert(plan.map(_._3).sum == files.map(_._2).sum)
    // buckets are contiguous ascending id runs
    plan.sliding(2).foreach {
      case Array((_, _, _, _, lastA), (_, _, _, firstB, _)) =>
        assert(firstB == lastA + 1, "buckets must tile the id order")
      case _ => ()
    }
    assert(plan.head._4 == 0L && plan.last._5 == files.size - 1)
    // greedy first-fit: every bucket but the last crosses its target
    // boundary, so it holds at least target - (maxFileSize - 1) bytes
    val maxFile = files.map(_._2).max
    plan.init.foreach { case (b, _, bytes, _, _) =>
      assert(bytes > target - maxFile, s"bucket $b under-filled: $bytes")
    }
    // and matches the sequential replay of the same rule
    var acc = 0L
    val expected = files.map { case (id, bytes) =>
      val bkt = acc / target; acc += bytes; (id, bkt)
    }.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(plan.map(p => p._1 -> p._2).toMap == expected)
  }

  test("no WindowExec anywhere in the plan") {
    val df = Compaction.planBuckets(manifest, "id", "bytes", 1000L)
    df.count()
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case o => o
    }
    val hasWindow = p.collect { case w: WindowExec => w }.nonEmpty
    assert(!hasWindow, "compaction planning must not use a global window")
  }
}
