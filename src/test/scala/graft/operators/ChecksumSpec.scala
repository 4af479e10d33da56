package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The x7 table-checksum shape pinned on the two properties that make
  * it useful: partitioning/order INDEPENDENCE (commutative sum of row
  * digests — the whole point vs an ordered concat digest) and
  * corruption SENSITIVITY (any single-cell change moves the sum). */
class ChecksumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def checksum(df: org.apache.spark.sql.DataFrame): Long = {
    val h = md5(concat_ws("|", col("k"), col("v")))
    val hex32 = (0 until 8).map(c =>
      (expr(s"instr('0123456789abcdef', substr(__h, ${c + 1}, 1))").cast("long")
        - 1L) * lit(1L << (4 * (7 - c)))).reduce(_ + _)
    df.withColumn("__h", h).agg(sum(hex32)).collect()(0).getLong(0)
  }

  private val rows = (1L to 500L).map(i => (i, s"payload_$i"))

  test("checksum is invariant under partitioning and row order") {
    val base = checksum(rows.toDF("k", "v"))
    assert(checksum(rows.reverse.toDF("k", "v").repartition(13)) === base)
    assert(checksum(rows.toDF("k", "v").repartition(1)) === base)
    assert(checksum(scala.util.Random.shuffle(rows).toDF("k", "v")) === base)
  }

  test("any single-cell corruption changes the checksum") {
    val base = checksum(rows.toDF("k", "v"))
    val corrupted = rows.updated(250, (251L, "payload_251x"))
    assert(checksum(corrupted.toDF("k", "v")) !== base)
    // dropping a row changes it too (count moves even if sum collided)
    assert(checksum(rows.tail.toDF("k", "v")) !== base)
  }
}
