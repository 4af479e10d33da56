package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Salted-join contract: bit-identical to the plain equi-join (salting
  * must be invisible in the answer), actually salted (the physical
  * join is the shuffled path, not a broadcast the salt can't help),
  * and actually SPREAD (every hot key occupies all salt sub-keys, so
  * no single reducer sees a whole hot key). */
class SkewSaltJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 1000 rows over 3 keys, 90% on "hot" — the shape that pins a reducer
  private val rnd = new scala.util.Random(11)
  private val fact = (1 to 1000).map { i =>
    val k = if (rnd.nextInt(10) < 9) "hot" else if (rnd.nextInt(2) == 0) "w" else "c"
    (i.toLong, k, rnd.nextInt(100).toLong)
  }
  private val dim = Seq(("hot", 10L), ("w", 20L), ("c", 30L), ("unused", 40L))

  test("salted join result == plain join result") {
    val f = fact.toDF("id", "k", "v")
    val d = dim.toDF("k", "w")
    val salted = SkewSalt.saltedEquiJoin(f, d, Seq("k"), 8)
      .select("id", "k", "v", "w").collect().map(_.toSeq).toSet
    val plain = f.join(d, Seq("k"))
      .select("id", "k", "v", "w").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("the join is the shuffled path and the hot key spreads over all salts") {
    val f = fact.toDF("id", "k", "v")
    val d = dim.toDF("k", "w")
    val plan = SkewSalt.saltedEquiJoin(f, d, Seq("k"), 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"salting a broadcast join is a no-op:\n$plan")

    // spread: the fact side's hot key maps onto every salt value
    val saltsUsed = f.withColumn("__salt",
      pmod(xxhash64(struct(f.columns.toIndexedSeq.map(col): _*)), lit(8)))
      .filter(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(saltsUsed == 8L)
  }
}
