package graft

import org.scalatest.funsuite.AnyFunSuite

/** Schema-evolution roundtrip (the x16 gate) pinned on its structural
  * claims: the merged scan carries the union-by-name schema (the
  * evolved column exists, nullable, without rewriting generation-1
  * files), generation-1 rows read the evolved column as NULL, and the
  * checksums through the merged scan equal the same aggregation
  * computed directly on the source table. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("x16: merged scan schema-evolves and checksums match the source") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("x16_schema_evolution")(spark, dir)
    assert(got.schema.fieldNames.toSeq ==
      Seq("l_returnflag", "n_rows", "qty_sum_c", "price_sum_c",
        "pre_evolution_rows"))
    val li = Tables.load(spark, dir, "lineitem")
    val want = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("l_quantity") * 100, 0).cast("long")).as("qty_sum_c"),
        coalesce(sum(when(col("l_orderkey") % 2 === 1,
          round(col("l_extendedprice") * 100, 0).cast("long"))), lit(0L))
          .as("price_sum_c"),
        sum(when(col("l_orderkey") % 2 === 0, 1L).otherwise(0L))
          .as("pre_evolution_rows"))
      .orderBy("l_returnflag")
    assert(got.collect().toSeq == want.collect().toSeq)
  }
}
