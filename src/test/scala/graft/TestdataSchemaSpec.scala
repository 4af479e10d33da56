package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Encoding-drift canary: the driver regenerates /root/testdata between
  * rounds and has already shipped `events.ts` under two different parquet
  * encodings (TIMESTAMP(NANOS) in rounds 1-5, TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) from round 6). Round 6 lost six queries and six
  * specs to the silent switch because every consumer failed far from the
  * cause. This spec pins the NORMALIZED schema contract of every table as
  * seen through [[Tables.load]] — the single choke point all readers must
  * use — so the next regeneration fails ONE named test here instead.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("events.ts normalizes to TimestampType for every shipped encoding") {
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType,
      s"events.ts read back as ${df.schema("ts").dataType}; " +
        "Tables.normalizeTs needs an arm for this encoding")
    // and the values are sane instants, not 1970-epoch garbage from a
    // mis-scaled long or a timezone-shifted NTZ reinterpretation
    val (lo, hi) = {
      val r = df.selectExpr("min(ts)", "max(ts)").head()
      (r.getTimestamp(0), r.getTimestamp(1))
    }
    assert(lo.toInstant.toString >= "2000-01-01T00:00:00Z" &&
      hi.toInstant.toString <= "2100-01-01T00:00:00Z",
      s"events.ts range [$lo, $hi] outside plausible bounds")
  }

  test("normalizeTs handles all three historical ts encodings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // LongType nanos -> micros truncation
    val fromLong = Tables.normalizeTs(
      Seq(1704067200123456789L).toDF("ts")) // 2024-01-01T00:00:00.123456789Z
    assert(fromLong.schema("ts").dataType === TimestampType)
    assert(fromLong.head().getTimestamp(0).toInstant.toString ===
      "2024-01-01T00:00:00.123456Z")
    // TimestampNTZType -> UTC instant (session tz is UTC, cast is exact)
    val fromNtz = Tables.normalizeTs(
      Seq("2024-01-01T00:00:00.123456").toDF("s")
        .select(col("s").cast(TimestampNTZType).as("ts")))
    assert(fromNtz.schema("ts").dataType === TimestampType)
    assert(fromNtz.head().getTimestamp(0).toInstant.toString ===
      "2024-01-01T00:00:00.123456Z")
    // already TimestampType -> passthrough; no ts column -> no-op
    val already = Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).toDF("ts")
    assert(Tables.normalizeTs(already).schema === already.schema)
    assert(Tables.normalizeTs(Seq(1).toDF("x")).columns.toSeq === Seq("x"))
  }

  test("every testdata table loads with its expected column contract") {
    // name -> (required column, required normalized type); one stable
    // anchor column per table, not the full schema (the generator may
    // legitimately add columns)
    val anchors: Seq[(String, String, DataType)] = Seq(
      ("region", "r_regionkey", IntegerType),
      ("nation", "n_nationkey", IntegerType),
      ("customer", "c_custkey", LongType),
      ("supplier", "s_suppkey", LongType),
      ("part", "p_partkey", LongType),
      ("orders", "o_orderkey", LongType),
      ("lineitem", "l_orderkey", LongType),
      ("events", "ts", TimestampType),
      ("documents", "text", StringType),
      ("embeddings", "vec_id", LongType))
    anchors.foreach { case (table, colName, tpe) =>
      val df = Tables.load(spark, dir, table)
      assert(df.columns.contains(colName), s"$table missing column $colName")
      assert(df.schema(colName).dataType === tpe,
        s"$table.$colName is ${df.schema(colName).dataType}, expected $tpe")
      assert(df.limit(1).count() === 1, s"$table is empty")
    }
  }
}
