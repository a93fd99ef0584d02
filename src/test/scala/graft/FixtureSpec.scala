package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the driver-generated fixture schemas and both `Tables.normalizeEventTs`
  * branches, so the next silent fixture regeneration (in either direction)
  * fails HERE with a readable diff instead of erroring 9 queries deep
  * (round-6 post-commit drift: events.ts INT64-nanos → TIMESTAMP(MICROS)).
  */
class FixtureSpec extends SparkSpec {

  /** expected logical schema as Spark reads each raw fixture file */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  private def diff(name: String, got: StructType, want: Seq[(String, DataType)]): Unit = {
    val g = got.fields.map(f => (f.name, f.dataType)).toSeq
    assert(g == want,
      s"""$name fixture schema drifted:
         |  got:  ${g.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")}
         |  want: ${want.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")}
         |If the driver regenerated /root/testdata, update Tables.scala consumers
         |(and this spec) deliberately — do not let queries discover it.""".stripMargin)
  }

  for ((name, want) <- expected.toSeq.sortBy(_._1))
    test(s"fixture schema: $name") {
      diff(name, spark.read.parquet(s"$sf/$name.parquet").schema, want)
    }

  test("fixture schema: events (raw ts is nanos-long or timestamp)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val got = spark.read.parquet(s"$sf/events.parquet").schema
    val tsType = got("ts").dataType
    assert(tsType == LongType || tsType == TimestampType || tsType == TimestampNTZType,
      s"events.ts read as ${tsType.simpleString}; Tables.normalizeEventTs cannot dispatch on it")
    val others = got.fields.filter(_.name != "ts").map(f => (f.name, f.dataType)).toSeq
    assert(others == Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
  }

  test("normalized events contract: ts timestamp in place, ts_ns long appended") {
    val df = Tables.events(spark, sf)
    assert(df.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props", "ts_ns"))
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ts_ns").dataType == LongType)
    // ts and ts_ns must agree at μs precision
    val bad = df.where(unix_micros(col("ts")) =!= expr("ts_ns div 1000")).count()
    assert(bad == 0, s"$bad rows where ts disagrees with ts_ns")
  }

  test("normalizeEventTs: legacy INT64-nanos branch") {
    import spark.implicits._
    val nanos = 1704153600000000000L + 1500L // 2024-01-02T00:00:00Z + 1.5 μs
    val raw = Seq((1L, nanos, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Tables.normalizeEventTs(raw)
    val r = out.select("ts_ns", "ts").head()
    assert(r.getLong(0) == nanos)
    // μs truncation: 1500 ns → 1 μs
    assert(r.getTimestamp(1).toInstant ==
      java.time.Instant.parse("2024-01-02T00:00:00.000001Z"))
    assert(out.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props", "ts_ns"))
  }

  test("normalizeEventTs: TIMESTAMP branch") {
    import spark.implicits._
    val inst = java.time.Instant.parse("2024-01-02T03:04:05.000006Z")
    val raw = Seq((1L, java.sql.Timestamp.from(inst), 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Tables.normalizeEventTs(raw)
    val r = out.select("ts_ns", "ts").head()
    assert(r.getLong(0) == 1704164645000006L * 1000L)
    assert(r.getTimestamp(1).toInstant == inst)
    assert(out.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props", "ts_ns"))
  }

  test("normalizeEventTs: TIMESTAMP_NTZ branch (wall clock read as UTC)") {
    val ntz = spark.sql(
      """SELECT 1L AS event_id, TIMESTAMP_NTZ'2024-01-02 03:04:05.000006' AS ts,
        |7L AS user_id, 'view' AS event_type, 1.0D AS value, '{}' AS props""".stripMargin)
    val out = Tables.normalizeEventTs(ntz)
    assert(out.schema("ts").dataType == TimestampType)
    val r = out.select("ts_ns").head()
    assert(r.getLong(0) == 1704164645000006L * 1000L)
  }
}
