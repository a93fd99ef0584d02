package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Bucketed co-located join: the written layout must (a) survive a
  * catalog round-trip, (b) sort-merge join with ZERO exchanges — the
  * whole point of paying the bucket shuffle at write time — and (c)
  * produce exactly the plain join's rows.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed sort-merge join plans zero exchanges and matches the plain join") {
    val dir = java.nio.file.Files.createTempDirectory("bucketing_spec").toString
    val li = Bucketing.writeBucketed(spark, graft.Tables.lineitem(spark, sf),
      "spec_li_bucketed", s"$dir/li", "l_orderkey", buckets = 4)
    val ord = Bucketing.writeBucketed(spark, graft.Tables.orders(spark, sf),
      "spec_ord_bucketed", s"$dir/ord", "o_orderkey", buckets = 4)
    val savedBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the sort-merge path (broadcast would also be exchange-free
      // but only because the fixture is small; SMJ is the 100-TB plan)
      // and freeze the static plan for inspection
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join must not shuffle, found ${exchanges.size} exchange(s)")
      // single-file buckets + sortBy can additionally drop the SortExec —
      // Spark trusts the written per-bucket order only behind the legacy
      // outputOrdering flag (one file per bucket is a prerequisite, which
      // is why writeBucketed repartitions before writing). Default plan
      // keeps a cheap in-memory re-sort; with the flag the join is pure
      // merge. Pin both.
      val sortsDefault = joined.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sortsDefault.nonEmpty) // documents the default; change = re-pin
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val merged = spark.table("spec_li_bucketed")
        .join(spark.table("spec_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"))
      val sortsOrdered = merged.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sortsOrdered.isEmpty,
        s"single-file sorted buckets must merge without SortExec, found ${sortsOrdered.size}")

      val plain = graft.Tables.lineitem(spark, sf)
        .join(graft.Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"))
      assert(joined.count() === plain.count())
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS spec_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS spec_ord_bucketed")
    }
  }

  test("writeBucketedAuto derives collision-free names: two concurrent writes of the same prefix coexist") {
    val dir = java.nio.file.Files.createTempDirectory("bucketing_auto").toString
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // same prefix, different paths — the path-derived token must keep the
    // two catalog entries (and their files) fully independent even when
    // the writes overlap in time
    val fa = Future(Bucketing.writeBucketedAuto(spark,
      graft.Tables.region(spark, sf), "spec_auto", s"$dir/a", "r_regionkey", 2))
    val fb = Future(Bucketing.writeBucketedAuto(spark,
      graft.Tables.nation(spark, sf), "spec_auto", s"$dir/b", "n_nationkey", 2))
    val (a, b) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    assert(a.count() === graft.Tables.region(spark, sf).count())
    assert(b.count() === graft.Tables.nation(spark, sf).count())
    val autoTables = spark.catalog.listTables()
      .filter(col("name").startsWith("spec_auto")).collect()
    assert(autoTables.length === 2, s"expected 2 distinct auto tables, got ${autoTables.mkString(",")}")
    autoTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${Bucketing.quoteIdent(t.name)}"))
  }

  test("quoteIdent escapes metacharacters so hostile names fail loudly, not weirdly") {
    assert(Bucketing.quoteIdent("a`b; DROP TABLE x") === "`a``b; DROP TABLE x`")
    // a name with SQL metacharacters is treated as one identifier: the
    // DROP parses, and the write rejects the invalid name rather than
    // executing anything embedded in it
    intercept[Exception] {
      Bucketing.writeBucketed(spark, graft.Tables.region(spark, sf),
        "bad; DROP TABLE spec_li_bucketed", "/tmp/bucketing_bad", "r_regionkey", 2)
    }
  }
}
