package graft.streaming

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class EventStreamSpec extends SparkSpec {

  test("streaming windowed counts match the batch aggregation") {
    // stream the sf0.001 events dir through a memory sink
    val dir = java.nio.file.Files.createTempDirectory("stream").toString
    // stage the events parquet into a stream-source dir
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(dir)

    val stream = EventStream.readStream(spark, dir)
    val agg = EventStream.windowedCounts(stream, "1 hour", "2 hours")
    // complete mode: with one AvailableNow micro-batch the watermark never
    // advances, so append would emit nothing; complete shows every window
    // and must equal the batch computation exactly
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory").queryName("hourly_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly_out")
      .select(col("window_start"), col("event_type"), col("n"), col("total"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = EventStream.windowedCounts(
      Tables.events(spark, sf), "1 hour", "2 hours")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed.nonEmpty, "streaming emitted no windows")
    assert(streamed == batch,
      s"stream/batch mismatch: missing=${batch.diff(streamed).take(3)} extra=${streamed.diff(batch).take(3)}")
  }

  test("streaming anomaly gate matches the batch scoring against the same frozen stats") {
    val dir = java.nio.file.Files.createTempDirectory("anomstream").toString
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(dir)

    // the "model": per-type stats trained offline on the history
    val stats = EventStream.hourlyStats(Tables.events(spark, sf))
    val stream = EventStream.readStream(spark, dir)
    val flagged = EventStream.anomalyFlags(stream, stats)
    val q = flagged.writeStream
      .outputMode("complete")
      .format("memory").queryName("anomaly_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    val streamed = rows(spark.table("anomaly_out"))
    val batch = rows(EventStream.anomalyFlags(Tables.events(spark, sf), stats))
    assert(streamed.nonEmpty, "streaming emitted no scored windows")
    assert(streamed == batch,
      s"stream/batch mismatch: missing=${batch.diff(streamed).take(3)} extra=${streamed.diff(batch).take(3)}")
    // at least the flag column is exercised both ways in this fixture
    assert(streamed.exists(_._5 == 0))
  }

  test("stream-stream interval join matches the batch join") {
    val dir = java.nio.file.Files.createTempDirectory("convstream").toString
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(dir)

    // genuine two-stream join: both sides derive from the same readStream
    // source but are independent streaming relations after the filters
    val stream = EventStream.readStream(spark, dir)
    val joined = EventStream.conversionPairs(stream, "1 hour", "2 hours")
    // inner stream-stream joins emit matches as they arrive — append works
    // with a single AvailableNow micro-batch
    val q = joined.writeStream
      .outputMode("append")
      .format("memory").queryName("convert_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("convert_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EventStream.conversionPairs(
      Tables.events(spark, sf), "1 hour", "2 hours")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty, "streaming join emitted no pairs")
    assert(streamed == batch,
      s"stream/batch mismatch: missing=${batch.diff(streamed).take(3)} extra=${streamed.diff(batch).take(3)}")
  }

  test("stream-stream join state survives restart: purchase pairs with pre-restart view") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(mm: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$mm%02d:00")
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val base = java.nio.file.Files.createTempDirectory("convckpt").toString
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("view_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("buy_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType)))
    def runBatch(): Set[(Long, Long)] = {
      val joined = EventStream.conversionPairs(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type"),
        "1 hour", "2 hours")
      val q = joined.writeStream.outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .format("parquet").option("path", s"$base/pairs")
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        q.awaitTermination(180000)
        spark.read.schema(outSchema).parquet(s"$base/pairs")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally q.stop()
    }
    // run 1: only the view arrives — it must be buffered in join state
    mem.addData(Seq((10L, ts(0), 1L, "view")))
    assert(runBatch().isEmpty)
    // run 2 (fresh query over the same checkpoint): the purchase must
    // pair against the view recovered from run 1's state
    mem.addData(Seq((20L, ts(10), 1L, "purchase"),
      (30L, ts(11), 2L, "purchase"))) // different user: no pair
    val pairs = runBatch()
    assert(pairs == Set((10L, 20L)),
      s"expected the recovered view to pair with the new purchase, got $pairs")
  }

  test("stateful sessionization matches the batch window form") {
    import spark.implicits._
    implicit val s = spark
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"),
        col("event_type"), col("value"))
    val gap = 30L * 60 * 1000000 // 30 minutes

    val typed = events.as[EventStream.Event]
    // run flatMapGroupsWithState in batch mode (single micro-batch
    // semantics): all groups processed once, final open sessions stay in
    // state; compare closed sessions against the batch form minus each
    // user's last session
    val streamSessions = EventStream.sessionize(typed, gap).collect()
      .map(x => (x.user_id, x.start_us, x.end_us, x.n_events)).toSet

    val batchAll = EventStream.sessionizeBatch(events, gap)
    import org.apache.spark.sql.expressions.Window
    val notLast = batchAll.withColumn("rk",
      row_number().over(Window.partitionBy("user_id").orderBy(col("start_us").desc)))
      .where(col("rk") > 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    assert(streamSessions == notLast,
      s"closed sessions mismatch: missing=${notLast.diff(streamSessions).take(3)} extra=${streamSessions.diff(notLast).take(3)}")
  }
}
