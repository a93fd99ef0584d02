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
