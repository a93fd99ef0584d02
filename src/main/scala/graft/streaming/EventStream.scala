package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table shape (SURVEY.md §2.9 is
  * empty for the reference — this is the pipeline-side extension: the same
  * event-time logic as q_events_hourly, expressed as an incremental
  * streaming job with watermarks and custom session state).
  *
  * The batch and streaming plans share the transformation functions below,
  * so correctness is testable in batch (DuckDB oracle) while deployment can
  * run `readStream` with checkpointing unchanged.
  */
object EventStream {

  /** File-source streams need an explicit schema; rather than hardcode one
    * (the events fixture has shipped `ts` as both INT64 nanos and
    * TIMESTAMP(MICROS) across generations), probe the directory's existing
    * files with a batch read and stream with whatever physical schema is
    * actually there. Tables.normalizeEventTs then gives the streaming plan
    * the same (`ts` timestamp, `ts_ns` long) contract as the batch readers.
    * Requires at least one file present at start — true for any parquet
    * drop-directory deployment and for the specs.
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physical: StructType = spark.read.parquet(dir).schema
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(physical).parquet(dir))
  }

  /** Tumbling-window aggregation with late-data watermark: the canonical
    * incremental rollup (5-minute windows, 10-minute lateness bound keeps
    * state finite on unbounded streams).
    */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  // ---- custom session state (flatMapGroupsWithState) ----

  final case class Event(event_id: Long, user_id: Long, ts_us: Long,
                         event_type: String, value: Double)
  final case class SessionState(firstTs: Long, lastTs: Long, n: Long, total: Double)
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long, total_value: Double)

  /** Gap-based sessionization: a user's events belong to one session until
    * a `gapUs` quiet period; emits the closed session. State is bounded by
    * ACTIVE users: a processing-time timeout (gap-scaled) flushes and
    * removes the state of users who go quiet, so long-idle users neither
    * leak state nor lose their final session.
    */
  def sessionize(events: Dataset[Event], gapUs: Long)
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // user went quiet: close and emit their final session
            val out = state.getOption
              .map(s => Session(userId, s.firstTs, s.lastTs, s.n, s.total))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts_us - s.lastTs <= gapUs =>
                  // out-of-order safe: extend the window in both
                  // directions rather than overwriting lastTs
                  cur = Some(s.copy(
                    firstTs = math.min(s.firstTs, e.ts_us),
                    lastTs = math.max(s.lastTs, e.ts_us),
                    n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  out += Session(userId, s.firstTs, s.lastTs, s.n, s.total)
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                // flush after ~gap of wall-clock inactivity (timeouts are
                // a streaming concern; they never fire in batch execution)
                state.setTimeoutDuration(math.max(1000L, gapUs / 1000L))
              case None => state.remove()
            }
            out.iterator
          }
      }
  }

  /** Batch form of the same sessionization (lag + cumulative-sum session
    * ids), used for oracle-style equivalence checks of the streaming path.
    */
  def sessionizeBatch(events: DataFrame, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .withColumn("prev_ts", lag("ts_us", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        count(lit(1)).as("n_events"),
        sum("value").as("total_value"))
      .drop("session_id")
  }

  /** Stream-STREAM event-time interval join — each view paired with the
    * same user's purchases inside `within` after it (the conversion-
    * attribution shape). Watermarks on BOTH inputs plus the closed time
    * interval are what let Structured Streaming bound the join state:
    * views age out once the purchase watermark passes view_ts + within,
    * purchases once the view watermark passes buy_ts. The same function
    * runs in batch (withWatermark is a no-op there), which is how the
    * q_event_convert oracle checks it; EventStreamSpec runs the genuine
    * two-stream form and asserts batch equivalence.
    */
  def conversionPairs(events: DataFrame, within: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val views = events.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val buys = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id").as("_buy_user"),
        col("ts").as("buy_ts"))
      .withWatermark("buy_ts", watermark)
    views.join(buys,
      col("user_id") === col("_buy_user") &&
        col("buy_ts") >= col("view_ts") &&
        col("buy_ts") < col("view_ts") + expr(s"INTERVAL $within"))
      .select("view_id", "buy_id", "user_id")
  }

  /** Offline half of the anomaly gate: per-type mean/stddev of the
    * historical hourly counts — a types-sized relation (the "model"),
    * trained in batch and broadcast at serve time.
    */
  def hourlyStats(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"))
      .groupBy("event_type")
      .agg(avg("n").as("mean_n"), stddev_pop(col("n")).as("sd_n"))

  /** Streaming per-type hourly anomaly gate — q_event_anomaly's
    * train-offline / score-online form: the live stream's watermarked
    * windowed counts broadcast-joined against [[hourlyStats]]' frozen
    * per-type baseline, flagging |z| > 2 ON THE 4-DP-ROUNDED z (the
    * batch query's rounding discipline — a borderline window can't flag
    * differently between a batch backfill and the live stream). State is
    * the windowed agg's only (watermark-bounded); the stats join is
    * stream-static broadcast, so nothing data-sized shuffles twice.
    * Runs unchanged in batch (withWatermark is a no-op), which is how
    * EventStreamSpec pins stream ≡ batch.
    */
  def anomalyFlags(events: DataFrame, stats: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val counts = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"))
    val z = when(col("sd_n") > 0,
      round((col("n") - col("mean_n")) / col("sd_n"), 4)).otherwise(lit(0.0))
    counts.join(broadcast(stats), "event_type")
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n").cast("long").as("n"), z.as("z"),
        when(abs(z) > 2, 1).otherwise(0).as("anomaly"))
  }
}
