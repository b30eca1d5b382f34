package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Batch jobs are the unit for the extraction pipeline (snapshot-based
  * resume, SURVEY.md §1.2); these streaming ops cover the streaming-ingest
  * side of a training-data platform: watermarked windowed aggregation and
  * custom sessionization state via flatMapGroupsWithState. Tests drive them
  * with Trigger.AvailableNow over file sources — the same code runs
  * continuously on a real cluster.
  */
object StreamingOps {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked 1-hour tumbling-window counts per event_type, written to
    * parquet with AvailableNow (runs to completion over current input).
    */
  def windowedCounts(spark: SparkSession, inputDir: String, checkpointDir: String,
                     outDir: String): Unit = {
    val stream = spark.readStream
      .schema(eventSchema)
      .parquet(inputDir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
  }

  /** Batch-equivalent of windowedCounts (used by tests to cross-check the
    * streaming result; with AvailableNow + append mode, only windows below
    * the final watermark are emitted, so tests compare on those).
    */
  def windowedCountsBatch(spark: SparkSession, inputDir: String): DataFrame =
    spark.read.schema(eventSchema).parquet(inputDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming dedup on the (key, ts) PAIR with a watermark bound on state
    * (the streaming analogue of the batch url-dedup): keeps the first row
    * per distinct (keyCol, tsCol) — rows with the same key but different
    * timestamps all survive (use dropDuplicatesWithinWatermark(keyCol) for
    * per-key-only dedup). State for pairs older than the watermark is
    * dropped, so memory is bounded by the churn window, not the stream
    * history; a watermark longer than the data span makes the result exactly
    * `SELECT DISTINCT key, ts` regardless of how the source batches.
    */
  def dedupByKey(spark: SparkSession, inputDir: String, checkpointDir: String,
                 outDir: String, keyCol: String = "user_id",
                 tsCol: String = "ts", watermark: String = "1 hour"): Unit = {
    val stream = spark.readStream.schema(eventSchema).parquet(inputDir)
    val q = stream
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keyCol, tsCol)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
  }

  /** Stream-static enrichment: the event stream inner-joined to a STATIC
    * broadcast dimension on user_id = dimKey, emitting
    * (event_id, user_id, <dimVal>, event_type). Stateless (no watermark
    * state, no stream-stream buffering), so Append emits exactly the batch
    * join regardless of how the file source batches — the streaming
    * analogue of the pipeline's broadcast golden-verification join, and the
    * 100-TB shape for dimension joins: the dim is broadcast, the stream
    * never shuffles.
    */
  def enrichWithDim(spark: SparkSession, inputDir: String, checkpointDir: String,
                    outDir: String, dim: DataFrame, dimKey: String,
                    dimVal: String): Unit = {
    val stream = spark.readStream.schema(eventSchema).parquet(inputDir)
    val joined = stream.join(broadcast(dim), stream("user_id") === dim(dimKey))
      .select(stream("event_id"), stream("user_id"), dim(dimVal),
        stream("event_type"))
    val q = joined.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
  }

  /** STREAM-STREAM inner join with an event-time range: "impressions"
    * (event_id % 10 == 5) joined to "clicks" (event_id % 10 == 0) of the
    * same user with the click inside [imp_ts, imp_ts + 48 h] — the
    * attribution-join shape. Both sides carry watermarks (they bound the
    * join STATE retention: buffered rows older than watermark + range are
    * dropped — the 100-TB knob that keeps state finite on an unbounded
    * stream); inner-join OUTPUT is not watermark-gated, and the file
    * source under AvailableNow delivers everything, so the result equals
    * the batch join with the same predicate — which is exactly what the
    * x45 oracle states in SQL. (The gate's 3650-day watermark makes the
    * equality exact even if the source splits batches; production uses a
    * retention-sized delay.)
    */
  def streamStreamJoin(spark: SparkSession, inputDir: String, checkpointDir: String,
                       outDir: String, watermark: String = "3650 days",
                       rangeMinutes: Int = 2880): Unit = {
    val imps = spark.readStream.schema(eventSchema).parquet(inputDir)
      .filter(col("event_id") % 10 === 5)
      .select(col("event_id").as("imp_id"), col("user_id"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermark)
    val clicks = spark.readStream.schema(eventSchema).parquet(inputDir)
      .filter(col("event_id") % 10 === 0)
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val joined = imps.join(clicks,
      expr(s"user_id = click_user AND click_ts >= imp_ts AND " +
        s"click_ts <= imp_ts + interval $rangeMinutes minutes"))
      .select(col("imp_id"), col("user_id"), col("click_id"))
    val q = joined.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
  }

  final case class SessionState(start: Long, last: Long, events: Long)
  final case class SessionOut(user_id: Long, session_start: Timestamp, n_events: Long,
                              duration_ms: Long)

  /** Custom sessionization with a 30-minute inactivity gap via
    * flatMapGroupsWithState (KeyValueGroupedDataset custom state).
    *
    * With `flushOpenOnTimeout` (the production default) the state uses
    * ProcessingTimeTimeout so an idle user's OPEN session is flushed after
    * the gap elapses on a continuously-running stream — with NoTimeout it
    * would be held forever. NB under Trigger.AvailableNow a registered
    * processing-time timer delays query termination until it fires, so
    * drain-style batch verification jobs pass `flushOpenOnTimeout = false`
    * (open sessions intentionally stay buffered, as before).
    */
  def sessionize(spark: SparkSession, inputDir: String, checkpointDir: String,
                 outDir: String, gapMs: Long = 30 * 60 * 1000L,
                 flushOpenOnTimeout: Boolean = false): Unit =
    sessionizeQuery(spark, inputDir, checkpointDir, outDir, gapMs,
      flushOpenOnTimeout, Trigger.AvailableNow()).awaitTermination()

  /** Non-blocking variant returning the running query (continuous jobs pass
    * Trigger.ProcessingTime + flushOpenOnTimeout = true and manage the query
    * handle themselves). NB a registered processing-time timer prevents an
    * AvailableNow query from terminating, so the drain-style `sessionize`
    * defaults to flushOpenOnTimeout = false.
    */
  def sessionizeQuery(spark: SparkSession, inputDir: String, checkpointDir: String,
                      outDir: String, gapMs: Long,
                      flushOpenOnTimeout: Boolean,
                      trigger: Trigger): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val stream = spark.readStream.schema(eventSchema).parquet(inputDir)
      .select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)]
    val timeoutConf =
      if (flushOpenOnTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val sessions = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Inactivity gap elapsed in wall-clock: emit the open session.
            val st = state.getOption.getOrElse(SessionState(-1L, -1L, 0L))
            state.remove()
            if (st.start >= 0)
              Iterator.single(SessionOut(userId, new Timestamp(st.start), st.events,
                st.last - st.start))
            else Iterator.empty
          } else {
            val sorted = rows.map(_._2.getTime).toSeq.sorted
            var st = state.getOption.getOrElse(SessionState(-1L, -1L, 0L))
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            for (t <- sorted) {
              if (st.start < 0) st = SessionState(t, t, 1)
              else if (t - st.last > gapMs) {
                out += SessionOut(userId, new Timestamp(st.start), st.events, st.last - st.start)
                st = SessionState(t, t, 1)
              } else
                // `last` is monotone: a CROSS-BATCH late event (earlier than
                // state.last — sorting is per-batch only) joins the open
                // session but must not move its end backwards, which would
                // yield negative durations and wrongly merge later events
                // that exceeded the real gap. (Event-time watermarking is
                // the production bound on how late such events can be.)
                st = st.copy(last = math.max(st.last, t), events = st.events + 1)
            }
            state.update(st)
            if (flushOpenOnTimeout) state.setTimeoutDuration(gapMs)
            out.iterator
          }
      }
    sessions.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
