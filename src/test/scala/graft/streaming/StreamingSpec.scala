package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestBase

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def writeEvents(dir: String): Unit = {
    import spark.implicits._
    val base = 1767225600000L
    val rows = (0 until 500).map { i =>
      (i.toLong, new Timestamp(base + i * 60000L), (i % 7).toLong,
        if (i % 3 == 0) "click" else "view", i.toDouble, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
  }

  test("watermarked windowed counts (AvailableNow) match batch on closed windows") {
    val in = Files.createTempDirectory("ev-in").toString
    val cp = Files.createTempDirectory("ev-cp").toString
    val out = Files.createTempDirectory("ev-out").toString
    writeEvents(in)
    StreamingOps.windowedCounts(spark, in, cp, out)
    val streamed = spark.read.parquet(out)
      .select("win_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = StreamingOps.windowedCountsBatch(spark, in)
      .select("win_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // Append mode emits only windows closed by the final watermark; every
    // streamed window must match its batch counterpart exactly.
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
  }

  test("stream-static enrichment equals the batch join exactly") {
    import spark.implicits._
    val in = Files.createTempDirectory("enr-in").toString
    val cp = Files.createTempDirectory("enr-cp").toString
    val out = Files.createTempDirectory("enr-out").toString
    writeEvents(in)
    // static dim covering only users 0..4: users 5/6 must drop (inner join)
    val dim = (0L to 4L).map(k => (k, (k * 10).toInt)).toDF("c_custkey", "c_nationkey")
    StreamingOps.enrichWithDim(spark, in, cp, out, dim, "c_custkey", "c_nationkey")
    val streamed = spark.read.parquet(out)
      .select("event_id", "user_id", "c_nationkey", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3))).toSet
    val batch = spark.read.parquet(in)
      .join(dim, col("user_id") === col("c_custkey"))
      .select("event_id", "user_id", "c_nationkey", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    assert(!streamed.exists(_._2 > 4L)) // unmatched users dropped
  }

  test("stream-stream time-range join equals the batch join exactly") {
    val in = Files.createTempDirectory("ssj-in").toString
    val cp = Files.createTempDirectory("ssj-cp").toString
    val out = Files.createTempDirectory("ssj-out").toString
    writeEvents(in)
    StreamingOps.streamStreamJoin(spark, in, cp, out)
    val streamed = spark.read.parquet(out)
      .select("imp_id", "user_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = spark.read.parquet(in)
    val batch = ev.filter(col("event_id") % 10 === 5)
      .select(col("event_id").as("imp_id"), col("user_id"), col("ts").as("imp_ts"))
      .join(ev.filter(col("event_id") % 10 === 0)
        .select(col("event_id").as("click_id"), col("user_id").as("cu"),
          col("ts").as("click_ts")),
        expr("user_id = cu AND click_ts >= imp_ts AND " +
          "click_ts <= imp_ts + interval 2880 minutes"))
      .select("imp_id", "user_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("flatMapGroupsWithState sessionization emits gap-separated sessions") {
    import spark.implicits._
    val in = Files.createTempDirectory("sess-in").toString
    val cp = Files.createTempDirectory("sess-cp").toString
    val out = Files.createTempDirectory("sess-out").toString
    val base = 1767225600000L
    val gap = 30 * 60 * 1000L
    // user 1: two sessions separated by >30min; user 2: one session
    val rows = Seq(
      (1L, new Timestamp(base)), (2L, new Timestamp(base + 60000L)),
      (3L, new Timestamp(base + 120000L)),
      (4L, new Timestamp(base + gap + 600000L)), (5L, new Timestamp(base + gap + 660000L)),
      (6L, new Timestamp(base)), (7L, new Timestamp(base + 300000L))
    ).zipWithIndex.map { case ((eid, ts), i) =>
      (eid, ts, if (eid <= 5) 1L else 2L, "e", 0.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(in)
    // Drain mode (the default): a registered processing-time timer would
    // prevent AvailableNow termination.
    StreamingOps.sessionize(spark, in, cp, out)
    val sessions = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // Completed (closed) sessions only: user 1's FIRST session (3 events) is
    // closed by the 30min gap; the trailing sessions stay in state.
    assert(sessions.contains((1L, 3L)))
  }

  test("streaming dedup by key keeps one row per (key, ts) under a watermark") {
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("stream-dedup").toString
    val (in, cp, out) = (s"$dir/in", s"$dir/cp", s"$dir/out")
    val base = 1767225600000L
    // duplicates: same (user_id, ts) appearing multiple times
    val rows = Seq(
      (1L, new Timestamp(base), 5L), (2L, new Timestamp(base), 5L),
      (3L, new Timestamp(base + 1000), 5L), (4L, new Timestamp(base), 6L),
      (5L, new Timestamp(base), 6L), (6L, new Timestamp(base), 6L))
      .map { case (eid, ts, uid) => (eid, ts, uid, "e", 0.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(in)
    StreamingOps.dedupByKey(spark, in, cp, out)
    val got = spark.read.parquet(out).select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).sorted
    assert(got.toSeq == Seq((5L, base), (5L, base + 1000), (6L, base)))
  }

  test("sessionization flushes idle OPEN sessions via ProcessingTimeTimeout") {
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("stream-flush").toString
    val (in, cp, out) = (s"$dir/in", s"$dir/cp", s"$dir/out")
    val base = 1767225600000L
    Seq((1L, new Timestamp(base), 9L, "e", 0.0, "{}"),
      (2L, new Timestamp(base + 1000L), 9L, "e", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(in)
    // CONTINUOUS mode (ProcessingTime trigger + flushOpenOnTimeout): the
    // open session's 2s inactivity timer fires and the session is EMITTED —
    // the behavior NoTimeout could never deliver on a real stream.
    val q = StreamingOps.sessionizeQuery(spark, in, cp, out, gapMs = 2000L,
      flushOpenOnTimeout = true,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
    try {
      var sessions = Array.empty[(Long, Long)]
      val deadline = System.currentTimeMillis() + 60000L
      while (!sessions.contains((9L, 2L)) && System.currentTimeMillis() < deadline) {
        Thread.sleep(1000)
        sessions =
          try spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getLong(2)))
          catch { case _: Exception => Array.empty } // output dir not created yet
      }
      assert(sessions.contains((9L, 2L)), s"open session not flushed: ${sessions.toSeq}")
    } finally q.stop()
  }
}
