package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** Structured-Streaming coverage (SURVEY.md §2.10): watermarked windowed
  * aggregation over a MemoryStream equals the batch groupBy on the same
  * finite input, and flatMapGroupsWithState sessionization equals the
  * window-function batch reference. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private val rows: Seq[(Long, Timestamp, String, Double)] = Seq(
    (1L, ts(0), "view", 1.0), (1L, ts(5), "view", 2.5),
    (2L, ts(7), "purchase", 10.0), (1L, ts(40), "view", 0.5),
    (3L, ts(41), "error", 0.0), (2L, ts(55), "purchase", 3.25),
    (1L, ts(59), "view", 4.0))

  test("watermarked tumbling window (stream) == batch groupBy on replay") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val q = StreamOps.windowedAgg(events, "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("winagg")
      .outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("winagg")
      .orderBy("win_start", "event_type")
      .as[(Timestamp, String, Long, Long)].collect().toSeq
    val exp = StreamOps.windowedAgg(
        rows.toDF("user_id", "ts", "event_type", "value"), window_ = "30 minutes")
      .orderBy("win_start", "event_type")
      .as[(Timestamp, String, Long, Long)].collect().toSeq
    assert(got == exp)
    assert(got.map(_._3).sum == rows.length) // no row lost on full replay
  }

  test("flatMapGroupsWithState sessionization == batch window reference") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val gapMs = 20 * 60 * 1000L
    val events = rows.map(r => StreamOps.Event(r._1, r._2, r._4))
    val q = StreamOps.sessionize(mem.toDS(), gapMs)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    // with NoTimeout a group's open session only closes on that group's
    // next event: send every user a far-future sentinel (its own new open
    // session is never emitted, so it does not pollute the result)
    val far = Timestamp.valueOf("2026-01-02 00:00:00")
    mem.addData(Seq(1L, 2L, 3L).map(u => StreamOps.Event(u, far, 0.0)): _*)
    q.processAllAvailable()
    q.stop()
    // user 1: sessions {10:00,10:05} and {10:40,10:59}; user 2 one
    // session spanning 10:07..10:55? gap 48min > 20min -> two sessions
    val got = spark.table("sessions")
      .select("user_id", "n", "sum_cents", "first_ts", "last_ts")
      .orderBy("user_id", "first_ts")
      .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSeq
    val exp = StreamOps.sessionizeComplete(
        spark.createDataset(events), gapMs)
      .select("user_id", "n", "sum_cents", "first_ts", "last_ts")
      .orderBy("user_id", "first_ts")
      .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSeq
    // stream emitted every session the sentinels closed = all of them
    assert(got == exp)
    assert(exp.count(_._1 == 1L) == 2) // gap split sanity
  }

  test("streaming dedup drops cross-batch duplicates within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val q = StreamOps.dedupStream(events, Seq("user_id", "event_type"),
        watermark = "30 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    // batch 1: duplicate key (1, view) within the batch
    mem.addData((1L, ts(0), "view", 1.0), (1L, ts(5), "view", 2.5),
      (2L, ts(7), "purchase", 10.0))
    q.processAllAvailable()
    // batch 2: (1, view) again within the watermark -> dropped;
    // (3, error) is new -> kept
    mem.addData((1L, ts(10), "view", 9.9), (3L, ts(11), "error", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup")
      .select("user_id", "event_type", "value")
      .orderBy("user_id", "event_type")
      .as[(Long, String, Double)].collect().toSeq
    // first event per key wins; the 2.5 and 9.9 duplicates are dropped
    assert(got == Seq((1L, "view", 1.0), (2L, "purchase", 10.0),
      (3L, "error", 0.0)))
  }

  test("trending terms: stream == batch replay; window top-k is as expected") {
    implicit val sq = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:05:00")
    def at(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val rows = Seq(
      (at(0), "spark spark merge"),
      (at(5), "spark window"),
      (at(40), "merge merge merge window"),   // second 30-min window
      (at(45), "spark")
    )
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val events = mem.toDF().toDF("ts", "text")
    val q = StreamOps.trendingTerms(events, window_ = "30 minutes")
      .writeStream.format("memory").queryName("trending")
      .outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trending")
      .orderBy("win_start", "term")
      .as[(java.sql.Timestamp, String, Long)].collect().toSeq
    val exp = StreamOps.trendingTerms(rows.toDF("ts", "text"),
        window_ = "30 minutes")
      .orderBy("win_start", "term")
      .as[(java.sql.Timestamp, String, Long)].collect().toSeq
    assert(got == exp)
    // window-1 top term is spark(3); window-2 top is merge(3)
    val byWin = got.groupBy(_._1).toSeq.sortBy(_._1.getTime)
    assert(byWin.head._2.maxBy(r => (r._3, r._2))._2 === "spark")
    assert(byWin.last._2.maxBy(r => (r._3, r._2))._2 === "merge")
  }

}
