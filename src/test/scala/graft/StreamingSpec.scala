package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamAnalytics
import graft.streaming.StreamAnalytics.{Session, SessionEvent}

/** Streaming semantics of the windowed aggregate and the stateful
  * sessionizer: late-data drop under the watermark, exactly-once window
  * emission in append mode, and streaming ≡ batch equivalence for the
  * flatMapGroupsWithState sessionizer.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(8, appName = "streaming-spec")

  private def ts(s: String): Timestamp =
    new Timestamp(Instant.parse(s).toEpochMilli)

  private def us(s: String): Long = Instant.parse(s).toEpochMilli * 1000L

  // ---- windowed aggregation with watermark ----

  test("windowed agg: append emits each closed window once, drops late data, matches batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDS().toDF("ts", "event_type", "value")
    val q = StreamAnalytics.windowedEventStats(
      StreamAnalytics.withEventWatermark(events, "10 minutes"))
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    try {
      val onTime = Seq(
        ("2024-01-01T00:05:00Z", "a", 1.0),
        ("2024-01-01T00:20:00Z", "a", 2.0),
        ("2024-01-01T00:40:00Z", "b", 3.0),
        ("2024-01-01T01:10:00Z", "a", 4.0),
        ("2024-01-01T02:30:00Z", "b", 5.0))
      // batch 1: hour-0 events + one hour-1 event → watermark 01:00
      input.addData(onTime.take(4).map { case (t, k, v) => (ts(t), k, v) })
      q.processAllAvailable()
      // batch 2: hour-2 event + a LATE hour-0 event (00:15 < watermark)
      input.addData(Seq((ts("2024-01-01T02:30:00Z"), "b", 5.0),
        (ts("2024-01-01T00:15:00Z"), "a", 100.0)))
      q.processAllAvailable()
      // two sentinel batches push the watermark past every real window
      input.addData(Seq((ts("2024-01-01T06:00:00Z"), "z", 0.0)))
      q.processAllAvailable()
      input.addData(Seq((ts("2024-01-01T07:00:00Z"), "z", 0.0)))
      q.processAllAvailable()

      val got = spark.table("win_agg")
        .filter($"event_type" =!= "z")
        .as[(Long, String, Long, Double)].collect().toSet
      // batch twin over the on-time events only — the late 100.0 must NOT
      // appear (its window closed before it arrived)
      val batch = StreamAnalytics.windowedEventStats(
        onTime.map { case (t, k, v) => (ts(t), k, v) }.toDF("ts", "event_type", "value"))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(got == batch, s"streaming $got != batch $batch")
      val hour0a = got.find(r => r._1 == us("2024-01-01T00:00:00Z") / 1000000L && r._2 == "a")
      assert(hour0a.exists(r => r._3 == 2 && r._4 == 3.0), s"late row leaked: $hour0a")
      // append mode: no window/type pair emitted twice
      val keys = spark.table("win_agg").select("win_start", "event_type").collect()
      assert(keys.length == keys.distinct.length)
    } finally q.stop()
  }

  // ---- stateful sessionizer ≡ batch sessionization ----

  test("flatMapGroupsWithState sessionizer reproduces batch sessionize exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 3 users, multiple sessions, gap 600 s; intra-batch arrival is
    // shuffled (out-of-order within the 2-minute watermark delay)
    def e(uid: Long, t: String, v: Double) = SessionEvent(uid, ts(t), v)
    val b1 = Seq(
      e(1, "2024-01-01T00:01:00Z", 0.5), e(2, "2024-01-01T00:02:30Z", 1.0),
      e(1, "2024-01-01T00:00:00Z", 1.5), // out of order within the batch
      e(3, "2024-01-01T00:03:00Z", 2.0))
    val b2 = Seq(
      e(1, "2024-01-01T00:08:00Z", 2.5), // same session as 00:01 (gap 420s)
      e(2, "2024-01-01T00:30:00Z", 3.0), // new session (gap 1650s > 600s)
      e(3, "2024-01-01T00:12:50Z", 3.5)) //19:50... 590s gap → same session
    val b3 = Seq(
      e(1, "2024-01-01T01:00:00Z", 4.0), // new session for user 1
      e(2, "2024-01-01T00:31:00Z", 4.5))
    val all = b1 ++ b2 ++ b3

    val input = MemoryStream[SessionEvent]
    val q = StreamAnalytics.trackSessions(input.toDS(), gapSec = 600L,
      watermarkDelay = "2 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
      // Early emission: user 1 has data in EVERY batch, so the timeout path
      // never fires for it — its first session (closed by the watermark
      // after b2: 00:28 > 00:08 + gap) must be emitted from the DATA branch
      // by b3, not parked until the key goes quiet (state-growth regression
      // guard: a continuously-active key must still flush closed sessions).
      assert(spark.table("sessions").as[Session].collect()
        .exists(s => s.user_id == 1L && s.sess_end_us == us("2024-01-01T00:08:00Z")),
        "closed session not emitted while its key stayed active")
      // sentinel batches advance the watermark far past last + gap so every
      // real session times out and flushes
      input.addData(Seq(e(999, "2024-01-01T05:00:00Z", 0.0)))
      q.processAllAvailable()
      input.addData(Seq(e(999, "2024-01-01T06:00:00Z", 0.0)))
      q.processAllAvailable()

      val streamed = spark.table("sessions").as[Session].collect()
        .filter(_.user_id != 999L)
        .map(s => (s.user_id, s.sess_start_us, s.sess_end_us, s.n_events, s.sum_value))
        .toSet
      val batchDf = all.zipWithIndex
        .map { case (ev, i) => (ev.user_id, i.toLong, ev.ts, ev.value) }
        .toDF("user_id", "event_id", "ts", "value")
      val batch = StreamAnalytics.sessionize(batchDf, gapSec = 600L)
        .select($"user_id", $"sess_start_us", $"sess_end_us", $"n_events", $"sum_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      // session identity (key/bounds/count) must match exactly; sum_value
      // within 1e-4: the streaming side sums in exact BigDecimal space,
      // the batch side in shuffle-order doubles, so a half-boundary sum
      // may round one ulp apart (ADVICE round 2).
      def keyed(s: Set[(Long, Long, Long, Long, Double)]) =
        s.map(t => (t._1, t._2, t._3, t._4)) -> s.toSeq.sortBy(t => (t._1, t._2))
      assert(keyed(streamed)._1 == keyed(batch)._1,
        s"streaming $streamed != batch $batch")
      keyed(streamed)._2.zip(keyed(batch)._2).foreach { case (a, b) =>
        assert(math.abs(a._5 - b._5) <= 1e-4, s"sum_value $a vs $b")
      }
      // shape sanity: user 1 has 2 sessions, first spans 00:00–00:08
      assert(streamed.count(_._1 == 1L) == 2)
      assert(streamed.contains((1L, us("2024-01-01T00:00:00Z"),
        us("2024-01-01T00:08:00Z"), 3L, 4.5)))
    } finally q.stop()
  }

  test("splitSessions: boundary gap does not split, strict excess does") {
    val gapUs = 600L * 1000000L
    val atBoundary = List((0L, 1.0), (gapUs, 2.0)) // exactly gap apart → one session
    assert(StreamAnalytics.splitSessions(7L, atBoundary, gapUs) ==
      List(Session(7L, 0L, gapUs, 2L, 3.0)))
    val past = List((0L, 1.0), (gapUs + 1L, 2.0))
    assert(StreamAnalytics.splitSessions(7L, past, gapUs).map(_.n_events) == List(1L, 1L))
    assert(StreamAnalytics.splitSessions(7L, Nil, gapUs).isEmpty)
  }
}
