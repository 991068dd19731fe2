package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.analytics.RelationalQueries.Q

/** Streaming analytics over the event stream: watermarked windowed
  * aggregation and stateful gap sessionization.
  *
  * The reference aggregates per-batch processing stats into time-bucketed
  * report rows (records/sec per run window,
  * Scripts/python/enhanced_main_etl_logging.py:219-286) and groups sample
  * activity into per-study "runs"; here those become the two canonical
  * Structured Streaming shapes the survey's §2.9 mapping calls for:
  *
  *   - [[windowedEventStats]] — a tumbling event-time window aggregate.
  *     The SAME plan runs batch (catalog entry `st1_window_agg`, DuckDB
  *     oracle) and streaming (with [[withEventWatermark]] in front); in
  *     append mode a window is emitted exactly once, when the watermark
  *     passes its end.
  *   - [[trackSessions]] — gap-based sessionization as a typed
  *     `flatMapGroupsWithState` with event-time timeout. Its batch twin
  *     [[sessionize]] (catalog entry `st2_sessionize`, DuckDB oracle) is
  *     plain lag/cumsum window SQL; StreamingSpec asserts the streaming
  *     operator reproduces the batch result exactly.
  *
  * Scale shape: the windowed agg is a partial-agg shuffle on
  * (window, event_type) — state per open window × type, not per event.
  * The sessionizer keys state by user_id (state store partitioned by the
  * group key) and buffers only the OPEN session's events per key — bounded
  * by session length, never by stream length; closed sessions leave the
  * store on event-time timeout, so state is self-truncating under the
  * watermark. Both run identically on a 1000-executor cluster: the state
  * store shards with the shuffle partitioning.
  */
object StreamAnalytics {

  // ---- windowed aggregation ----

  /** Tumbling event-time window stats per event_type. Batch and streaming
    * share this exact plan; window start is emitted as epoch seconds so the
    * DuckDB oracle can recompute it with integer arithmetic.
    */
  def windowedEventStats(events: DataFrame, windowDur: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").cast("long").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming front half: watermark the event-time column so append-mode
    * windows close (and late rows beyond the delay are dropped) before
    * [[windowedEventStats]] aggregates them.
    */
  def withEventWatermark(stream: DataFrame, delay: String = "10 minutes"): DataFrame =
    stream.withWatermark("ts", delay)

  // ---- batch sessionization (the SQL-expressible twin) ----

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapSec` (strict >, measured
    * in microseconds so sub-second timestamps can't straddle the boundary
    * differently across engines). One lag + one running sum + one
    * group-agg — three window/agg passes over a single user_id shuffle.
    */
  def sessionize(events: DataFrame, gapSec: Long): DataFrame = {
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byTime))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_no", sum(col("is_new")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(min(unix_micros(col("ts"))).as("sess_start_us"),
        max(unix_micros(col("ts"))).as("sess_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .orderBy("user_id", "sess_no")
  }

  // ---- streaming sessionization (stateful) ----

  /** Input row of the streaming sessionizer. */
  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

  /** Per-key state: the OPEN session tail — every buffered event is within
    * `gap` of a neighbor, so the buffer is bounded by session length.
    * Stored as (epoch micros, value) pairs; order is restored on close
    * (events may arrive out of order within the watermark delay).
    */
  final case class OpenBuffer(events: List[(Long, Double)])

  /** A closed session. Micros timestamps match [[sessionize]]'s output. */
  final case class Session(user_id: Long, sess_start_us: Long, sess_end_us: Long,
      n_events: Long, sum_value: Double)

  private def micros(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Split a sorted event buffer into gap-separated groups (> gapUs apart);
    * groups ascend and each group's events ascend.
    */
  private[graft] def splitGroups(sorted: List[(Long, Double)],
      gapUs: Long): List[List[(Long, Double)]] =
    if (sorted.isEmpty) Nil
    else sorted.tail.foldLeft(List(List(sorted.head))) {
      case (acc @ (cur :: rest), e) =>
        if (e._1 - cur.head._1 > gapUs) List(e) :: acc else (e :: cur) :: rest
      case (Nil, e) => List(List(e))
    }.reverse.map(_.reverse)

  /** Split a sorted event buffer into sessions at gaps > gapUs. */
  private[graft] def splitSessions(uid: Long, sorted: List[(Long, Double)],
      gapUs: Long): List[Session] =
    splitGroups(sorted, gapUs).map { s =>
      // Sum in EXACT BigDecimal space (order-independent), round once:
      // a double fold in buffer order vs the batch twin's shuffle-order
      // sum could land on opposite sides of a HALF_UP boundary.
      // Residual caveat: the batch twin still sums DOUBLES, so a session
      // whose accumulated double error itself crosses a 1e-4 HALF_UP
      // boundary (needs ~1e-13-scale alignment) could differ from this
      // exact sum by one rounding step — removing the order-dependence
      // flake does not make double-vs-exact bit-identical in principle.
      val exact = s.foldLeft(BigDecimal(0))((acc, e) => acc + BigDecimal(e._2))
      Session(uid, s.head._1, s.last._1, s.size.toLong,
        exact.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }

  /** Stateful gap sessionization: buffer the open session per user, close
    * it when the event-time watermark passes last-event + gap.
    *
    * Correctness under out-of-order arrival: events later than the
    * watermark delay are dropped by the watermark itself; events within
    * the delay land in the buffer and are re-sorted on close. The timeout
    * fires only once the watermark passes `last + gap` — past that point
    * any surviving event has ts ≥ watermark ≥ last + gap and would start a
    * new session anyway, so closing is safe (no session can be split by a
    * straggler).
    */
  def trackSessions(events: Dataset[SessionEvent], gapSec: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapSec * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenBuffer, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenBuffer]) =>
          if (state.hasTimedOut) {
            val buf = state.get.events.sortBy(_._1)
            state.remove()
            splitSessions(uid, buf, gapUs).iterator
          } else {
            val merged = (state.getOption.map(_.events).getOrElse(Nil) ++
              it.map(e => (micros(e.ts), e.value))).sortBy(_._1)
            // Watermark-closed groups are emitted NOW, from the data
            // branch: EventTimeTimeout fires only for keys with NO data in
            // a batch, so a continuously-active key would otherwise hold
            // every past session in its buffer forever — state growth
            // O(stream length) and closed sessions withheld until the key
            // goes quiet. A group whose last event + gap is strictly below
            // the watermark can never gain another event (survivors have
            // ts ≥ watermark), so it is final; only the open tail stays.
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (closed, open) = splitGroups(merged, gapUs)
              .partition(g => g.last._1 + gapUs < wmUs)
            if (open.isEmpty) state.remove()
            else {
              state.update(OpenBuffer(open.flatten))
              // CEIL micros→millis: flooring could fire the timeout up to
              // ~1 ms before last+gap, splitting a session whose next event
              // sits exactly on the gap boundary.
              val lastMs = (open.last.last._1 + 999L) / 1000L
              // The timeout must sit strictly above the current watermark;
              // if the watermark already passed last+gap (possible when
              // gap < watermark delay), close on the next trigger instead.
              state.setTimeoutTimestamp(
                math.max(lastMs + gapSec * 1000L, state.getCurrentWatermarkMs() + 1))
            }
            closed.flatMap(g => splitSessions(uid, g, gapUs)).iterator
          }
      }
  }

  // ---- driver catalog entries ----

  // events.parquet stores ts as TIMESTAMP_NTZ; window()/unix_micros need
  // TIMESTAMP. The session timezone is pinned UTC, so the cast is
  // value-identical (and matches DuckDB's epoch arithmetic).
  private def ev(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))

  /** ST1 ▸ tumbling-window event stats (batch form of the streaming
    * windowed agg — identical plan, no watermark needed at rest).
    */
  private val st1 = Q("st1_window_agg",
    (spark, dir) => windowedEventStats(ev(spark, dir))
      .orderBy("win_start", "event_type"),
    Some("""SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start,
            event_type, CAST(count(*) AS BIGINT) AS n_events,
            round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY win_start, event_type"""))

  /** ST2 ▸ gap sessionization, batch twin of [[trackSessions]] (30-minute
    * gap). StreamingSpec proves the stateful streaming operator reproduces
    * exactly these rows.
    */
  private val st2 = Q("st2_sessionize",
    (spark, dir) => sessionize(ev(spark, dir), gapSec = 1800L),
    Some("""WITH marked AS (
              SELECT user_id, ts, event_id, value,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            numbered AS (
              SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess_no
              FROM marked)
            SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
                   CAST(min(epoch_us(ts)) AS BIGINT) AS sess_start_us,
                   CAST(max(epoch_us(ts)) AS BIGINT) AS sess_end_us,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM numbered GROUP BY user_id, sess_no
            ORDER BY user_id, sess_no"""))

  val all: Seq[Q] = Seq(st1, st2)
}
