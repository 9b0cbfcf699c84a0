package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Det.r4

/** Streaming-capable transforms over the events schema
  * (ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, …).
  *
  * Each takes a DataFrame that may be a batch table OR a `readStream`
  * source — the logical plan is identical; under `MicroBatchExecution` the
  * stateful ops (window/session/dropDuplicates) maintain state stores
  * bounded by the watermark. The scalatest streaming suite drives these
  * with MemoryStream and asserts watermark/late-data/output-mode behavior;
  * the batch-equivalent results are oracle-checked via SparkEntry
  * (`j_*` keys).
  */
object StreamOps {

  /** 1-hour tumbling event-time window counts/sums. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"), r4(sum("value")).as("sum_val"))
      .select(col("window.start").as("ws"), col("cnt"), col("sum_val"))

  /** 1-hour window sliding every 15 minutes. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"), r4(sum("value")).as("sum_val"))
      .select(col("window.start").as("ws"), col("cnt"), col("sum_val"))

  /** 30-minute-gap session windows per user. */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming dedup: first event per (user, type) within the watermark.
    * Only meaningful on a stream (batch dropDuplicates keeps an arbitrary
    * row — the declared batch-equivalent key uses min_by instead). */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("user_id", "event_type")

  /** Watermarked tumbling aggregation — late rows beyond `watermark` are
    * dropped by the streaming engine (asserted in StreamingSpec). */
  def tumblingWithWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    tumbling(events.withWatermark("ts", watermark))

  /** Stream-stream interval join: each click joined to the same user's
    * views in the preceding 10 minutes. The same plan runs on batch frames
    * and on watermarked streams; in streaming, the time-range condition is
    * what lets the engine bound BOTH join state stores (a buffered view is
    * evicted once the click-side watermark passes view_ts + 10 min) — an
    * unconstrained stream-stream join would retain state forever.
    * Inputs are pre-shaped: clicks(user_id, click_id, click_ts),
    * views(v_user, view_id, view_ts). */
  def clickViewIntervalJoin(clicks: DataFrame, views: DataFrame,
      joinType: String = "inner"): DataFrame =
    clicks.join(views,
      col("user_id") === col("v_user") &&
        col("view_ts") >= col("click_ts") - expr("INTERVAL 10 MINUTES") &&
        col("view_ts") <= col("click_ts"),
      joinType)
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))

  /** Custom per-key state via flatMapGroupsWithState: running event count
    * and cumulative value per user, emitted on every update. The state
    * store holds one (count, sum) pair per user — bounded by key
    * cardinality, not event volume, so it scales to arbitrarily long
    * streams. GroupStateTimeout is not set because the fixture stream is
    * finite; a production deployment would use EventTimeTimeout with the
    * watermark to expire idle users.
    */
  def runningUserTotals(events: org.apache.spark.sql.Dataset[UserEvent])
      : org.apache.spark.sql.Dataset[UserTotal] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotal, UserTotal](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user: Long, rows: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserTotal(user, prev.n + batch.size, prev.total + batch.map(_.value).sum)
          state.update(next)
          Iterator(next)
      }
  }

  /** Gap-based sessionization with custom state AND state EVICTION via
    * EventTimeTimeout — the pattern a 100 TB stream needs: an idle user's
    * open session leaves the state store when the event-time watermark
    * passes `last_event + gap`, emitting the closed session exactly once
    * (Append mode). Contrast with `sessions` (the built-in
    * session_window): this form owns the state lifecycle, so it can
    * carry arbitrary per-session payload and decide eviction itself.
    * State per key is one (start, last, count) triple — bounded by key
    * cardinality, evicted on timeout, never by event volume.
    *
    * State is kept in epoch MICROSECONDS (the driver fixtures carry µs
    * precision; ms-granular state would silently truncate session
    * bounds). Timeout registration converts to ms — that is the
    * granularity Spark's state timeout API takes.
    */
  def sessionize(events: org.apache.spark.sql.Dataset[SessEvent],
      gapMinutes: Int = 30, watermarkDelay: String = "1 hour")
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60 * 1000000L
    def us(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def ts(u: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(math.floorDiv(u, 1000000L) * 1000L)
      t.setNanos((math.floorMod(u, 1000000L) * 1000L).toInt)
      t
    }
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user: Long, rows: Iterator[SessEvent], state: GroupState[OpenSession]) =>
          def close(s: OpenSession) = SessionOut(user, ts(s.startUs), ts(s.lastUs), s.n)
          if (state.hasTimedOut) {
            // watermark passed last + gap: the session is closed for good
            val s = state.get
            state.remove()
            Iterator(close(s))
          } else {
            // a micro-batch delivers a group's rows unordered — sort by
            // event time before applying the gap rule
            val evs = rows.toSeq.sortBy(e => us(e.ts))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            for (e <- evs) {
              val t = us(e.ts)
              cur = cur match {
                case Some(s) if t - s.lastUs >= gapUs =>
                  closed ::= close(s); Some(OpenSession(t, t, 1L))
                case Some(s) =>
                  Some(OpenSession(s.startUs, math.max(s.lastUs, t), s.n + 1))
                case None => Some(OpenSession(t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L)
            }
            closed.reverse.iterator
          }
      }
  }
}

case class UserEvent(user_id: Long, value: Double)
case class UserTotal(user_id: Long, n: Long, total: Double)
case class SessEvent(user_id: Long, ts: java.sql.Timestamp)
case class OpenSession(startUs: Long, lastUs: Long, n: Long)
case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)
