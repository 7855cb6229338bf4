package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key state via `flatMapGroupsWithState` — the escape hatch for
  * stream logic that windowed aggregates can't express. The example here is
  * a per-user session with BOTH a gap rule and a value cap: a session also
  * closes as soon as its running value sum crosses `maxValue` (a fraud/
  * budget-style trigger no built-in session_window supports, since closing
  * depends on aggregated state, not time alone).
  *
  * Scale: state lives in the state store keyed by user — one shuffle on the
  * key, per-key state is O(1) (four scalars), and event-time timeouts purge
  * idle keys, so state size tracks ACTIVE users, not history. That bounded-
  * state property is what lets this run forever on an unbounded stream.
  */
object CustomState {

  case class Event(event_id: Long, user_id: Long, event_type: String,
      ts: Timestamp, value: Double, props: String)
  case class SessionState(start: Long, lastTs: Long, n: Long, sum: Double)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n: Long, sum_value: Double, reason: String)

  val GapMs: Long = 30 * 60 * 1000L

  /** Sessionize with a 30 min gap and a running-sum cap. Emits a session
    * when the cap trips (reason="cap"), when a later event arrives past the
    * gap (reason="gap"), or when the state times out (reason="timeout"). */
  def sessionsWithCap(events: Dataset[Event], maxValue: Double)(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(close(user, s, "timeout"))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs >= GapMs =>
                  out += close(user, s, "gap")
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
              if (cur.exists(_.sum >= maxValue)) {
                out += close(user, cur.get, "cap")
                cur = None
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                // setTimeoutTimestamp at-or-below the current watermark
                // throws and kills the whole query. Microbatch execution
                // filters watermark-late input before the state function
                // (verified by CustomStateSpec), so lastTs is normally >=
                // watermark — but that invariant lives in the EXECUTION
                // layer, not this function's contract (e.g. state restored
                // across a gap change). Clamp to watermark+1: the session
                // then times out at the next watermark advance, the right
                // close for an already-expired gap. Defense in depth.
                // getCurrentWatermarkMs itself THROWS when no watermark is
                // defined (Spark supports flatMapGroupsWithState on BATCH
                // Datasets, where withWatermark is erased) — in that mode
                // there is no watermark to clamp against and timeouts never
                // fire, so fall back to the raw timestamp.
                val wm = scala.util.Try(state.getCurrentWatermarkMs())
                  .getOrElse(Long.MinValue)
                state.setTimeoutTimestamp(math.max(s.lastTs + GapMs, wm + 1))
              case None => if (state.exists) state.remove()
            }
            out.result().iterator
          }
      }
  }

  private def close(user: Long, s: SessionState, reason: String): ClosedSession =
    ClosedSession(user, new Timestamp(s.start), new Timestamp(s.lastTs + GapMs),
      s.n, s.sum, reason)

  // ----------------------------------------------------------------------
  // Streaming twin of ops.Events.event_pattern (CEP: purchase converts iff
  // a same-user click happened within the preceding 10 min with no error
  // after that click).
  // ----------------------------------------------------------------------

  case class PatternState(lastClickUs: Long, blocked: Boolean)
  case class PatternMatch(event_id: Long, user_id: Long, converted: Boolean)

  val PatternWindowUs: Long = 10L * 60 * 1000000

  /** Epoch-µs of a Timestamp without ms truncation (getTime carries only
    * ms; the fixture's ts is µs-precision, and the batch op compares full
    * timestamps — ms rounding here would diverge on sub-ms components). */
  private def tsUs(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000) % 1000000L

  /** Per-user CEP state fold. The batch op carries TWO running maxima
    * (last click ts, last error ts) per row; folded over (ts, event_id)
    * order those collapse to two scalars — the click timestamp and one
    * `blocked` bit ("an error arrived strictly after the last click",
    * the batch `last_error <= last_click` negation evaluated eagerly).
    * An error with NO preceding click needs no state at all: conversion
    * requires a click, so `blocked` only exists alongside one.
    *
    * State is O(1) per ACTIVE user and self-expiring: once the watermark
    * passes lastClick + 10 min no future purchase can convert via that
    * click (its ts would exceed the window), so the event-time timeout
    * removes the key — state size tracks users with a click inside the
    * watermark horizon, never history. Same bounded-state property as
    * sessionsWithCap, which is what makes this run forever unbounded.
    *
    * Ordering contract (same as every file-source drive here): micro-
    * batches arrive in event-time order and intra-batch rows are sorted
    * by (ts, event_id) — exactly the batch window's ROWS frame order, so
    * a same-µs click with a SMALLER event_id than the purchase counts as
    * preceding and one with a larger id does not, matching the batch op
    * tie-for-tie. Watermark-late events are dropped by the runtime
    * before this function (the standard streaming-lateness divergence,
    * measured by watermark_audit). */
  def patternConverted(events: Dataset[Event])(
      implicit spark: SparkSession): Dataset[PatternMatch] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Event], state: GroupState[PatternState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = evs.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
            val out = Seq.newBuilder[PatternMatch]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = tsUs(e.ts)
              e.event_type match {
                case "click" => cur = Some(PatternState(t, blocked = false))
                case "error" =>
                  // same-µs error does NOT block (batch: error <= click ⇒ ok)
                  cur = cur.map(s => if (t > s.lastClickUs) s.copy(blocked = true) else s)
                case "purchase" =>
                  out += PatternMatch(e.event_id, user,
                    cur.exists(s => !s.blocked && s.lastClickUs >= t - PatternWindowUs))
                case _ => ()
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                // expire once no future in-watermark purchase can convert;
                // clamp exactly as sessionsWithCap (setTimeoutTimestamp at or
                // below the watermark kills the query; batch mode has none)
                val wm = scala.util.Try(state.getCurrentWatermarkMs())
                  .getOrElse(Long.MinValue)
                state.setTimeoutTimestamp(
                  math.max(s.lastClickUs / 1000 + PatternWindowUs / 1000 + 1, wm + 1))
              case None => if (state.exists) state.remove()
            }
            out.result().iterator
          }
      }
  }
}
