package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operator assemblies (SURVEY.md §2B B14): event-time windowed
  * aggregation, session windows, watermarked dedup, and custom state — the
  * Structured Streaming counterparts of the batch images q17/q18/q14.
  *
  * These compose on any streaming DataFrame with an event-time column;
  * state is bounded by the watermark in every case (tumbling/sliding
  * windows age out, session state closes `gap` after the last event,
  * dedup keys expire after `watermark`), which is what lets the operators
  * run indefinitely at scale.
  */
object StreamingOps {

  /** Tumbling event-time window counts/sums per key. */
  def tumblingAgg(df: DataFrame, tsCol: String, keyCol: String,
                  windowLen: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Sliding event-time window counts per key. */
  def slidingAgg(df: DataFrame, tsCol: String, keyCol: String,
                 windowLen: String, slide: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Session windows closed by `gap` of event-time inactivity — the
    * streaming twin of the batch sessionization (q18). */
  def sessionAgg(df: DataFrame, tsCol: String, keyCol: String,
                 gap: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Exactly-once-per-key passthrough within the watermark horizon —
    * the streaming image of the dedup survivor (A12/B10). */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, keys: Seq[String],
                           watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream inner join with a bounded time skew: each left event
    * matches right events for the same key within `[left.ts - skew,
    * left.ts + skew]`. The watermarks plus the time-range predicate are
    * what make this runnable forever: they bound how long each side's
    * rows wait in state for late matches, so the join state ages out
    * instead of growing with the stream (the unbounded-state trap of an
    * unconstrained stream-stream equi-join).
    *
    * Column contract: both inputs carry (`ts`, `keyCol`); the right side's
    * columns are prefixed `r_` in the output to avoid collisions. */
  def streamStreamJoin(left: DataFrame, right: DataFrame, keyCol: String,
                       watermark: String, skew: String): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right.withWatermark("ts", watermark)
      .select(col(keyCol).as("r_key"), col("ts").as("r_ts"),
              col("value").as("r_value"))
    l.join(r,
      col(keyCol) === col("r_key") &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $skew") &&
        col("r_ts") <= col("ts") + expr(s"INTERVAL $skew"))
  }

  /** Custom keyed state: running event count per key via
    * mapGroupsWithState — the escape hatch the reference's per-partition
    * offset accounting would use if it weren't subsumed by checkpoints.
    *
    * State for a key is dropped after `idleTimeout` of processing-time
    * inactivity (the key's count restarts from 0 if it reappears), so
    * total state is bounded by the number of keys active within the
    * timeout horizon — without a timeout, per-key state would grow with
    * lifetime key cardinality, which is unbounded on a real stream.
    * Pass `idleTimeout = None` only for short-lived/bounded-key streams:
    * with NoTimeout the engine runs batches only when data arrives (a
    * processing-time timeout makes it re-trigger to evaluate expiries, so
    * production queries should pair it with a processing-time trigger
    * interval rather than the default run-as-fast-as-possible trigger). */
  case class KeyCount(key: String, n: Long)
  def runningCount[T](ds: Dataset[T], keyOf: T => String,
                      idleTimeout: Option[String] = Some("1 hour")): Dataset[KeyCount] = {
    import ds.sparkSession.implicits._
    val conf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    ds.groupByKey(keyOf)
      .mapGroupsWithState[Long, KeyCount](conf) {
        (key: String, values: Iterator[T], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val n = state.getOption.getOrElse(0L)
            state.remove()
            KeyCount(key, n)
          } else {
            val n = state.getOption.getOrElse(0L) + values.size
            state.update(n)
            idleTimeout.foreach(state.setTimeoutDuration)
            KeyCount(key, n)
          }
      }
  }

  /** Closed-session emission via flatMapGroupsWithState — the 0-or-many
    * output shape mapGroupsWithState can't express: a key emits NOTHING
    * while its session accumulates and exactly one summary row when the
    * event-time watermark passes the session's end (+gap). State per key
    * is one (start, end, count) triple, dropped on emission — bounded by
    * the number of concurrently-open sessions, the same invariant the
    * built-in session_window operator maintains ([[sessionAgg]] is the
    * declarative twin; this is the custom-state escape hatch for session
    * logic session_window can't express, e.g. value-dependent gaps).
    *
    * Requires `.withWatermark` on `tsOf`'s column upstream and
    * OutputMode.Append downstream; the event-time timeout fires when the
    * watermark crosses the registered deadline, so emission is driven by
    * data progress, not wall clock — deterministic under replay. */
  case class SessionState(start: Long, end: Long, n: Long)
  case class ClosedSession(key: String, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)
  def closedSessions[T](ds: Dataset[T], keyOf: T => String, tsOf: T => Timestamp,
                        gapMillis: Long): Dataset[ClosedSession] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, values: Iterator[T], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(key,
              new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            // flatMapGroupsWithState does NOT drop late input (unlike the
            // built-in session_window), so drop rows at/behind the
            // watermark ourselves — a late straggler would otherwise merge
            // into a session it is more than gapMillis away from (the
            // gap-split below only checks the HIGH side of the interval)
            val wm = state.getCurrentWatermarkMs
            // fold events in time order, gap-splitting as we go: an event
            // beyond end+gap PROVES the open session closed, so it is
            // emitted eagerly; the event-time timeout covers the case
            // where no later event ever arrives for the key
            val ts = values.map(tsOf(_).getTime).filter(_ > wm).toSeq.sorted
            val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t > s.end + gapMillis =>
                  out += ClosedSession(key, new Timestamp(s.start),
                                       new Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1L))
                case Some(s) =>
                  cur = Some(SessionState(math.min(s.start, t),
                                          math.max(s.end, t), s.n + 1))
                case None => cur = Some(SessionState(t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // the registered deadline must sit above the watermark (late
              // stragglers otherwise register an already-passed timeout)
              state.setTimeoutTimestamp(
                math.max(s.end + gapMillis, state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
      }
  }
}
