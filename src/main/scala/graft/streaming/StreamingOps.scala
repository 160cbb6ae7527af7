package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

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

  /** Custom keyed state: running event count per key via
    * mapGroupsWithState — the escape hatch the reference's per-partition
    * offset accounting would use if it weren't subsumed by checkpoints. */
  case class KeyCount(key: String, n: Long)
  def runningCount[T](ds: Dataset[T], keyOf: T => String): Dataset[KeyCount] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(keyOf)
      .mapGroupsWithState[Long, KeyCount] {
        (key: String, values: Iterator[T], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + values.size
          state.update(n)
          KeyCount(key, n)
      }
  }
}
