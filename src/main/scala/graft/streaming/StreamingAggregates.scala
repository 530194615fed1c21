package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming transforms over an unbounded events frame
  * (schema: ts TIMESTAMP, user_id BIGINT, event_type STRING, value
  * DOUBLE, …). Pure plan builders: each takes a (possibly streaming)
  * DataFrame and returns the transformed streaming plan — identical code
  * paths serve the batch twins in the q22/q23/q24 inventory, which is how
  * Structured Streaming is meant to be used (one declarative plan, two
  * execution modes).
  *
  * Watermarks bound state: the reference's ETL needs none (partitioned
  * append, SURVEY.md §2.3), but every stateful operator here must declare
  * one or its state grows without bound at 100 TB/day.
  */
object StreamingAggregates {

  /** Tumbling per-window, per-type counts with a 10-minute watermark. */
  def tumblingCounts(events: DataFrame, width: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"),
        col("cnt"),
        col("sum_value")
      )

  /** Sliding window (length, slide) counts. */
  def slidingCounts(
      events: DataFrame,
      length: String = "10 minutes",
      slide: String = "5 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), length, slide))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("cnt"))

  /** Session windows (gap-based) per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("cnt")
      )

  /** Streaming dedup with bounded state: duplicates of (user_id,
    * event_type) are dropped until the watermark passes — the streaming
    * form of the q24 key-dedup.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
}
