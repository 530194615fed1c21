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

  /** Stream-stream join — the streaming twin of the batch as-of join
    * (q37): purchases joined to the same user's views within the
    * preceding hour. Both sides carry watermarks and the join condition
    * bounds event-time distance, so each side's state is purged once the
    * watermark passes (state size = one hour of events per side, not the
    * stream's history).
    */
  def purchaseViewJoin(events: DataFrame): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id").as("p_id"),
        col("ts").as("p_ts")
      )
      .withWatermark("p_ts", "10 minutes")
    val views = events
      .filter(col("event_type") === "view")
      .select(
        col("user_id").as("v_user_id"),
        col("event_id").as("v_id"),
        col("ts").as("v_ts")
      )
      .withWatermark("v_ts", "10 minutes")
    purchases.join(
      views,
      col("user_id") === col("v_user_id") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
    ).select(col("user_id"), col("p_id"), col("v_id"), col("p_ts"), col("v_ts"))
  }

  /** Stream-static enrichment join — the streaming analog of q06's
    * broadcast dim join: each micro-batch of the stream equi-joins a
    * static (batch) dimension. No watermark and no state: the static
    * side is re-resolved per micro-batch (so a dim table updated between
    * batches is picked up), and Spark plans it as an ordinary
    * broadcast/shuffle join inside the batch — state size zero, the
    * streaming side never waits. This is the canonical 100 TB enrichment
    * shape: the stream stays narrow, the dim is broadcast per batch.
    */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(dim, key)

  /** Streaming AS-OF enrichment — the stream-side point-in-time join
    * (each event picks the latest dim version at or before its own
    * time; q84c's batch contract on a live stream). Spark's
    * stream-static joins only support equi conditions, so the as-of
    * semantics run through `foreachBatch`, where each micro-batch is a
    * plain DataFrame and the CUSTOM AsOfJoinExec operator applies
    * as-is — the batch operator IS the streaming operator, one
    * implementation repo-wide (the q84/Maintenance.upsert discipline).
    * The versioned dim is re-resolved per batch, so a dim that gained
    * versions between batches enriches later events with them while
    * already-emitted rows stay immutable (append sink). State size
    * zero: the merge runs inside the batch; nothing carries across
    * triggers. At 100 TB the per-batch cost is the operator's one
    * exchange per side over BATCH-sized left rows — the dim side can be
    * pre-partitioned/bucketed to amortize its exchange.
    *
    * `dim` must carry `dimKey`/`dimTime` named so they don't collide
    * with the stream's columns (the operator's disjoint-attribute
    * rule); events with no dim version at or before them keep NULLs.
    */
  def asOfEnrichWriter(
      stream: DataFrame,
      dim: () => DataFrame,
      streamKey: String,
      dimKey: String,
      streamTime: String,
      dimTime: String,
      outDir: String
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.plans.AsOf
          .join(batch.toDF(), dim(), streamKey, dimKey, streamTime, dimTime)
          .write
          .mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(outDir)
    }
}
