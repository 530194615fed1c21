package graft.streaming

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the enrichment shape a production
  * ingest needs when BOTH sides arrive continuously (the foreachBatch
  * as-of enrich joins a stream against a static/batch side; here click
  * and purchase streams join each other with bounded state): a
  * purchase matches a click by the same user within the 10 minutes
  * AFTER the click.
  *
  * Scale shape: both sides carry a 10-minute watermark and the join
  * condition bounds event time in BOTH directions, so Spark derives a
  * state-eviction bound for each side — state holds only the last
  * ~10 minutes of each stream (keyed by user, hash-partitioned), not
  * stream history. Without the two-sided time bound the state would
  * grow unboundedly; the spec pins the semantics, the plan carries the
  * eviction.
  *
  * The INNER time-bounded variant already lives in
  * `StreamingAggregates.purchaseViewJoin` (StreamingSpec); this module
  * adds the LEFT-OUTER form — clicks that never converted emit with
  * NULL purchase columns once the watermark proves no match can still
  * arrive (the conversion-funnel spelling: the unmatched rows ARE the
  * signal, and the NULL-emission timing is exactly the semantics a
  * spec must pin). StreamStreamJoinSpec pins it row-identical to the
  * batch left-outer interval join on the same corpus.
  */
object StreamStreamJoin {

  private def withBounds(clicks: DataFrame, buys: DataFrame): (DataFrame, DataFrame) = {
    val c = clicks
      .withWatermark("ts", "10 minutes")
      .select(
        col("user_id").as("c_user"),
        col("click_id"),
        col("ts").as("click_ts")
      )
    val b = buys
      .withWatermark("ts", "10 minutes")
      .select(
        col("user_id").as("b_user"),
        col("buy_id"),
        col("ts").as("buy_ts"),
        col("amount")
      )
    (c, b)
  }

  private val cond =
    "c_user = b_user AND buy_ts >= click_ts AND buy_ts <= click_ts + interval 10 minutes"

  /** Left-outer stream-stream interval join: unconverted clicks emit
    * NULL purchase columns once the watermark closes their window.
    */
  def attributed(clicks: DataFrame, buys: DataFrame): DataFrame = {
    val (c, b) = withBounds(clicks, buys)
    c.join(b, expr(cond), "left_outer")
      .select(
        col("c_user").as("user_id"),
        col("click_id"),
        col("buy_id"),
        col("click_ts"),
        col("buy_ts"),
        col("amount")
      )
  }

  /** q193: the BATCH TWIN of [[attributed]], priced as a driver gate —
    * the convention every other streaming operator already follows
    * (q89 ↔ Sessionize, q84 ↔ upsert-apply, q25c ↔ StreamingDedup):
    * sinks are outside the Verify contract, but the transform the
    * stream runs is hash-gated against the DuckDB oracle on the real
    * corpus. The gate calls [[attributed]] ITSELF on batch frames —
    * the analyzer's EliminateEventTimeWatermark drops the watermark
    * nodes for a non-streaming child, so the gated plan IS the
    * streamed plan minus state bookkeeping, and a semantics drift in
    * the join spelling breaks gate and stream together
    * (StreamStreamJoinSpec pins streaming ≡ this same function).
    *
    * Corpus: click events LEFT-OUTER attributed to same-user purchase
    * events within the 10 minutes after the click; timestamps emitted
    * as exact epoch-µs BIGINTs (the q20b timestamp-compare convention).
    *
    * Scale shape: one equi-key (user) hash join with a residual time
    * predicate — the time bound does not shrink the batch join's key
    * space (that is the STREAM's state-eviction win) but per-user
    * click×purchase fan-out is bounded by the 10-minute window.
    */
  private def q193(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.table(s, dir, "events")
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
    val buys = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id").as("buy_id"),
        col("ts"),
        col("value").as("amount")
      )
    attributed(clicks, buys)
      .select(
        col("user_id"),
        col("click_id"),
        col("buy_id"),
        unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("buy_ts")).as("buy_us"),
        col("amount")
      )
      .orderBy(col("click_id"), col("buy_id").asc_nulls_first)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q193_stream_join_twin" -> q193
  )

  val oracleSql: Map[String, String] = Map(
    "q193_stream_join_twin" ->
      """WITH c AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
        |  FROM events WHERE event_type = 'click'),
        |b AS (
        |  SELECT user_id, event_id AS buy_id, epoch_us(ts) AS buy_us,
        |         value AS amount
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_id, b.buy_id, c.click_us, b.buy_us,
        |       b.amount
        |FROM c LEFT JOIN b
        |  ON c.user_id = b.user_id
        | AND b.buy_us >= c.click_us
        | AND b.buy_us <= c.click_us + 600000000
        |ORDER BY click_id, buy_id NULLS FIRST""".stripMargin
  )
}
