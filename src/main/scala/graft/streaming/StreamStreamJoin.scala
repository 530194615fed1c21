package graft.streaming

import org.apache.spark.sql.DataFrame
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
}
