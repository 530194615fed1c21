package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q68: robust outlier detection — flag rows whose value deviates from
  * its group median by more than 3 robust standard deviations, where the
  * robust σ is 1.4826·MAD (median absolute deviation). The
  * z-score-with-MAD filter is what curation pipelines use to drop
  * metric outliers (perplexity spikes, pathological lengths) because,
  * unlike mean/stddev, the estimator itself is immune to the outliers
  * it hunts.
  *
  * Scale shape: two per-group EXACT percentile aggregations (median,
  * then median of deviations) plus unhinted equi-joins of the tiny
  * per-group frames back onto the fact (AQE broadcasts them). Exact
  * `percentile` buffers each group's values — the oracle-parity choice;
  * at 100 TB swap in `approx_percentile` (the q39b sketch path) for a
  * bounded-memory mergeable estimate with the same plan shape.
  *
  * Float-parity notes: the 4.4478 threshold (3·1.4826) is spelled as
  * ONE literal on both engines (3 * 1.4826 re-rounds in binary and can
  * land one ulp away from the parsed literal); the z denominator is
  * spelled `1.4826 * mad` on both; the rounded z carries the
  * signed-zero normalization (COVERAGE.md convention).
  */
object Outliers {

  private def q68(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.table(s, dir, "events")
    val med = ev
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    // the per-type frames are bounded by the number of distinct event
    // types (a model-parameter-sized dimension, never corpus-sized), so
    // they broadcast explicitly — the fact side streams, unshuffled
    val mad = ev
      .join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("value") - col("med")).as("adev"))
      .groupBy("event_type")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    ev.join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .filter(abs(col("value") - col("med")) > lit(4.4478) * col("mad"))
      .select(
        col("event_id"),
        col("event_type"),
        col("value"),
        (round(
          (col("value") - col("med")) / nullif(lit(1.4826) * col("mad"), lit(0.0)),
          4
        ) + 0.0).as("robust_z")
      )
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_outlier_mad" -> q68
  )

  val oracleSql: Map[String, String] = Map(
    "q68_outlier_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM events e JOIN med USING (event_type) GROUP BY e.event_type),
        |j AS (
        |  SELECT event_id, e.event_type, value, med, mad
        |  FROM events e JOIN med USING (event_type) JOIN mad USING (event_type))
        |SELECT event_id, event_type, value,
        |       round((value - med) / nullif(1.4826 * mad, 0), 4) + 0.0 AS robust_z
        |FROM j WHERE abs(value - med) > 4.4478 * mad
        |ORDER BY event_id""".stripMargin
  )
}
