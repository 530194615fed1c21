package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q113: seasonal-baseline anomaly detection over the event stream —
  * score each event against the mean/σ of its OWN (event_type,
  * hour-of-day) seasonal cell rather than a global distribution (the
  * monitoring-pipeline shape: "is this value unusual FOR a purchase at
  * 3am"), and report the strongest anomalies. Complements q68's global
  * MAD outliers: the baseline here is a profile, not a corpus constant.
  *
  * Determinism contract (the q86/q87 statistics convention): values are
  * snapped to BIGINT centi-units first, each cell's Σx and Σx² are
  * EXACT integer aggregates, and μ/σ/z are one closed-form float
  * expression from those integers — no order-sensitive float sum ever
  * reaches the output, so z is bit-identical across engines and
  * partitionings. Σx² of centi units holds in a BIGINT to ~10^5 rows ×
  * value ≤ ~10^7 per cell; beyond that (true 100 TB cells) the sums
  * move to DECIMAL(38) columns with the same plan shape.
  *
  * Scale shape: ONE hash aggregate to the ≤ types×24-row profile frame,
  * broadcast back onto the stream (map-side join — the stream is never
  * shuffled), and a top-k via orderBy+limit (TakeOrderedAndProject:
  * per-partition heaps, no global sort). The corpus is read twice
  * (profile + score) — a production run caches or incrementally
  * maintains the tiny profile (the q103 summary pattern) instead.
  */
object Anomaly {

  private val TopK = 100

  private def q113(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .table(s, dir, "events")
      .select(
        col("event_type"),
        hour(col("ts")).as("hr"),
        col("event_id"),
        round(col("value") * 100.0, 0).cast("long").as("vc")
      )
    val prof = e
      .groupBy("event_type", "hr")
      .agg(
        count(lit(1)).as("n"),
        sum("vc").as("s1"),
        sum(col("vc") * col("vc")).as("s2")
      )
      .filter(col("n") >= 2)
    e.join(broadcast(prof), Seq("event_type", "hr"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("mu", col("s1").cast("double") / col("nd"))
      .withColumn(
        "sg",
        sqrt(
          (col("s2").cast("double") / col("nd") - col("mu") * col("mu"))
            * (col("nd") / (col("nd") - lit(1.0)))
        )
      )
      .withColumn("z", round((col("vc") - col("mu")) / col("sg"), 4))
      .filter(abs(col("z")) > 3.0)
      .select(
        col("event_type"),
        col("hr"),
        col("event_id"),
        (col("vc").cast("double") / 100.0).as("value"),
        col("z")
      )
      .orderBy(abs(col("z")).desc, col("event_id"))
      .limit(TopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_seasonal_anomaly" -> q113
  )

  val oracleSql: Map[String, String] = Map(
    "q113_seasonal_anomaly" ->
      s"""WITH e AS (
         |  SELECT event_type, hour(ts) AS hr, event_id,
         |         CAST(round(value * 100.0, 0) AS BIGINT) AS vc
         |  FROM events),
         |prof AS (
         |  SELECT event_type, hr, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(vc) AS BIGINT) AS s1,
         |         CAST(sum(vc * vc) AS BIGINT) AS s2
         |  FROM e GROUP BY 1, 2 HAVING count(*) >= 2),
         |z1 AS (
         |  SELECT e.event_type, e.hr, e.event_id, e.vc,
         |         CAST(n AS DOUBLE) AS nd,
         |         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         |         CAST(s2 AS DOUBLE) AS s2d
         |  FROM e JOIN prof USING (event_type, hr)),
         |z2 AS (
         |  SELECT event_type, hr, event_id, vc,
         |    round((vc - mu) / sqrt((s2d / nd - mu * mu) * (nd / (nd - 1.0))), 4)
         |      AS z
         |  FROM z1)
         |SELECT event_type, hr, event_id,
         |       CAST(vc AS DOUBLE) / 100.0 AS value, z
         |FROM z2 WHERE abs(z) > 3.0
         |ORDER BY abs(z) DESC, event_id LIMIT $TopK""".stripMargin
  )
}
