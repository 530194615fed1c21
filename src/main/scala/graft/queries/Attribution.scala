package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-touch marketing attribution over the events stream — the
  * credit-assignment query a growth/analytics deployment runs on the
  * reference's event data: every purchase's value is split EQUALLY
  * across the user's qualifying touchpoints (click/view) in the 7 days
  * before it (linear attribution); purchases with no qualifying touch
  * report under the '(none)' channel with full credit, so total credit
  * is conserved by construction.
  *
  * Reference scope: none (Athena-delegated query half). Conventions:
  * centi-snapped values (q113), exact integer microsecond timestamps,
  * per-touch credit in exact centi-micro units via integer division
  * (operands are strictly positive — vc ≥ 1, n_touches ≥ 1 — so
  * Spark's `div` and DuckDB's `//`, BOTH truncating on integer
  * operands (the q118 measurement), equal the mathematical floor;
  * AttributionSpec asserts the precondition), one final rendering
  * division under the round-6 grid.
  *
  * Scale shape: the q84c pattern — an EQUI join on user_id with the
  * time window as a ride-along filter (candidates bounded by a user's
  * own history, never a corpus cross product), then two hash
  * aggregates; the unattributed remainder is a left-anti join on the
  * same equi key. At 100 TB the credit sums move to DECIMAL(38) (the
  * q111 note); the join key (user_id) is the natural partitioner.
  */
object Attribution {

  private val WindowUs = 7L * 86400L * 1000000L // 7 days in microseconds
  private[graft] val TouchTypes = Seq("click", "view")

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables
      .table(s, dir, "events")
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100.0, 0).cast("long").as("vc")
      )

  /** q116: linear multi-touch attribution — per channel: purchases
    * crediting it, touches credited, and the summed credit in value
    * units (exact centi-micro integer sum, one final /1e8 render).
    */
  private def q116(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    // both sides derive from the same scan: distinct key names per side
    // (p_uid/t_uid) instead of purch("user_id") === touch("user_id"),
    // which trips the analyzer's "trivially true equals predicate" WARN
    // and leans on version-fragile dataset-id disambiguation
    val purch = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_uid"),
        col("event_id").as("pid"),
        col("us").as("pus"),
        col("vc")
      )
    val touch = ev
      .filter(col("event_type").isin(TouchTypes: _*))
      .select(
        col("user_id").as("t_uid"),
        col("event_type").as("channel"),
        col("us").as("tus")
      )
    // equi join on user_id; the window is a ride-along filter (q84c)
    val cand = purch.join(
      touch,
      col("p_uid") === col("t_uid") &&
        col("tus") < col("pus") &&
        col("pus") - col("tus") <= lit(WindowUs)
    )
    val perPC = cand
      .groupBy(col("pid"), col("vc"), col("channel"))
      .agg(count(lit(1)).as("cnt"))
    val perP = perPC
      .groupBy("pid")
      .agg(sum("cnt").as("n_touches_total"))
    val attributed = perPC
      .join(perP, "pid")
      // exact centi-micro credit: floor(vc·cnt·10^6 / n) — all operands
      // strictly positive, so trunc-div == floor-div on both engines
      .withColumn(
        "credit_cmu",
        expr("CAST(vc * cnt * 1000000 div n_touches_total AS BIGINT)")
      )
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_purchases"),
        sum("cnt").as("n_touches"),
        sum("credit_cmu").as("credit_cmu")
      )
    val unattributed = purch
      .join(
        cand.select(col("pid").as("cpid")).distinct(),
        col("pid") === col("cpid"),
        "left_anti"
      )
      .agg(
        count(lit(1)).as("n_purchases"),
        lit(0L).as("n_touches"),
        coalesce(sum(col("vc") * lit(1000000L)), lit(0L)).as("credit_cmu")
      )
      .select(
        lit("(none)").as("channel"),
        col("n_purchases"),
        col("n_touches"),
        col("credit_cmu")
      )
    attributed
      .unionByName(unattributed)
      .select(
        col("channel"),
        col("n_purchases"),
        col("n_touches"),
        col("credit_cmu"),
        round(col("credit_cmu").cast("double") / 1.0e8, 6).as("credit")
      )
      .orderBy("channel")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q116_linear_attribution" -> q116
  )

  val oracleSql: Map[String, String] = Map(
    "q116_linear_attribution" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         |         CAST(round(value * 100.0, 0) AS BIGINT) AS vc
         |  FROM events),
         |p AS (SELECT user_id, event_id AS pid, us AS pus, vc FROM e
         |      WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, event_type AS channel, us AS tus FROM e
         |      WHERE event_type IN ('click', 'view')),
         |cand AS (
         |  SELECT p.pid, p.vc, t.channel
         |  FROM p JOIN t ON t.user_id = p.user_id
         |   AND t.tus < p.pus AND p.pus - t.tus <= ${WindowUs}),
         |per_pc AS (
         |  SELECT pid, vc, channel, CAST(count(*) AS BIGINT) AS cnt
         |  FROM cand GROUP BY 1, 2, 3),
         |per_p AS (
         |  SELECT pid, CAST(sum(cnt) AS BIGINT) AS n_touches_total
         |  FROM per_pc GROUP BY 1),
         |attr AS (
         |  SELECT channel,
         |    CAST(count(*) AS BIGINT) AS n_purchases,
         |    CAST(sum(cnt) AS BIGINT) AS n_touches,
         |    CAST(sum((vc * cnt * 1000000) // n_touches_total) AS BIGINT)
         |      AS credit_cmu
         |  FROM per_pc JOIN per_p USING (pid) GROUP BY 1),
         |unattr AS (
         |  SELECT '(none)' AS channel,
         |    CAST(count(*) AS BIGINT) AS n_purchases,
         |    CAST(0 AS BIGINT) AS n_touches,
         |    CAST(coalesce(sum(vc * 1000000), 0) AS BIGINT) AS credit_cmu
         |  FROM p WHERE pid NOT IN (SELECT pid FROM per_pc)),
         |u AS (SELECT * FROM attr UNION ALL SELECT * FROM unattr)
         |SELECT channel, n_purchases, n_touches, credit_cmu,
         |  round(CAST(credit_cmu AS DOUBLE) / 1e8, 6) AS credit
         |FROM u ORDER BY channel""".stripMargin
  )
}
