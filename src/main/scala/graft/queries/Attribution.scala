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

  // ------------- q209: Shapley-value channel attribution (3 channels)

  /** q209: exact Shapley conversion credit over the three touch
    * channels {view=1, click=2, signup=4} — the game-theoretic
    * attribution next to q116's linear split (linear credits only
    * channels on the converting path; Shapley prices each channel's
    * MARGINAL contribution across all exposure coalitions, the
    * industry-standard data-driven model): coalition value
    * v(S) = #converted users whose exposure set E ⊆ S (monotone,
    * v(∅) = 0, v(full) = total attributable conversions — so Shapley
    * credits sum exactly to the total), and with k = 3 fixed channels
    * the Shapley sum collapses to the closed 6ths form
    * 6·φ_c = 2·v({c}) + Σ_{s≠c}(v({c,s}) − v({s})) + 2·(v(N) − v(N∖c)).
    *
    * Determinism: v(S) values are exact BIGINT counts, 6·φ_c is exact
    * integer arithmetic on them (emitted as `phi6` — the hash-stable
    * exact form), and the rendered credit is one /6 division under the
    * round-6 grid.
    *
    * Scale shape: ONE user-keyed aggregate collapses the corpus to an
    * ≤8-row exposure-mask frame; v(S) is an 8×8 bitmask-containment
    * cross join on that frame (e & smask = e ⟺ E ⊆ S); the closed
    * form is a driver-side fold over the ≤8 collected rows (the
    * q70/q197 bounded-model-pull convention), re-entering as a 3-row
    * LocalRelation.
    */
  private val ShapleyChannels =
    Seq(("view", 1), ("click", 2), ("signup", 4))

  private def q209(s: SparkSession, dir: String): DataFrame = {
    val maskExpr = ShapleyChannels
      .map { case (t, bit) =>
        when(max(when(col("event_type") === t, 1).otherwise(0)) === 1, bit)
          .otherwise(0)
      }
      .reduce(_ + _)
    val per = Tables
      .table(s, dir, "events")
      .groupBy("user_id")
      .agg(
        maskExpr.as("e"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv")
      )
      .filter(col("e") > 0) // untouched users attribute nothing
    val em = per.groupBy("e").agg(sum(col("conv")).as("cv"))
    val subsets = s.range(1, 8).select(col("id").cast("int").as("smask"))
    val v = em
      .crossJoin(broadcast(subsets))
      .filter(expr("(e & smask) = e"))
      .groupBy("smask")
      .agg(sum(col("cv")).as("v"))
    // bounded model pull: ≤7 coalition rows
    val vm = v.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def vOf(mask: Int): Long = if (mask == 0) 0L else vm.getOrElse(mask, 0L)
    val rows = ShapleyChannels.map { case (name, c) =>
      val others = ShapleyChannels.map(_._2).filter(_ != c)
      val phi6 = 2L * vOf(c) +
        others.map(sb => vOf(c | sb) - vOf(sb)).sum +
        2L * (vOf(7) - vOf(7 ^ c))
      (name, phi6, vOf(7))
    }
    import s.implicits._
    rows
      .toDF("channel", "phi6", "total_conversions")
      .select(
        col("channel"),
        col("phi6"),
        (round(col("phi6").cast("double") / 6.0d, 6) + 0.0)
          .as("shapley_conversions"),
        col("total_conversions")
      )
      .orderBy("channel")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q209_shapley_attribution" -> q209,
    "q116_linear_attribution" -> q116
  )

  val oracleSql: Map[String, String] = Map(
    // same exposure masks, same bitmask-containment coalition values,
    // same closed 6ths Shapley form as exact integers
    "q209_shapley_attribution" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CASE WHEN max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1 THEN 1 ELSE 0 END
        |    + CASE WHEN max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1 THEN 2 ELSE 0 END
        |    + CASE WHEN max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) = 1 THEN 4 ELSE 0 END AS e,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |em AS (
        |  SELECT e, CAST(sum(conv) AS BIGINT) AS cv
        |  FROM per WHERE e > 0 GROUP BY e),
        |v AS (
        |  SELECT s.smask, CAST(sum(em.cv) AS BIGINT) AS v
        |  FROM (SELECT unnest(range(1, 8)) AS smask) s
        |  JOIN em ON (em.e & s.smask) = em.e
        |  GROUP BY s.smask),
        |vx AS (
        |  SELECT
        |    coalesce(max(CASE WHEN smask = 1 THEN v END), 0) AS v1,
        |    coalesce(max(CASE WHEN smask = 2 THEN v END), 0) AS v2,
        |    coalesce(max(CASE WHEN smask = 3 THEN v END), 0) AS v3,
        |    coalesce(max(CASE WHEN smask = 4 THEN v END), 0) AS v4,
        |    coalesce(max(CASE WHEN smask = 5 THEN v END), 0) AS v5,
        |    coalesce(max(CASE WHEN smask = 6 THEN v END), 0) AS v6,
        |    coalesce(max(CASE WHEN smask = 7 THEN v END), 0) AS v7
        |  FROM v),
        |phi AS (
        |  SELECT 'view' AS channel,
        |    2 * v1 + (v3 - v2) + (v5 - v4) + 2 * (v7 - v6) AS phi6, v7
        |  FROM vx
        |  UNION ALL
        |  SELECT 'click', 2 * v2 + (v3 - v1) + (v6 - v4) + 2 * (v7 - v5), v7
        |  FROM vx
        |  UNION ALL
        |  SELECT 'signup', 2 * v4 + (v5 - v1) + (v6 - v2) + 2 * (v7 - v3), v7
        |  FROM vx)
        |SELECT channel, CAST(phi6 AS BIGINT) AS phi6,
        |  round(CAST(phi6 AS DOUBLE) / 6.0, 6) + 0.0 AS shapley_conversions,
        |  v7 AS total_conversions
        |FROM phi ORDER BY channel""".stripMargin,
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
