package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical testing over the event stream — the experimentation /
  * data-validation family (χ² independence, two-proportion z-test).
  * Both reduce to contingency counts (exact integers via one hash
  * aggregate) plus closed-form float arithmetic spelled identically on
  * both engines; no sampling, no iteration, no libm call that is not
  * correctly rounded (sqrt is; ln/exp are avoided).
  */
object Stats {

  /** q86: χ² test of independence between event_type and a
    * deterministic user tier (user_id % 3) — "does behavior differ by
    * segment". Emits the full contingency frame: observed count,
    * expected count under independence (row·col/N), and the cell's χ²
    * contribution — per-cell rows rather than one summed statistic, so
    * the driver hash checks every intermediate and no float SUM of
    * nondeterministic order is exposed (the analyst sums the rounded
    * contributions; with r·c cells the frame is domain-bounded).
    *
    * Scale shape: ONE groupBy(type, tier) count; margins derive from
    * that tiny frame and broadcast back onto it. The corpus is touched
    * once.
    */
  private def q86(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables
      .table(s, dir, "events")
      .groupBy(col("event_type"), (col("user_id") % 3).as("tier"))
      .agg(count(lit(1)).as("obs"))
    val rowTot = obs.groupBy("event_type").agg(sum("obs").as("row_n"))
    val colTot = obs.groupBy("tier").agg(sum("obs").as("col_n"))
    val grand = obs.agg(sum("obs").as("n"))
    obs
      .join(broadcast(rowTot), "event_type")
      .join(broadcast(colTot), "tier")
      .crossJoin(broadcast(grand))
      .withColumn(
        "expected",
        col("row_n") * col("col_n") / col("n")
      )
      .select(
        col("event_type"),
        col("tier"),
        col("obs"),
        (round(col("expected"), 4) + 0.0).as("expected"),
        (round(
          (col("obs") - col("expected")) * (col("obs") - col("expected"))
            / col("expected"),
          6
        ) + 0.0).as("chi2_cell")
      )
      .orderBy("event_type", "tier")
  }

  /** q87: two-proportion z-test — the A/B experiment readout. Variants
    * assigned by the q43 split hash (deterministic, re-run-stable);
    * success = the user ever purchased. One row: group sizes,
    * conversions, rates, and the pooled z statistic
    * (pA−pB)/√(p̂(1−p̂)(1/nA+1/nB)). All inputs are exact integers;
    * sqrt is IEEE-correctly-rounded, so the statistic is bit-stable
    * across engines with the shared spelling.
    */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    // success = a HIGH-VALUE purchase (every user purchases *something*
    // in this corpus — the bare event would give rate 1.0 in both arms
    // and a 0/0 z)
    val users = Tables
      .table(s, dir, "events")
      .groupBy("user_id")
      .agg(
        max(
          when(col("event_type") === "purchase" && col("value") > 200, 1)
            .otherwise(0)
        ).as("conv")
      )
      .withColumn(
        "variant",
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, "A")
          .otherwise("B")
      )
    val g = users
      .groupBy("variant")
      .agg(count(lit(1)).as("n"), sum("conv").as("k"))
    val a = g.filter(col("variant") === "A").select(col("n").as("na"), col("k").as("ka"))
    val b = g.filter(col("variant") === "B").select(col("n").as("nb"), col("k").as("kb"))
    a.crossJoin(b) // two 1-row frames
      .withColumn("pa", col("ka") / col("na"))
      .withColumn("pb", col("kb") / col("nb"))
      .withColumn("pp", (col("ka") + col("kb")) / (col("na") + col("nb")))
      .select(
        col("na"),
        col("ka"),
        (round(col("pa"), 6) + 0.0).as("rate_a"),
        col("nb"),
        col("kb"),
        (round(col("pb"), 6) + 0.0).as("rate_b"),
        (round(
          (col("pa") - col("pb")) /
            sqrt(col("pp") * (lit(1.0) - col("pp"))
              * (lit(1.0) / col("na") + lit(1.0) / col("nb"))),
          4
        ) + 0.0).as("z_stat")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q86_chi_square" -> q86,
    "q87_ab_test" -> q87
  )

  val oracleSql: Map[String, String] = Map(
    "q86_chi_square" ->
      """WITH obs AS (
        |  SELECT event_type, user_id % 3 AS tier, count(*) AS obs
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, sum(obs) AS row_n FROM obs GROUP BY 1),
        |ct AS (SELECT tier, sum(obs) AS col_n FROM obs GROUP BY 1),
        |g AS (SELECT sum(obs) AS n FROM obs)
        |SELECT o.event_type, o.tier, o.obs,
        |       round(row_n * col_n / n, 4) + 0.0 AS expected,
        |       round((o.obs - row_n * col_n / n)
        |             * (o.obs - row_n * col_n / n)
        |             / (row_n * col_n / n), 6) + 0.0 AS chi2_cell
        |FROM obs o JOIN rt USING (event_type) JOIN ct USING (tier), g
        |ORDER BY o.event_type, o.tier""".stripMargin,
    "q87_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 200
        |             THEN 1 ELSE 0 END) AS conv,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 < 50 THEN 'A' ELSE 'B' END AS variant
        |  FROM events GROUP BY user_id),
        |g AS (SELECT variant, count(*) AS n, sum(conv) AS k
        |      FROM u GROUP BY variant),
        |a AS (SELECT n AS na, k AS ka FROM g WHERE variant = 'A'),
        |b AS (SELECT n AS nb, k AS kb FROM g WHERE variant = 'B')
        |SELECT na, ka, round(ka / na, 6) + 0.0 AS rate_a,
        |       nb, kb, round(kb / nb, 6) + 0.0 AS rate_b,
        |       round((ka / na - kb / nb) /
        |             sqrt(((ka + kb) / (na + nb))
        |                  * (1.0 - (ka + kb) / (na + nb))
        |                  * (1.0 / na + 1.0 / nb)), 4) + 0.0 AS z_stat
        |FROM a, b""".stripMargin
  )
}
