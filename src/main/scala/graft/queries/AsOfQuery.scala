package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q124: the custom AS-OF JOIN operator (plans/AsOfJoin.scala) behind
  * the oracle — each purchase matched to the user's latest view at or
  * before it (left outer: purchases with no prior view keep NULLs).
  *
  * This is q37's semantics through a DIFFERENT execution: q37 composes
  * range-join + row_number (candidates-sized intermediate), the custom
  * operator runs one merge pass per co-partition (output-sized). The
  * oracle is DuckDB's NATIVE ASOF LEFT JOIN — two independent native
  * implementations of the operator must agree row-for-row, including
  * the inclusive boundary (vt = pt matches) and the unmatched-left
  * NULL contract.
  *
  * Determinism: view-side ties on (user, ts) are collapsed to one row
  * (max event_id) BEFORE the join, so "the latest view" is unique by
  * construction on both engines; times are exact integer micros.
  *
  * Scale shape: exactly one hash exchange per side + per-partition
  * sort (EnsureRequirements fulfilling the operator's declared
  * ClusteredDistribution/ordering — the SortMergeJoin contract), then
  * an O(|L|+|R|) streaming merge with zero intermediate frame;
  * AsOfJoinSpec pins the plan (AsOfJoinExec present, no Window, no
  * candidate-pair join).
  */
object AsOfQuery {

  private def q124(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .table(s, dir, "events")
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us")
      )
    // fresh aliases on BOTH sides: the operator requires disjoint
    // attribute ids (both frames derive from the same scan)
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("puser"),
        col("event_id").as("pid"),
        col("us").as("pt")
      )
    // ONE exchange serves both the tie-dedup aggregate and the join:
    // partitioning by user alone satisfies the aggregate's
    // ClusteredDistribution(user, us) (same-key rows co-located) AND —
    // alias-aware — the join's ClusteredDistribution(vuser), so
    // EnsureRequirements inserts no second right-side shuffle
    // (plan-pinned: 3 exchanges total, 1/side + the output sort)
    val views = e
      .filter(col("event_type") === "view")
      .repartition(col("user_id"))
      .groupBy(col("user_id").as("vuser"), col("us").as("vt"))
      .agg(max("event_id").as("vid"))
    graft.plans.AsOf
      .join(purchases, views, "puser", "vuser", "pt", "vt")
      .select(
        col("puser"),
        col("pid"),
        col("vid"),
        col("vt"),
        (col("pt") - col("vt")).as("gap_us")
      )
      .orderBy("pid")
  }

  /** q143: the operator's TOLERANCE axis (pandas merge_asof contract —
    * DuckDB's ASOF has no native equivalent, which is exactly why it's
    * worth gating): same join as q124 but a match counts only within
    * one hour (pt − vt ≤ 3.6e9 µs); a staler latest-view reverts the
    * purchase to the unmatched NULL form rather than silently matching
    * across any gap. Execution cost is identical to q124 (the bound is
    * one primitive comparison inside the same merge — no extra frame,
    * unlike the q37 recipe whose range join PAYS for its window). The
    * oracle composes DuckDB's native ASOF with a post-projection that
    * nulls beyond-tolerance matches — semantically the same contract,
    * independently spelled.
    */
  private val TolUs = 3600L * 1000000L

  private def q143(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .table(s, dir, "events")
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us")
      )
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("puser"),
        col("event_id").as("pid"),
        col("us").as("pt")
      )
    val views = e
      .filter(col("event_type") === "view")
      .repartition(col("user_id"))
      .groupBy(col("user_id").as("vuser"), col("us").as("vt"))
      .agg(max("event_id").as("vid"))
    graft.plans.AsOf
      .join(purchases, views, "puser", "vuser", "pt", "vt", Some(TolUs))
      .select(
        col("puser"),
        col("pid"),
        col("vid"),
        col("vt"),
        (col("pt") - col("vt")).as("gap_us")
      )
      .orderBy("pid")
  }

  /** Shared fixture for the direction gates: purchases (left) and the
    * tie-deduped views (right) with fresh aliases per side.
    */
  private def sides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = Tables
      .table(s, dir, "events")
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us")
      )
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("puser"),
        col("event_id").as("pid"),
        col("us").as("pt")
      )
    val views = e
      .filter(col("event_type") === "view")
      .repartition(col("user_id"))
      .groupBy(col("user_id").as("vuser"), col("us").as("vt"))
      .agg(max("event_id").as("vid"))
    (purchases, views)
  }

  /** q143b: the FORWARD direction (pandas merge_asof `direction=
    * 'forward'`; DuckDB's native ASOF is backward-only, which is why
    * the oracle is an independently-spelled min-over-candidates recipe):
    * each purchase matched to the user's EARLIEST view at or after it,
    * within the same one-hour tolerance. Same merge pass, same cost —
    * the operator's one-row lookahead is the forward candidate.
    * gap_us = vt − pt ≥ 0 by construction.
    */
  private def q143b(s: SparkSession, dir: String): DataFrame = {
    val (purchases, views) = sides(s, dir)
    graft.plans.AsOf
      .join(purchases, views, "puser", "vuser", "pt", "vt", Some(TolUs), "forward")
      .select(
        col("puser"),
        col("pid"),
        col("vid"),
        col("vt"),
        (col("vt") - col("pt")).as("gap_us")
      )
      .orderBy("pid")
  }

  /** q143c: the NEAREST direction — the closer of the backward/forward
    * matches under the tolerance, ties to backward (the earlier view;
    * the oracle spells the identical rule). gap_us = pt − vt signed:
    * positive = matched backward, negative = matched forward.
    */
  private def q143c(s: SparkSession, dir: String): DataFrame = {
    val (purchases, views) = sides(s, dir)
    graft.plans.AsOf
      .join(purchases, views, "puser", "vuser", "pt", "vt", Some(TolUs), "nearest")
      .select(
        col("puser"),
        col("pid"),
        col("vid"),
        col("vt"),
        (col("pt") - col("vt")).as("gap_us")
      )
      .orderBy("pid")
  }

  /** q124b: COMPOSITE-key as-of through the same operator — the series
    * identity is (user, day): a purchase only matches views from the
    * SAME user on the SAME (UTC) day, the "don't attribute yesterday's
    * browsing" rule. Day = us DIV 86400e6, exact integer arithmetic on
    * both engines. Oracle = DuckDB's native multi-condition ASOF.
    */
  private def q124b(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .table(s, dir, "events")
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us")
      )
    // `div` = exact integer division (us / dayUs in Column algebra is
    // DOUBLE division — a day-boundary value could round across)
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("puser"),
        expr("us div 86400000000").as("pday"),
        col("event_id").as("pid"),
        col("us").as("pt")
      )
    // ONE exchange serves the tie-dedup aggregate AND the join (the
    // q124 discipline, two keys wide): hash on (user, day) co-locates
    // every (user, day, us) group for the aggregate and — alias-aware —
    // satisfies the join's ClusteredDistribution(vuser, vday)
    val views = e
      .filter(col("event_type") === "view")
      .repartition(col("user_id"), expr("us div 86400000000"))
      .groupBy(
        col("user_id").as("vuser"),
        expr("us div 86400000000").as("vday"),
        col("us").as("vt")
      )
      .agg(max("event_id").as("vid"))
    graft.plans.AsOf
      .joinKeys(
        purchases,
        views,
        Seq("puser", "pday"),
        Seq("vuser", "vday"),
        "pt",
        "vt"
      )
      .select(
        col("puser"),
        col("pday"),
        col("pid"),
        col("vid"),
        col("vt"),
        (col("pt") - col("vt")).as("gap_us")
      )
      .orderBy("pid")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q124_asof_custom_operator" -> q124,
    "q124b_asof_composite_key" -> q124b,
    "q143_asof_tolerance" -> q143,
    "q143b_asof_forward" -> q143b,
    "q143c_asof_nearest" -> q143c
  )

  val oracleSql: Map[String, String] = Map(
    "q124_asof_custom_operator" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |p AS (SELECT user_id AS puser, event_id AS pid, us AS pt
        |      FROM e WHERE event_type = 'purchase'),
        |v AS (SELECT user_id AS vuser, us AS vt,
        |             CAST(max(event_id) AS BIGINT) AS vid
        |      FROM e WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.puser, p.pid, v.vid, v.vt, p.pt - v.vt AS gap_us
        |FROM p ASOF LEFT JOIN v
        |  ON p.puser = v.vuser AND p.pt >= v.vt
        |ORDER BY pid""".stripMargin,
    // composite key: DuckDB's native ASOF with a second equality
    // condition — both engines integer-divide for the day bucket
    "q124b_asof_composite_key" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |p AS (SELECT user_id AS puser, us // 86400000000 AS pday,
        |             event_id AS pid, us AS pt
        |      FROM e WHERE event_type = 'purchase'),
        |v AS (SELECT user_id AS vuser, us // 86400000000 AS vday, us AS vt,
        |             CAST(max(event_id) AS BIGINT) AS vid
        |      FROM e WHERE event_type = 'view' GROUP BY 1, 2, 3)
        |SELECT p.puser, p.pday, p.pid, v.vid, v.vt, p.pt - v.vt AS gap_us
        |FROM p ASOF LEFT JOIN v
        |  ON p.puser = v.vuser AND p.pday = v.vday AND p.pt >= v.vt
        |ORDER BY pid""".stripMargin,
    // native ASOF (no tolerance support) + a post-projection nulling
    // beyond-tolerance matches — the same contract, independently spelled
    "q143_asof_tolerance" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |p AS (SELECT user_id AS puser, event_id AS pid, us AS pt
         |      FROM e WHERE event_type = 'purchase'),
         |v AS (SELECT user_id AS vuser, us AS vt,
         |             CAST(max(event_id) AS BIGINT) AS vid
         |      FROM e WHERE event_type = 'view' GROUP BY 1, 2),
         |j AS (
         |  SELECT p.puser, p.pid, v.vid, v.vt, p.pt
         |  FROM p ASOF LEFT JOIN v
         |    ON p.puser = v.vuser AND p.pt >= v.vt)
         |SELECT puser, pid,
         |  CASE WHEN pt - vt <= ${3600L * 1000000L} THEN vid END AS vid,
         |  CASE WHEN pt - vt <= ${3600L * 1000000L} THEN vt END AS vt,
         |  CASE WHEN pt - vt <= ${3600L * 1000000L} THEN pt - vt END AS gap_us
         |FROM j ORDER BY pid""".stripMargin,
    // forward has no native DuckDB ASOF: an independently-spelled
    // min-over-candidates recipe ((vuser, vt) unique by the dedup, so
    // the vt-equijoin back to v is unique)
    "q143b_asof_forward" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |p AS (SELECT user_id AS puser, event_id AS pid, us AS pt
         |      FROM e WHERE event_type = 'purchase'),
         |v AS (SELECT user_id AS vuser, us AS vt,
         |             CAST(max(event_id) AS BIGINT) AS vid
         |      FROM e WHERE event_type = 'view' GROUP BY 1, 2),
         |m AS (SELECT p.pid, min(v.vt) AS vt
         |      FROM p JOIN v ON p.puser = v.vuser AND v.vt >= p.pt
         |        AND v.vt - p.pt <= $TolUs
         |      GROUP BY p.pid)
         |SELECT p.puser, p.pid, v.vid, m.vt, m.vt - p.pt AS gap_us
         |FROM p LEFT JOIN m ON p.pid = m.pid
         |LEFT JOIN v ON v.vuser = p.puser AND v.vt = m.vt
         |ORDER BY p.pid""".stripMargin,
    // nearest = the closer of backward/forward under the tolerance,
    // ties to backward — spelled from the two independent recipes
    "q143c_asof_nearest" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |p AS (SELECT user_id AS puser, event_id AS pid, us AS pt
         |      FROM e WHERE event_type = 'purchase'),
         |v AS (SELECT user_id AS vuser, us AS vt,
         |             CAST(max(event_id) AS BIGINT) AS vid
         |      FROM e WHERE event_type = 'view' GROUP BY 1, 2),
         |bb AS (SELECT pid, vt, vid FROM (
         |        SELECT p.pid, v.vt, v.vid, p.pt
         |        FROM p ASOF LEFT JOIN v
         |          ON p.puser = v.vuser AND p.pt >= v.vt) t
         |       WHERE t.pt - t.vt <= $TolUs),
         |ff AS (SELECT p.pid, min(v.vt) AS vt
         |       FROM p JOIN v ON p.puser = v.vuser AND v.vt >= p.pt
         |         AND v.vt - p.pt <= $TolUs
         |       GROUP BY p.pid),
         |c AS (SELECT p.puser, p.pid, p.pt,
         |             bb.vt AS bvt, bb.vid AS bvid,
         |             ff.vt AS fvt, fv.vid AS fvid
         |      FROM p LEFT JOIN bb ON p.pid = bb.pid
         |      LEFT JOIN ff ON p.pid = ff.pid
         |      LEFT JOIN v fv ON fv.vuser = p.puser AND fv.vt = ff.vt)
         |SELECT puser, pid,
         |  CASE WHEN bvt IS NOT NULL AND (fvt IS NULL OR pt - bvt <= fvt - pt)
         |       THEN bvid ELSE fvid END AS vid,
         |  CASE WHEN bvt IS NOT NULL AND (fvt IS NULL OR pt - bvt <= fvt - pt)
         |       THEN bvt ELSE fvt END AS vt,
         |  CASE WHEN bvt IS NOT NULL AND (fvt IS NULL OR pt - bvt <= fvt - pt)
         |       THEN pt - bvt
         |       WHEN fvt IS NOT NULL THEN pt - fvt END AS gap_us
         |FROM c ORDER BY pid""".stripMargin
  )
}
