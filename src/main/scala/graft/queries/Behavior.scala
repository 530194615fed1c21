package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / product-analytics operators over the event stream — the
  * query family an events table exists for, and a capability gap neither
  * the relational inventory (windows, joins) nor the LLM family covers
  * as a NAMED operation: ordered-sequence matching (funnel) and
  * cohort-relative activity (retention).
  *
  * Both are built from the same two primitives — per-entity conditional
  * aggregation and equi-joins on the entity key — because that is the
  * shape that scales: every stage is a map-side partial aggregate into
  * one user-keyed shuffle, later stages operate on monotonically
  * SHRINKING frames (only users who reached step k are joined for step
  * k+1), and nothing ever sorts a user's full history or collects a
  * corpus-sized window. Timestamps compare as exact integer µs on both
  * engines (`unix_micros` / `epoch_us`), so sequencing decisions can
  * never diverge on float rounding.
  */
object Behavior {

  /** q78: strict-order conversion funnel view → click → purchase.
    * Step k's timestamp is the EARLIEST event of that type strictly
    * after the user's step-(k−1) timestamp (the standard "first
    * qualifying path" funnel semantics — a click before the first view
    * does not count). Emits one row per user who entered the funnel,
    * with how deep they got, the step times, and whether the full path
    * completed within 24 h of entry.
    *
    * Scale shape: three filtered aggregates, each joined to the (strictly
    * smaller) previous step frame on user_id. No window over event
    * history, no self-join of the raw stream; at 100 TB each stage is
    * one partial-aggregated shuffle of the users still alive in the
    * funnel.
    */
  private def q78(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .table(s, dir, "events")
      .select(
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us")
      )
    val step1 = ev
      .filter(col("event_type") === "view")
      .groupBy("user_id")
      .agg(min("us").as("t1"))
    val step2 = ev
      .filter(col("event_type") === "click")
      .join(step1, "user_id")
      .filter(col("us") > col("t1"))
      .groupBy("user_id")
      .agg(min("us").as("t2"))
    val step3 = ev
      .filter(col("event_type") === "purchase")
      .join(step2, "user_id")
      .filter(col("us") > col("t2"))
      .groupBy("user_id")
      .agg(min("us").as("t3"))
    step1
      .join(step2, Seq("user_id"), "left")
      .join(step3, Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("t1"),
        col("t2"),
        col("t3"),
        (lit(1) + when(col("t2").isNotNull, 1).otherwise(0)
          + when(col("t3").isNotNull, 1).otherwise(0)).as("funnel_depth"),
        (col("t3").isNotNull &&
          col("t3") - col("t1") <= lit(86400000000L)).as("converted_24h")
      )
      .orderBy("user_id")
  }

  /** q79: weekly cohort retention — users grouped by the week of their
    * FIRST event (the cohort), then for each later week-offset the
    * number of cohort members still active. The matrix behind every
    * "retention curve" dashboard.
    *
    * Scale shape: one aggregate for first-seen (cohort assignment), one
    * distinct user-week activity frame (map-side distinct before the
    * shuffle), one equi-join on user_id, one final count aggregate.
    * Week arithmetic is integer floor-division of epoch DAYS (µs →
    * days → /7) so both engines bucket identically at any timestamp;
    * no session-timezone-dependent date_trunc is involved.
    */
  private def q79(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .table(s, dir, "events")
      // `div` is exact integer floor-division on longs; `/` would route
      // through double and can mis-bucket at a week boundary
      .select(
        col("user_id"),
        expr("(unix_micros(ts) div 86400000000) div 7").as("week")
      )
    val cohort = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    val active = ev.distinct()
    active
      .join(cohort, "user_id")
      .withColumn("offset", col("week") - col("cohort_week"))
      .groupBy("cohort_week", "offset")
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_week", "offset")
  }

  /** q83: truncated EWMA smoothing — per user, the exponentially-
    * weighted moving average of `value` over the last K events
    * (α = 0.2, weights 0.8^k, normalized over the terms that exist near
    * the partition head). The time-series smoother behind every
    * "trend vs spike" signal.
    *
    * Spelled as K explicit lag() terms in ONE window pass (WindowExec
    * evaluates all K lags over a single sort of each user's frame), not
    * a collect_list + array fold: no per-row array materialization, and
    * the numerator/denominator are fixed left-to-right sums whose
    * float evaluation order is identical in both engines by
    * construction — the ORDER of additions is part of the operator's
    * cross-engine contract, since reassociating a float sum changes
    * bits. Weights are Scala-computed double literals; the same shortest-
    * repr strings parse back to identical doubles in DuckDB.
    */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    val K = 20
    val alpha = 0.8
    val w = Window
      .partitionBy("user_id")
      .orderBy("us", "event_id")
    val terms = (0 until K).map { k =>
      val wk = math.pow(alpha, k)
      val l = lag(col("value"), k).over(w)
      (coalesce(l, lit(0.0)) * wk, when(l.isNotNull, wk).otherwise(0.0))
    }
    val num = terms.map(_._1).reduceLeft(_ + _)
    val den = terms.map(_._2).reduceLeft(_ + _)
    Tables
      .table(s, dir, "events")
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("value")
      )
      .withColumn("ewma", round(num / den, 4) + 0.0)
      .select("event_id", "user_id", "value", "ewma")
      .orderBy("event_id")
  }

  /** q85: sliding-window distinct counts — distinct active users per
    * (event_type, day) over a trailing W=2-day window. The "rolling
    * DAU/WAU" metric, and an operator Spark CANNOT express natively:
    * `COUNT(DISTINCT) OVER (RANGE ...)` is unsupported, and the naive
    * form joins every window position against every event
    * (O(days × events)).
    *
    * Decomposition (exact, not a sketch): per (type, user), reduce to
    * DISTINCT activity days, lag() the previous day, and observe that
    * an activity on day `a` with previous activity `p` is the user's
    * FIRST activity inside window `e` exactly for
    * e ∈ [max(a, p+W), a+W−1] — at most W rows per activity, exploded
    * and counted with one hash aggregate. Each user contributes exactly
    * once per window (first-in-window is unique), so the counts are
    * exact. Work is O(activities × W): linear in the data, no
    * window-position join, no per-window state. The oracle computes the
    * SAME numbers by the naive days×events join — two independent
    * algorithms agreeing per row.
    */
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val W = 2
    val e = Tables
      .table(s, dir, "events")
      .select(
        col("event_type"),
        col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day")
      )
      .distinct()
    val w = Window.partitionBy("event_type", "user_id").orderBy("day")
    val contrib = e
      .withColumn("p", lag(col("day"), 1).over(w))
      .select(
        col("event_type"),
        explode(
          sequence(
            greatest(col("day"), coalesce(col("p") + W, col("day"))),
            col("day") + (W - 1)
          )
        ).as("day")
      )
    val observed = e.select("event_type", "day").distinct()
    observed
      .join(
        contrib.groupBy("event_type", "day").agg(count(lit(1)).as("n_users")),
        Seq("event_type", "day")
      )
      .orderBy("event_type", "day")
  }

  /** q88: session path mining — the most common event-type sequences
    * (first 5 events of each user-day session), the "what do users DO"
    * sequence report. Per session: rank events by time, keep the head,
    * assemble the path string with an ORDER-CARRYING aggregate
    * (array_sort over (rank, type) structs, then join — collect_list
    * alone has NO deterministic order in a distributed shuffle, the
    * classic correctness trap this query exists to pin), count paths,
    * top-20 via orderBy+limit (TakeOrderedAndProject per-partition
    * heaps, no global sort).
    */
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("user_id", "day")
      .orderBy("us", "event_id")
    val paths = Tables
      .table(s, dir, "events")
      .select(
        col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        unix_micros(col("ts")).as("us"),
        col("event_id"),
        col("event_type")
      )
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy("user_id", "day")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type")
          ),
          ">"
        ).as("path")
      )
    paths
      .groupBy("path")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  /** q89: gap-based session assembly — the BATCH twin of the streaming
    * flatMapGroupsWithState sessionizer (`streaming/Sessionize.scala`),
    * with identical gap semantics: an event within `gap` of the previous
    * event (t − prev ≤ gap, inclusive) extends the session; beyond it, a
    * new session starts. Emits one row per closed session: bounds (exact
    * integer µs on both engines), event count, and value sum.
    *
    * The batch spelling is the classic islands construction: lag() marks
    * gap boundaries, a running sum of boundary flags numbers each user's
    * sessions, one hash aggregate per (user, session) finishes. Both
    * windows share ONE partition-ordering (user_id, ordered by us,
    * event_id), so the plan sorts each user's history exactly once and
    * the aggregate reuses that shuffle — at 100 TB this is a single
    * user-keyed exchange, no self-join, no per-event state. SessionizeSpec
    * proves batch/streaming equivalence on the same corpus.
    */
  /** The islands construction over a (user_id, us, event_id, value)
    * frame — shared by q89 and the batch/streaming equivalence spec.
    */
  private[graft] def assembleSessions(events: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events
      .withColumn(
        "new_sess",
        when(col("us") - lag("us", 1).over(w) <= gapUs, 0).otherwise(1)
      )
      .withColumn(
        "sess",
        sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
      )
      .groupBy("user_id", "sess")
      .agg(
        min("us").as("session_start_us"),
        max("us").as("session_end_us"),
        count(lit(1)).as("cnt"),
        (round(sum("value"), 4) + 0.0).as("sum_value")
      )
      .select(
        col("user_id"),
        col("session_start_us"),
        col("session_end_us"),
        col("cnt"),
        col("sum_value")
      )
      .orderBy("user_id", "session_start_us")
  }

  private def q89(s: SparkSession, dir: String): DataFrame =
    assembleSessions(
      Tables
        .table(s, dir, "events")
        .select(
          col("user_id"),
          unix_micros(col("ts")).as("us"),
          col("event_id"),
          col("value")
        ),
      gapUs = 30L * 60 * 1000000 // 30 min, the Sessionize default
    )

  /** q126: gaps-and-islands — per-user consecutive-activity-DAY streaks,
    * the calendar-granularity engagement metric (DAU streaks, "7-day
    * streak" badges) that session windows (q23/q89, time-gap based)
    * cannot express: a streak survives any intra-day silence but breaks
    * on a full missed calendar day. Classic islands construction: the
    * day-index minus the per-user day rank is constant within each run
    * of consecutive days, so one per-user window + one hash aggregate
    * finds every island without self-joins.
    *
    * Scale shape: the first DISTINCT collapses the stream to ≤
    * (users × calendar days) rows — at 100 TB of events over a year
    * that is ~365 rows per user, so the per-user windows (day rank,
    * best-streak rank) run on bounded frames; every stage after the
    * first aggregate is user-keyed and reuses one partitioning. Day
    * arithmetic is exact integers (datediff), never float.
    */
  private def q126(s: SparkSession, dir: String): DataFrame = {
    val days = Tables
      .table(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val byDay = Window.partitionBy("user_id").orderBy("d")
    val streaks = days
      .withColumn(
        "grp",
        datediff(col("d"), lit("2024-01-01").cast("date")) -
          row_number().over(byDay)
      )
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min("d").as("start_d"))
    val best = Window
      .partitionBy("user_id")
      .orderBy(desc("len"), asc("start_d")) // tie → earliest streak
    streaks
      .groupBy("user_id")
      .agg(sum("len").as("n_active_days"), count(lit(1)).as("n_streaks"))
      .join(
        streaks
          .withColumn("rk", row_number().over(best))
          .filter(col("rk") === 1)
          .select(
            col("user_id"),
            col("len").as("longest_len"),
            col("start_d").as("longest_start")
          ),
        "user_id"
      )
      .orderBy("user_id")
  }

  /** q128: growth accounting — the daily user-state decomposition every
    * growth team reports: each active (user, day) is NEW (first day
    * ever), RETAINED (also active the previous calendar day) or
    * RESURRECTED (returning after a gap), and a user CHURNS on the day
    * after their activity run ends. Identity: n_active(d) = n_new +
    * n_retained + n_resurrected, and day-over-day,
    * n_active(d) = n_active(d-1) + n_new + n_resurrected - n_churned
    * (spec-pinned). Complement of q79 (cohort retention matrices) and
    * q126 (per-user streaks): this is the per-DAY ledger.
    *
    * Scale shape: one DISTINCT collapse to (user, day), ONE bounded
    * per-user window pass computing lag+lead together, then a
    * day-keyed hash aggregate over the unioned state rows. Day
    * arithmetic is exact integer datediff; counts exact longs.
    */
  private def q128(s: SparkSession, dir: String): DataFrame = {
    val byDay = Window.partitionBy("user_id").orderBy("d")
    val f = Tables
      .table(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .select(
        col("d"),
        lag("d", 1).over(byDay).as("prev"),
        lead("d", 1).over(byDay).as("next")
      )
    val active = f.select(
      col("d"),
      when(col("prev").isNull, "new")
        .when(datediff(col("d"), col("prev")) === 1, "retained")
        .otherwise("resurrected")
        .as("state")
    )
    val churned = f
      .filter(col("next").isNull || datediff(col("next"), col("d")) > 1)
      .select(date_add(col("d"), 1).as("d"), lit("churned").as("state"))
    active
      .unionByName(churned)
      .groupBy("d")
      .agg(
        sum(when(col("state") =!= "churned", 1).otherwise(0)).as("n_active"),
        sum(when(col("state") === "new", 1).otherwise(0)).as("n_new"),
        sum(when(col("state") === "retained", 1).otherwise(0)).as("n_retained"),
        sum(when(col("state") === "resurrected", 1).otherwise(0))
          .as("n_resurrected"),
        sum(when(col("state") === "churned", 1).otherwise(0)).as("n_churned")
      )
      .orderBy("d")
  }

  // ---------- q192: event-type Markov transitions + stationary mix

  /** q192: first-order Markov transition matrix over each user's
    * event stream + its stationary distribution — the behavioral
    * fingerprint a product team reads ("after a click, what happens
    * next?") and the long-run event MIX the chain converges to (a
    * stationary mix that drifts from the observed mix flags
    * non-ergodic cohorts; q88 enumerates literal paths, this is the
    * generative summary): transitions via lead() over per-user
    * (time, event_id)-ordered histories, row-normalized to P; the
    * stationary row from four synchronous power-iteration rounds
    * started uniform (the q71 fixed-iteration convention).
    *
    * Sink-mass convention: each round inner-joins on from_type, so
    * mass assigned to SINK event types (appearing only as to_type,
    * never as from_type) is dropped on the next round rather than
    * self-looped — the emitted vector need not sum to 1 for
    * non-ergodic chains. This is deliberate (the gate reports the
    * surviving recurrent mix, and the same convention is spelled in
    * the oracle SQL), the mirror of the no-incoming-transitions rule
    * below: states with no incoming mass read 0 via LEFT+coalesce.
    *
    * Determinism: transition probabilities are single divisions of
    * exact counts; each iteration's Σ_i r_i·p_ij contributions are
    * floor-snapped to the 1e-12 grid and summed as EXACT BIGINTs (a
    * K-term float aggregate is still order-dependent), so every
    * iteration is engine-exact.
    *
    * Scale shape: one corpus window over short per-user histories
    * (CDC-style natural bound) → one (from, to) count aggregate; the
    * K×K matrix (K = #event types) is a broadcast-sized frame and the
    * iterations run entirely on it.
    */
  private def q192(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val trans = Tables
      .table(s, dir, "events")
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("event_id"),
        col("event_type").as("from_type")
      )
      .withColumn("to_type", lead("from_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_trans"))
    val rowTot = trans.groupBy("from_type").agg(sum("n_trans").as("row_n"))
    val p = trans
      .join(broadcast(rowTot), "from_type")
      .withColumn(
        "p",
        col("n_trans").cast("double") / col("row_n").cast("double")
      )
    // 4 synchronous power-iteration rounds from uniform over the
    // K-row state frame; contributions grid-snapped per step
    val states = rowTot.select(col("from_type").as("st"))
    val k = states.count() // K = #event types: tiny, driver-side by design
    var r = states.withColumn("r", lit(1.0d / k))
    (1 to 4).foreach { _ =>
      r = p
        .join(r.withColumnRenamed("st", "from_type"), "from_type")
        .withColumn(
          "c12",
          expr("CAST(floor(r * p * 1.0e12) AS BIGINT)")
        )
        .groupBy(col("to_type").as("st"))
        .agg((sum(col("c12")).cast("double") / 1.0e12).as("r"))
    }
    // LEFT + coalesce: a state with no INCOMING transitions carries
    // stationary mass 0 but must keep its outgoing matrix rows
    p.join(
        r.withColumnRenamed("st", "from_type").withColumnRenamed("r", "stat"),
        Seq("from_type"),
        "left"
      )
      .select(
        col("from_type"),
        col("to_type"),
        col("n_trans"),
        (round(col("p"), 6) + 0.0).as("p_trans"),
        (round(coalesce(col("stat"), lit(0.0d)), 6) + 0.0).as("stationary_from")
      )
      .orderBy("from_type", "to_type")
  }

  // ------------- q199: view→purchase conversion-lag percentiles

  /** q199: conversion-lag percentiles — "how long after the first view
    * does the first purchase come" at p25/p50/p90, the funnel-latency
    * readout q78's step counts don't give (two funnels with identical
    * conversion can differ 100× in time-to-convert, which decides
    * attribution windows and re-marketing timing): per user, minutes
    * between the first view and the first purchase at-or-after it;
    * percentiles by EXACT positional selection over the lag VALUE
    * frame (smallest lag whose cumulative user count reaches
    * ⌈q·n⌉ — percentile_disc semantics spelled as integer arithmetic,
    * so no interpolation float can split engines).
    *
    * Scale shape: two filtered per-user aggregates + one user-keyed
    * join; the cumulation runs on the lag-VALUE frame (≤ observation
    * window in minutes, bounded by calendar — allowlisted), output one
    * row.
    */
  private def q199(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.table(s, dir, "events")
    val v = ev
      .filter(col("event_type") === "view")
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("vus"))
    val lag = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("pus"))
      .join(v, "user_id")
      .filter(col("pus") >= col("vus"))
      .groupBy("user_id", "vus")
      .agg(min(col("pus")).as("pus"))
      .select(expr("(pus - vus) div 60000000").as("lag"))
    val n = lag.agg(count(lit(1)).as("n"))
    val wc = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lag
      .groupBy("lag")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wc))
      .crossJoin(broadcast(n))
      .agg(
        max(col("n")).as("n_users"),
        min(when(col("cum") >= expr("(n + 3) div 4"), col("lag"))).as("p25_minutes"),
        min(when(col("cum") >= expr("(n + 1) div 2"), col("lag"))).as("p50_minutes"),
        min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("lag"))).as("p90_minutes")
      )
  }

  // --------------------------- q200: RFM customer segmentation

  /** Exact value-based quintile thresholds (⌈q·n⌉ positional selection
    * — ties share the lower quintile, so the split is VALUE-determined
    * and engine-exact, unlike NTILE's positional remainder rules) via
    * the q46b two-level shard cumulation: per-VALUE counts shard by
    * `value div shardWidth`, shard offsets ride a shards-sized window,
    * the within-shard cumulation is shard-partitioned — no user-scaled
    * single-task window anywhere. Returns a 1-row (t20, t40, t60, t80)
    * frame.
    */
  private def quintileThresholds(
      vals: DataFrame, // single LONG column named "v"
      shardWidth: Long
  ): DataFrame = {
    val vc = vals
      .groupBy("v")
      .agg(count(lit(1)).as("c"))
      .withColumn("shard", expr(s"v div $shardWidth"))
    val offs = vc
      .groupBy("shard")
      .agg(sum("c").as("sc"))
      .withColumn(
        "off",
        coalesce(
          sum("sc").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("shard", "off")
    val cum = vc
      .join(broadcast(offs), "shard")
      .withColumn(
        "cum",
        col("off") + sum("c").over(
          Window
            .partitionBy("shard")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
      )
    cum
      .crossJoin(broadcast(vals.agg(count(lit(1)).as("n"))))
      .agg(
        min(when(col("cum") >= expr("(n + 4) div 5"), col("v"))).as("t20"),
        min(when(col("cum") >= expr("(2 * n + 4) div 5"), col("v"))).as("t40"),
        min(when(col("cum") >= expr("(3 * n + 4) div 5"), col("v"))).as("t60"),
        min(when(col("cum") >= expr("(4 * n + 4) div 5"), col("v"))).as("t80")
      )
  }

  /** q200: RFM segmentation — the classic customer triage every CRM
    * runs (recency / frequency / monetary quintile codes; 5-5-5 =
    * champions, 1-x-x = churned) over the purchase stream: per buyer,
    * days since last purchase (measured against the corpus's last
    * date), purchase count, and exact centi spend, each coded 1–5 by
    * EXACT value-based quintile thresholds (ties share the lower
    * code — NTILE's positional remainder rule is shuffle-order bait
    * and a corpus-sized single-task window besides). Output = the
    * ≤125-cell segment grid with user counts and mean spend.
    *
    * Scale shape: one corpus aggregate to the buyer frame; three
    * threshold computations on value frames via the q46b shard
    * cumulation (allowlisted shard-offset windows); codes are
    * map-side CASEs against a broadcast 1-row threshold frame; the
    * output aggregate is cell-bounded.
    */
  private def q200(s: SparkSession, dir: String): DataFrame = {
    val maxD = Tables
      .table(s, dir, "events")
      .agg(max(to_date(col("ts"))).as("dmax"))
    val buyers = Tables
      .table(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        max(to_date(col("ts"))).as("last_d"),
        count(lit(1)).as("f"),
        sum(round(col("value") * 100.0, 0).cast("long")).as("m")
      )
      .crossJoin(broadcast(maxD))
      .select(
        col("user_id"),
        datediff(col("dmax"), col("last_d")).cast("long").as("r"),
        col("f"),
        col("m")
      )
    val rT = quintileThresholds(buyers.select(col("r").as("v")), 16L)
      .select(col("t20").as("r20"), col("t40").as("r40"), col("t60").as("r60"), col("t80").as("r80"))
    val fT = quintileThresholds(buyers.select(col("f").as("v")), 16L)
      .select(col("t20").as("f20"), col("t40").as("f40"), col("t60").as("f60"), col("t80").as("f80"))
    val mT = quintileThresholds(buyers.select(col("m").as("v")), 25600L)
      .select(col("t20").as("m20"), col("t40").as("m40"), col("t60").as("m60"), col("t80").as("m80"))
    def code(v: String, t: String): org.apache.spark.sql.Column =
      lit(1) + (col(v) > col(s"${t}20")).cast("int") +
        (col(v) > col(s"${t}40")).cast("int") +
        (col(v) > col(s"${t}60")).cast("int") +
        (col(v) > col(s"${t}80")).cast("int")
    buyers
      .crossJoin(broadcast(rT))
      .crossJoin(broadcast(fT))
      .crossJoin(broadcast(mT))
      .select(
        // recency: LOWER days = better → invert so 5 = most recent
        (lit(6) - code("r", "r")).as("r_code"),
        code("f", "f").as("f_code"),
        code("m", "m").as("m_code"),
        col("m")
      )
      .groupBy("r_code", "f_code", "m_code")
      .agg(
        count(lit(1)).as("n_users"),
        (round(
          sum(col("m")).cast("double") / (count(lit(1)) * 100L).cast("double"),
          4
        ) + 0.0).as("mean_spend")
      )
      .orderBy("r_code", "f_code", "m_code")
  }

  // -------- q227: sequential pattern pairs (A followed by B)

  /** q227: sequential pattern mining over per-user event histories —
    * "which event FOLLOWS which", at the user grain (q129's basket
    * rules count co-occurrence with no time arrow; q88 enumerates
    * literal whole paths; q192 models only ADJACENT steps — this is
    * the eventually-follows matrix process mining starts from): for
    * every ordered type pair (a, b), the users whose FIRST a strictly
    * precedes their FIRST b, with
    *   support    = n_ab / N,
    *   confidence = n_ab / n_a  (of users who did a, how many later b),
    *   lift       = n_ab·N / (n_a·n_b)  (vs independence).
    *
    * Determinism: first-occurrence epochs are exact min-aggregated
    * BIGINT micros; equal first timestamps are NOT "followed by"
    * (strict <, order-free); every metric is one division (or one
    * exact cross-product then one division) of exact BIGINTs on the
    * round-6 grid.
    *
    * Scale shape: one corpus (user, type) min-aggregate; the per-user
    * self-join expands ≤ K² rows per user (K = #event types, a
    * catalog-bounded domain — the q203 argument); the pair rollup is
    * ≤ K² rows. No windows.
    */
  private def q227(s: SparkSession, dir: String): DataFrame = {
    val firsts = Tables
      .table(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(unix_micros(col("ts"))).as("t"))
    val nUsers = firsts
      .agg(countDistinct("user_id").as("nu"))
    val perType = firsts.groupBy("event_type").agg(count(lit(1)).as("n_t"))
    val l = firsts.select(
      col("user_id"), col("event_type").as("ea"), col("t").as("ta"))
    val r = firsts.select(
      col("user_id"), col("event_type").as("eb"), col("t").as("tb"))
    l.join(r, Seq("user_id"))
      .filter(col("ea") =!= col("eb") && col("ta") < col("tb"))
      .groupBy("ea", "eb")
      .agg(count(lit(1)).as("n_ab"))
      .join(broadcast(perType.select(col("event_type").as("ea"), col("n_t").as("n_a"))), "ea")
      .join(broadcast(perType.select(col("event_type").as("eb"), col("n_t").as("n_b"))), "eb")
      .crossJoin(broadcast(nUsers))
      .select(
        col("ea"),
        col("eb"),
        col("n_ab"),
        col("n_a"),
        col("n_b"),
        (round(col("n_ab").cast("double") / col("nu").cast("double"), 6) + 0.0)
          .as("support"),
        (round(col("n_ab").cast("double") / col("n_a").cast("double"), 6) + 0.0)
          .as("confidence"),
        (round(
          (col("n_ab") * col("nu")).cast("double") /
            (col("n_a") * col("n_b")).cast("double"),
          6
        ) + 0.0).as("lift")
      )
      .orderBy("ea", "eb")
  }

  // ------ q228: Markov removal-effect channel attribution

  /** Touch channels of the q228 journey model — every event type except
    * the conversion event, fixed alphabetically (the catalog-bounded
    * event-type domain).
    */
  private[graft] val MarkovChannels = Seq("click", "error", "signup", "view")
  private val MarkovRounds = 8

  /** q228: Markov-chain removal-effect attribution — the third credit
    * model beside q116's linear split and q209's Shapley, and the one
    * the ad-tech literature actually ships as "data-driven
    * attribution": model journeys as a first-order chain
    * (START → touches → CONV/NULL, truncated at the first purchase),
    * then credit channel c by how much the chain's conversion
    * probability DROPS when c is removed (transitions into c
    * redirected to NULL — the standard removal semantics):
    * RE(c) = (P_full − P_without_c)/P_full, shares normalized over
    * channels. Conversion probability = P(absorbed in CONV within
    * [[MarkovRounds]] synchronous steps) — the q71/q192
    * fixed-iteration convention, with CONV/NULL absorbing self-loops
    * so mass accumulates.
    *
    * Determinism — integer grids end to end: transition probabilities
    * are floor(count·10¹²/rowsum) exact integers; each step's
    * v'[j] = Σᵢ ⌊v[i]·p[i][j]/10¹²⌋ is exact BIGINT arithmetic (the
    * per-term floor spelled identically in the oracle's HUGEINT
    * dags); removal effects are differences of gridded probabilities
    * and every emitted ratio is ONE division of exact integers.
    *
    * Scale shape: ONE corpus window pass (user-partitioned, the q192
    * shape) builds the ≤(K+3)²-row transition count matrix; the
    * matrix COLLECTS as a bounded model pull (the q70/q209
    * convention — K is the catalog-bounded event-type domain) and the
    * 5×8 fixed-horizon vector iterations fold driver-side in exact
    * BigInt arithmetic; the 4-row result re-enters as a
    * LocalRelation.
    */
  private def q228(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    // truncate at the first purchase by RANK (not by time — a same-
    // timestamp sibling of the purchase must not survive the cut and
    // emit a transition out of the absorber)
    val ev = Tables
      .table(s, dir, "events")
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("event_id"),
        col("event_type")
      )
      .withColumn("rn", row_number().over(w))
      .withColumn(
        "rp",
        min(when(col("event_type") === "purchase", col("rn"))).over(
          Window.partitionBy("user_id")
        )
      )
      .filter(col("rp").isNull || col("rn") <= col("rp"))
    val steps = ev
      .withColumn("prev", lag("event_type", 1).over(w))
      .withColumn("nxt", lead("event_type", 1).over(w))
      .select(
        coalesce(col("prev"), lit("START")).as("i"),
        when(col("event_type") === "purchase", "CONV")
          .otherwise(col("event_type"))
          .as("j"),
        col("nxt"),
        col("event_type")
      )
    // the terminal NULL hop for non-converting journeys: the last
    // event (nxt IS NULL, not itself a conversion) → NULL
    val trans = steps
      .select(col("i"), col("j"))
      .unionAll(
        steps
          .filter(col("nxt").isNull && col("event_type") =!= "purchase")
          .select(col("j").as("i"), lit("NULL").as("j"))
      )
      .groupBy("i", "j")
      .agg(count(lit(1)).as("c"))
    val counts = trans
      .as[(String, String, Long)]
      .collect()
      .toSeq
    // ---- bounded driver-side fold (exact integer arithmetic) ----
    val G = BigInt(1000000000000L)
    val states = ("START" +: MarkovChannels) ++ Seq("CONV", "NULL")
    val rowSums = counts.groupBy(_._1).map { case (i, g) => i -> g.map(_._3).sum }
    val base: Map[(String, String), BigInt] = counts.map { case (i, j, c) =>
      (i, j) -> BigInt(c) * G / BigInt(rowSums(i))
    }.toMap
    def absorbing(p: Map[(String, String), BigInt]): Map[(String, String), BigInt] =
      p ++ Map(("CONV", "CONV") -> G, ("NULL", "NULL") -> G)
    def converge(p: Map[(String, String), BigInt]): BigInt = {
      var v: Map[String, BigInt] = Map("START" -> G)
      for (_ <- 1 to MarkovRounds) {
        v = states
          .map { j =>
            j -> v.map { case (i, vi) => vi * p.getOrElse((i, j), BigInt(0)) / G }.sum
          }
          .filter(_._2 > 0)
          .toMap
      }
      v.getOrElse("CONV", BigInt(0))
    }
    val pFull = converge(absorbing(base))
    val without = MarkovChannels.map { c =>
      val redirected = base.toSeq
        .map { case ((i, j), p) => ((i, if (j == c) "NULL" else j), p) }
        .groupBy(_._1)
        .map { case (k, g) => k -> g.map(_._2).sum }
      c -> converge(absorbing(redirected))
    }
    val re = without.map { case (c, pc) => (c, pc, pFull - pc) }
    val reSum = re.map(_._3).sum
    // exact half-up round-6 of the rational num/den — the engine-
    // neutral spelling (a driver-side double round would reopen the
    // q76 Spark-vs-DuckDB rounding split); den > 0 throughout
    def r6(num: BigInt, den: BigInt): Double =
      if (den == 0) 0.0
      else ((num * 2000000 + den) / (den * 2)).toDouble / 1e6
    val out = re.map { case (c, pc, r) =>
      (c, r6(pc, G), r6(r, pFull), r6(r, reSum))
    }
    s.createDataFrame(out)
      .toDF("channel", "p_without", "removal_effect", "attribution_share")
      .withColumn("p_full", lit(r6(pFull, G)))
      .select("channel", "p_full", "p_without", "removal_effect", "attribution_share")
      .orderBy("channel")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q228_markov_attribution" -> q228,
    "q227_sequential_patterns" -> q227,
    "q200_rfm_segments" -> q200,
    "q199_conversion_lag" -> q199,
    "q192_markov_transitions" -> q192,
    "q78_funnel" -> q78,
    "q79_cohort_retention" -> q79,
    "q83_ewma" -> q83,
    "q85_sliding_distinct" -> q85,
    "q88_session_paths" -> q88,
    "q89_sessionize" -> q89,
    "q126_activity_streaks" -> q126,
    "q128_growth_accounting" -> q128
  )

  /** q83's oracle, generated from the SAME K/α so the term list, weight
    * literals, and left-to-right addition order can never drift from
    * the Spark spelling.
    */
  private val EwmaOracleSql: String = {
    val K = 20
    val alpha = 0.8
    val terms = (0 until K).map { k =>
      val wk = math.pow(alpha, k)
      (
        s"coalesce(lag(value, $k) OVER w, 0.0) * $wk",
        s"CASE WHEN lag(value, $k) OVER w IS NOT NULL THEN $wk ELSE 0.0 END"
      )
    }
    val num = terms.map(_._1).mkString(" + ")
    val den = terms.map(_._2).mkString(" + ")
    s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, value
       |           FROM events)
       |SELECT event_id, user_id, value,
       |       round(($num) / ($den), 4) + 0.0 AS ewma
       |FROM e
       |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
       |ORDER BY event_id""".stripMargin
  }

  private def q192IterSql(prev: String): String =
    s"""SELECT pm.to_type AS st,
       |  CAST(sum(CAST(floor(r.r * pm.p * 1.0e12) AS BIGINT)) AS DOUBLE)
       |    / 1.0e12 AS r
       |FROM pm JOIN $prev r ON r.st = pm.from_type
       |GROUP BY pm.to_type""".stripMargin

  /** One RFM-dimension threshold CTE body: ⌈q·n⌉ positional selection
    * over the per-value cumulative counts of column `dim` of `b` (the
    * oracle may use the naive single window — the q111 convention).
    */
  private def rfmThresholdSql(dim: String): String =
    s"""  SELECT min(CASE WHEN cum >= (n.n + 4) // 5 THEN v END) AS t20,
       |    min(CASE WHEN cum >= (2 * n.n + 4) // 5 THEN v END) AS t40,
       |    min(CASE WHEN cum >= (3 * n.n + 4) // 5 THEN v END) AS t60,
       |    min(CASE WHEN cum >= (4 * n.n + 4) // 5 THEN v END) AS t80
       |  FROM (SELECT v, sum(c) OVER (ORDER BY v
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |        FROM (SELECT $dim AS v, CAST(count(*) AS BIGINT) AS c
       |              FROM b GROUP BY 1)) CROSS JOIN n""".stripMargin

  /** One q228 absorption round as SQL — the driver fold's per-term
    * ⌊v·p/10¹²⌋ BIGINT arithmetic verbatim.
    */
  private def markovRoundSql(tag: String, mat: String, k: Int): String =
    s"""$tag$k AS MATERIALIZED (
       |  SELECT p.j AS state,
       |    CAST(sum(CAST(v.v12 AS HUGEINT) * p.p12 // 1000000000000)
       |         AS BIGINT) AS v12
       |  FROM $tag${k - 1} v JOIN $mat p ON p.i = v.state
       |  GROUP BY p.j)""".stripMargin

  private def markovChainSql(tag: String, mat: String): String =
    (s"""${tag}0 AS (SELECT 'START' AS state,
        |  CAST(1000000000000 AS BIGINT) AS v12)""".stripMargin +:
      (1 to MarkovRounds).map(markovRoundSql(tag, mat, _))).mkString(",\n") +
      s""",
         |${tag}p AS (SELECT coalesce(max(CASE WHEN state = 'CONV' THEN v12 END),
         |  0) AS p FROM $tag$MarkovRounds)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // same rank-truncated journeys, same floor(count·10¹²/rowsum)
    // matrix, same per-term-floored HUGEINT rounds, same exact
    // half-up round-6 integer renders
    "q228_markov_attribution" -> {
      val removalMats = MarkovChannels
        .map(c => s"""pm_$c AS MATERIALIZED (
           |  SELECT i, CASE WHEN j = '$c' THEN 'NULL' ELSE j END AS j,
           |    CAST(sum(p12) AS BIGINT) AS p12
           |  FROM pfull GROUP BY 1, 2)""".stripMargin)
        .mkString(",\n")
      val chains = (markovChainSql("fv", "pfull") +:
        MarkovChannels.map(c => markovChainSql(s"v$c", s"pm_$c")))
        .mkString(",\n")
      val resRows = MarkovChannels
        .map(c => s"SELECT '$c' AS channel, (SELECT p FROM v${c}p) AS pw")
        .mkString("\n        |  UNION ALL\n        |  ")
      s"""WITH ev AS (
         |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
         |rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY us, event_id) AS rn
         |  FROM ev),
         |rp AS (
         |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN rn END)
         |    OVER (PARTITION BY user_id) AS rp
         |  FROM rk),
         |kept AS (SELECT * FROM rp WHERE rp IS NULL OR rn <= rp),
         |st AS (
         |  SELECT
         |    coalesce(lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY us, event_id), 'START') AS i,
         |    CASE WHEN event_type = 'purchase' THEN 'CONV'
         |         ELSE event_type END AS j,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY us, event_id) AS nxt,
         |    event_type
         |  FROM kept),
         |tr AS (
         |  SELECT i, j FROM st
         |  UNION ALL
         |  SELECT j AS i, 'NULL' AS j FROM st
         |  WHERE nxt IS NULL AND event_type <> 'purchase'),
         |tc AS (SELECT i, j, CAST(count(*) AS BIGINT) AS c FROM tr GROUP BY 1, 2),
         |rs AS (SELECT i, CAST(sum(c) AS BIGINT) AS s FROM tc GROUP BY 1),
         |pbase AS (
         |  SELECT tc.i, tc.j,
         |    CAST(CAST(tc.c AS HUGEINT) * 1000000000000 // rs.s AS BIGINT) AS p12
         |  FROM tc JOIN rs USING (i)),
         |pfull AS MATERIALIZED (
         |  SELECT i, j, p12 FROM pbase
         |  UNION ALL SELECT 'CONV', 'CONV', CAST(1000000000000 AS BIGINT)
         |  UNION ALL SELECT 'NULL', 'NULL', CAST(1000000000000 AS BIGINT)),
         |$removalMats,
         |$chains,
         |res AS (
         |  $resRows),
         |r AS (
         |  SELECT channel, pw, (SELECT p FROM fvp) - pw AS re FROM res),
         |t AS (SELECT CAST(sum(re) AS BIGINT) AS sre FROM r)
         |SELECT channel,
         |  CAST((CAST((SELECT p FROM fvp) AS HUGEINT) * 2000000
         |        + 1000000000000) // 2000000000000 AS DOUBLE) / 1.0e6 AS p_full,
         |  CAST((CAST(pw AS HUGEINT) * 2000000 + 1000000000000)
         |       // 2000000000000 AS DOUBLE) / 1.0e6 AS p_without,
         |  CASE WHEN (SELECT p FROM fvp) = 0 THEN 0.0
         |       ELSE CAST((CAST(re AS HUGEINT) * 2000000 + (SELECT p FROM fvp))
         |                 // (2 * (SELECT p FROM fvp)) AS DOUBLE) / 1.0e6
         |  END AS removal_effect,
         |  CASE WHEN (SELECT sre FROM t) = 0 THEN 0.0
         |       ELSE CAST((CAST(re AS HUGEINT) * 2000000 + (SELECT sre FROM t))
         |                 // (2 * (SELECT sre FROM t)) AS DOUBLE) / 1.0e6
         |  END AS attribution_share
         |FROM r, t ORDER BY channel""".stripMargin
    },
    // same first-occurrence micros frame, same strict-< pair join,
    // same single-division metrics on the round-6 grid
    "q227_sequential_patterns" ->
      """WITH firsts AS (
        |  SELECT user_id, event_type,
        |    CAST(min(epoch_us(ts)) AS BIGINT) AS t
        |  FROM events GROUP BY 1, 2),
        |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM firsts),
        |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
        |       FROM firsts GROUP BY 1),
        |ab AS (
        |  SELECT l.event_type AS ea, r.event_type AS eb,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM firsts l JOIN firsts r
        |    ON l.user_id = r.user_id AND l.event_type <> r.event_type
        |       AND l.t < r.t
        |  GROUP BY 1, 2)
        |SELECT ea, eb, n_ab, a.n_t AS n_a, b.n_t AS n_b,
        |  round(CAST(n_ab AS DOUBLE) / CAST(nu.nu AS DOUBLE), 6) + 0.0
        |    AS support,
        |  round(CAST(n_ab AS DOUBLE) / CAST(a.n_t AS DOUBLE), 6) + 0.0
        |    AS confidence,
        |  round(CAST(n_ab * nu.nu AS DOUBLE) / CAST(a.n_t * b.n_t AS DOUBLE), 6)
        |    + 0.0 AS lift
        |FROM ab JOIN pt a ON a.event_type = ab.ea
        |        JOIN pt b ON b.event_type = ab.eb, nu
        |ORDER BY ea, eb""".stripMargin,
    // same buyer frame, same exact value-based quintile thresholds
    // (naive single-window cumulation — the oracle may scan), same
    // tie-to-lower-code CASE arithmetic
    "q200_rfm_segments" -> (
      s"""WITH dm AS (SELECT max(CAST(ts AS DATE)) AS dmax FROM events),
         |b AS (
         |  SELECT user_id,
         |    CAST(dmax - max(CAST(ts AS DATE)) AS BIGINT) AS r,
         |    CAST(count(*) AS BIGINT) AS f,
         |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS m
         |  FROM events CROSS JOIN dm WHERE event_type = 'purchase'
         |  GROUP BY user_id, dmax),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
         |rt AS (
         |${rfmThresholdSql("r")}),
         |ft AS (
         |${rfmThresholdSql("f")}),
         |mt AS (
         |${rfmThresholdSql("m")}),
         |codes AS (
         |  SELECT
         |    6 - (1 + (CASE WHEN r > rt.t20 THEN 1 ELSE 0 END)
         |           + (CASE WHEN r > rt.t40 THEN 1 ELSE 0 END)
         |           + (CASE WHEN r > rt.t60 THEN 1 ELSE 0 END)
         |           + (CASE WHEN r > rt.t80 THEN 1 ELSE 0 END)) AS r_code,
         |    1 + (CASE WHEN f > ft.t20 THEN 1 ELSE 0 END)
         |      + (CASE WHEN f > ft.t40 THEN 1 ELSE 0 END)
         |      + (CASE WHEN f > ft.t60 THEN 1 ELSE 0 END)
         |      + (CASE WHEN f > ft.t80 THEN 1 ELSE 0 END) AS f_code,
         |    1 + (CASE WHEN m > mt.t20 THEN 1 ELSE 0 END)
         |      + (CASE WHEN m > mt.t40 THEN 1 ELSE 0 END)
         |      + (CASE WHEN m > mt.t60 THEN 1 ELSE 0 END)
         |      + (CASE WHEN m > mt.t80 THEN 1 ELSE 0 END) AS m_code,
         |    m
         |  FROM b CROSS JOIN rt CROSS JOIN ft CROSS JOIN mt)
         |SELECT r_code, f_code, m_code,
         |  CAST(count(*) AS BIGINT) AS n_users,
         |  round(CAST(sum(m) AS DOUBLE)
         |        / CAST(count(*) * 100 AS DOUBLE), 4) + 0.0 AS mean_spend
         |FROM codes GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    ),
    // same first-view/first-purchase lags, same exact ⌈q·n⌉ positional
    // selection over the value frame
    "q199_conversion_lag" ->
      """WITH v AS (
        |  SELECT user_id, min(epoch_us(ts)) AS vus
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |pl AS (
        |  SELECT p.user_id, v.vus, min(epoch_us(p.ts)) AS pus
        |  FROM events p JOIN v USING (user_id)
        |  WHERE p.event_type = 'purchase' AND epoch_us(p.ts) >= v.vus
        |  GROUP BY 1, 2),
        |lag AS (SELECT (pus - vus) // 60000000 AS lag FROM pl),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lag),
        |vc AS (SELECT lag, CAST(count(*) AS BIGINT) AS c FROM lag GROUP BY 1),
        |cum AS (
        |  SELECT lag,
        |    sum(c) OVER (ORDER BY lag
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM vc)
        |SELECT max(n.n) AS n_users,
        |  min(CASE WHEN cum >= (n.n + 3) // 4 THEN lag END) AS p25_minutes,
        |  min(CASE WHEN cum >= (n.n + 1) // 2 THEN lag END) AS p50_minutes,
        |  min(CASE WHEN cum >= (9 * n.n + 9) // 10 THEN lag END) AS p90_minutes
        |FROM cum CROSS JOIN n""".stripMargin,
    // same lead() transitions, same 1e-12-grid synchronous iterations
    "q192_markov_transitions" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
         |  FROM events),
         |tr AS (
         |  SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |                           ORDER BY us, event_id) AS to_type
         |  FROM e),
         |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_trans
         |      FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |rt AS (SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS row_n
         |       FROM c GROUP BY 1),
         |pm AS (SELECT c.from_type, c.to_type, c.n_trans,
         |         CAST(c.n_trans AS DOUBLE) / CAST(rt.row_n AS DOUBLE) AS p
         |       FROM c JOIN rt USING (from_type)),
         |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM rt),
         |r0 AS (SELECT from_type AS st, 1.0 / (SELECT k FROM kk) AS r FROM rt),
         |r1 AS (${q192IterSql("r0")}),
         |r2 AS (${q192IterSql("r1")}),
         |r3 AS (${q192IterSql("r2")}),
         |r4 AS (${q192IterSql("r3")})
         |SELECT pm.from_type, pm.to_type, pm.n_trans,
         |  round(pm.p, 6) + 0.0 AS p_trans,
         |  round(coalesce(r4.r, 0.0), 6) + 0.0 AS stationary_from
         |FROM pm LEFT JOIN r4 ON r4.st = pm.from_type
         |ORDER BY from_type, to_type""".stripMargin,
    "q83_ewma" -> EwmaOracleSql,
    "q89_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, value FROM events),
        |f AS (
        |  SELECT user_id, us, event_id, value,
        |         CASE WHEN us - lag(us) OVER w <= 1800000000
        |              THEN 0 ELSE 1 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |g AS (
        |  SELECT user_id, us, value,
        |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM f)
        |SELECT user_id,
        |       min(us) AS session_start_us,
        |       max(us) AS session_end_us,
        |       count(*) AS cnt,
        |       round(sum(value), 4) + 0.0 AS sum_value
        |FROM g GROUP BY user_id, sess
        |ORDER BY user_id, session_start_us""".stripMargin,
    "q88_session_paths" ->
      """WITH r AS (
        |  SELECT user_id,
        |         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
        |         event_type,
        |         row_number() OVER (
        |           PARTITION BY user_id,
        |             CAST(epoch_us(ts) // 86400000000 AS BIGINT)
        |           ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, day,
        |         string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 5 GROUP BY user_id, day)
        |SELECT path, count(*) AS n FROM p
        |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin,
    // deliberately the NAIVE algorithm (window-position × events join):
    // the gate then cross-checks two independent computations
    "q85_sliding_distinct" ->
      """WITH e AS (
        |  SELECT event_type, user_id,
        |         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        |  FROM events),
        |days AS (SELECT DISTINCT event_type, day FROM e)
        |SELECT d.event_type, d.day, count(DISTINCT user_id) AS n_users
        |FROM days d JOIN e ON e.event_type = d.event_type
        |                   AND e.day BETWEEN d.day - 1 AND d.day
        |GROUP BY d.event_type, d.day
        |ORDER BY d.event_type, d.day""".stripMargin,
    "q78_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (
        |  SELECT user_id, min(us) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id)
        |SELECT s1.user_id, t1, t2, t3,
        |       1 + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
        |         + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS funnel_depth,
        |       coalesce(t3 IS NOT NULL AND t3 - t1 <= 86400000000, false)
        |         AS converted_24h
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q128_growth_accounting" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (
        |  SELECT d, lag(d) OVER w AS prev, lead(d) OVER w AS next
        |  FROM days WINDOW w AS (PARTITION BY user_id ORDER BY d)),
        |states AS (
        |  SELECT d,
        |         CASE WHEN prev IS NULL THEN 'new'
        |              WHEN datediff('day', prev, d) = 1 THEN 'retained'
        |              ELSE 'resurrected' END AS state
        |  FROM f
        |  UNION ALL
        |  SELECT d + 1, 'churned' FROM f
        |  WHERE next IS NULL OR datediff('day', d, next) > 1)
        |SELECT d,
        |  CAST(sum(CASE WHEN state <> 'churned' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_active,
        |  CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_retained,
        |  CAST(sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_resurrected,
        |  CAST(sum(CASE WHEN state = 'churned' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_churned
        |FROM states GROUP BY d ORDER BY d""".stripMargin,
    "q126_activity_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |isl AS (
        |  SELECT user_id, d,
        |         datediff('day', DATE '2024-01-01', d)
        |           - row_number() OVER (PARTITION BY user_id ORDER BY d)
        |           AS grp
        |  FROM days),
        |streaks AS (
        |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
        |         min(d) AS start_d
        |  FROM isl GROUP BY user_id, grp),
        |ranked AS (
        |  SELECT user_id, len, start_d,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY len DESC, start_d) AS rk
        |  FROM streaks),
        |agg AS (
        |  SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |         CAST(count(*) AS BIGINT) AS n_streaks
        |  FROM streaks GROUP BY user_id)
        |SELECT agg.user_id, n_active_days, n_streaks,
        |       len AS longest_len, start_d AS longest_start
        |FROM agg JOIN ranked ON agg.user_id = ranked.user_id AND rk = 1
        |ORDER BY agg.user_id""".stripMargin,
    "q79_cohort_retention" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id,
        |         CAST(epoch_us(ts) // 86400000000 // 7 AS BIGINT) AS week
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
        |SELECT cohort_week, week - cohort_week AS "offset",
        |       count(DISTINCT user_id) AS n_active
        |FROM e JOIN cohort USING (user_id)
        |GROUP BY cohort_week, week - cohort_week
        |ORDER BY cohort_week, "offset"""".stripMargin
  )
}
