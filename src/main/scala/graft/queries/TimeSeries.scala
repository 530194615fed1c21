package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Irregular-time-series summarization over the events stream — the
  * bar-building half of a metrics/market-data pipeline: time-weighted
  * averages (TWAP) over irregularly-sampled per-entity series, and
  * per-(type, day) OHLC/VWAP candles.
  *
  * Reference scope: none (the reference's query half is delegated to
  * Athena; these are the time-series aggregations such a deployment
  * runs there). Family conventions: values centi-snapped to exact
  * BIGINTs first (the q113 convention), all weights/durations exact
  * integer microseconds from the timestamp, ONE closed-form float
  * division at the end under a round(·, 6) grid, nullif-guarded
  * degenerate denominators, deterministic (ts, event_id) tie-breaks.
  *
  * Scale shape: both queries are one hash aggregate over the stream;
  * the TWAP window sorts only within a user's own history (per-user
  * histories are naturally short — the q84b argument), and the OHLC
  * extremes come from min_by/max_by struct aggregates, never a
  * per-group sort.
  */
object TimeSeries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables
      .table(s, dir, "events")
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        col("ts"),
        col("props"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100.0, 0).cast("long").as("vc")
      )

  /** q119: per-user TWAP — each sample's value holds until the user's
    * next event (zero-order hold), so the average weights every sample
    * by its exact holding duration in integer microseconds:
    * TWAP = Σ vc·dur / (Σ dur · 100). The last sample has no successor
    * and carries no weight (the standard left-closed convention).
    *
    * Scale shape: ONE user-keyed exchange; the lead() window sorts a
    * user's own ≤dozens-row history, never the corpus; then one hash
    * aggregate. Σ vc·dur ≤ max_vc · span_us ≈ 5·10^4 · 2.6·10^12 ≈
    * 1.3·10^17 per user — BIGINT-safe to ~70× this span; beyond that
    * the sum moves to DECIMAL(38).
    */
  private def q119(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events(s, dir)
      .withColumn("dur", lead("us", 1).over(w) - col("us"))
      .filter(col("dur").isNotNull)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_samples"),
        sum("dur").as("total_dur_us"),
        sum(col("vc") * col("dur")).as("swx")
      )
      .select(
        col("user_id"),
        col("n_samples"),
        col("total_dur_us"),
        round(
          col("swx").cast("double")
            / nullif(col("total_dur_us").cast("double") * 100.0, lit(0.0)),
          6
        ).as("twap")
      )
      .orderBy("user_id")
  }

  /** q119b: OHLC + VWAP candles per (event_type, day) — open/close are
    * the first/last centi value under the deterministic (us, event_id)
    * order via min_by/max_by over structs (ONE hash aggregate, no
    * per-group sort — the q91 extremes convention); volume is the
    * integer props.k payload, VWAP = Σ vc·vol / (Σ vol · 100).
    *
    * Parity: open/high/low/close are exact centi integers rendered as
    * value units by an exact /100.0 (centi → double is exact, no grid
    * needed); VWAP is the one true float step, round-6 + nullif. The
    * oracle derives open/close by a DIFFERENT algorithm (row_number
    * first/last rows per partition), so two independent spellings must
    * agree.
    */
  private def q119b(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("day", to_date(col("ts")))
      .withColumn("vol", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type", "day")
      .agg(
        count(lit(1)).as("n_events"),
        min_by(col("vc"), struct(col("us"), col("event_id"))).as("o_c"),
        max("vc").as("h_c"),
        min("vc").as("l_c"),
        max_by(col("vc"), struct(col("us"), col("event_id"))).as("c_c"),
        sum("vol").as("volume"),
        sum(col("vc") * col("vol")).as("spv")
      )
      .select(
        col("event_type"),
        col("day"),
        col("n_events"),
        (col("o_c").cast("double") / 100.0).as("open"),
        (col("h_c").cast("double") / 100.0).as("high"),
        (col("l_c").cast("double") / 100.0).as("low"),
        (col("c_c").cast("double") / 100.0).as("close"),
        col("volume"),
        round(
          col("spv").cast("double")
            / nullif(col("volume").cast("double") * 100.0, lit(0.0)),
          6
        ).as("vwap")
      )
      .orderBy("event_type", "day")

  /** q155: rolling 7-OBSERVED-DAY MEDIAN smoothing of the daily value
    * series per event type — the robust trend line (a single
    * flash-crash day drags a rolling MEAN for a week; the rolling
    * median shrugs it off, which is why monitoring smooths with medians
    * before alerting). The frame is the trailing 7 ROWS over days
    * PRESENT in the aggregate (hence the `7obs` column name): a
    * zero-event calendar day widens the covered calendar span rather
    * than shrinking the sample — the spelling monitoring wants when
    * absent days mean "no data", not "zero". A strict calendar-7-day
    * variant is a RANGE frame over day numbers (q15b's RANGE convention)
    * or a gap-fill (q59b) composed in front of this window. Median
    * inputs are exact centi BIGINT daily sums, so the only float is the
    * interpolation midpoint — (a+b)/2 of integers, exactly
    * representable — then one /100 and the round grid; the first 6
    * observed days smooth over their shorter prefix (the standard
    * expanding warm-up, n_in_win says so explicitly).
    *
    * Scale shape: ONE corpus hash aggregate to the (type, day) frame;
    * the rolling window runs over day-level rows (calendar-bounded)
    * partitioned by type with a 7-ROW frame — never the corpus, never
    * unpartitioned.
    */
  private def q155(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .table(s, dir, "events")
      .groupBy(
        col("event_type"),
        to_date(col("ts")).as("d")
      )
      .agg(sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
    val w = Window
      .partitionBy("event_type")
      .orderBy("d")
      .rowsBetween(-6, 0)
    daily
      .select(
        col("event_type"),
        col("d"),
        col("sv"),
        count(lit(1)).over(w).as("n_in_win"),
        (round(expr("percentile(sv, 0.5)").over(w) / 100.0, 4) + 0.0)
          .as("roll_med_7obs")
      )
      .orderBy("event_type", "d")
  }

  /** ACF lags audited by q173: adjacent structure (1–3) plus the weekly
    * echo (7) — the lags a seasonality/anomaly pipeline actually keys
    * decisions on.
    */
  private val AcfLags = Seq(1, 2, 3, 7)

  /** q173: autocorrelation function (ACF) of each event type's daily
    * value series at lags {1, 2, 3, 7} — the first diagnostic a
    * forecasting/anomaly pipeline computes (ACF(1) ≈ 0 says yesterday
    * predicts nothing: alert on levels, not deltas; a lag-7 spike says
    * weekly seasonality: the q113 seasonal baseline is the right
    * detrend). Lag pairing is by OBSERVED-day ROW offset (the q155
    * convention, stated in the name of honesty there) via a
    * type-partitioned lag window over the day-aggregated frame.
    *
    * Determinism (q120 moment discipline): daily sums are exact centi
    * BIGINTs, per-(type, lag) moments are exact DECIMAL(38) sums of
    * BIGINT products, and r is the fixed Pearson dag on the moment
    * scalars; degenerate series (constant ⇒ zero variance) null out
    * through the nullif guard and surface as NULL rather than a fake 0.
    *
    * Scale shape: ONE corpus hash aggregate to the (type, day) frame;
    * the ×4 lag explode pairs rows via a hash equi-join on
    * (type, rn − lag) over the calendar-bounded daily frame (never the
    * corpus); one (type, lag)-group moment aggregate. The corpus is
    * touched once.
    */
  private def q173(s: SparkSession, dir: String): DataFrame = {
    // lag offsets must be literals in a window's Lag — pair rows by
    // observed-day row number through an equi-join on (type, rn − lag)
    // instead (hash join on derived keys, no dynamic-offset window)
    val wRn = Window.partitionBy("event_type").orderBy("d")
    val daily = Tables
      .table(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
      .withColumn("rn", row_number().over(wRn))
    val cur = daily
      .select(
        col("event_type"),
        col("rn"),
        col("sv"),
        explode(array(AcfLags.map(l => lit(l)): _*)).as("lag")
      )
      .as("cur")
    val prior = daily
      .select(
        col("event_type"),
        col("rn").as("rn2"),
        col("sv").as("prev")
      )
      .as("prior")
    val pairs = cur
      .join(
        prior,
        col("cur.event_type") === col("prior.event_type") &&
          col("cur.rn") - col("cur.lag") === col("prior.rn2")
      )
      .select(
        col("cur.event_type").as("event_type"),
        col("cur.lag").as("lag"),
        col("cur.sv").as("sv"),
        col("prior.prev").as("prev")
      )
    pairs
      .groupBy("event_type", "lag")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("sv").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(col("prev").cast("decimal(38,0)")).cast("double").as("sy"),
        sum((col("sv") * col("sv")).cast("decimal(38,0)")).cast("double").as("sxx"),
        sum((col("sv") * col("prev")).cast("decimal(38,0)")).cast("double").as("sxy"),
        sum((col("prev") * col("prev")).cast("decimal(38,0)")).cast("double").as("syy")
      )
      .select(
        col("event_type"),
        col("lag"),
        col("n").cast("long").as("n_pairs"),
        (round(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif(
              sqrt(
                (col("n") * col("sxx") - col("sx") * col("sx")) *
                  (col("n") * col("syy") - col("sy") * col("sy"))
              ),
              lit(0.0)
            ),
          6
        ) + 0.0).as("acf")
      )
      .orderBy("event_type", "lag")
  }

  // -------------------- q183: cross-correlation between two series

  /** q183: lagged cross-correlation between two event-type series —
    * the lead/lag diagnostic q173's AUTOcorrelation cannot give ("do
    * clicks today predict purchases tomorrow?"; a peak at lag>0 says
    * the first series LEADS, which picks the feature/alert horizon):
    * Pearson r of daily click value at day d vs purchase value at day
    * d + lag, lag ∈ {0,1,2,3} CALENDAR days (cross-series pairing must
    * be by date, not row number — the two series observe different day
    * sets), via a hash equi-join on the lagged date. q173's exact
    * centi daily frame, DECIMAL(38) moments, nullif-guarded Pearson
    * dag.
    *
    * Scale shape: one corpus aggregate to the two calendar-bounded
    * daily frames, a ×|lags| map-side explode on the probe side, one
    * (date-key) hash join between day-frames, a 4-group moment
    * aggregate — no windows at all.
    */
  private def q183(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .table(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
    val x = daily
      .filter(col("event_type") === "click")
      .select(
        col("d"),
        col("sv").as("xv"),
        explode(array(XcorrLags.map(l => lit(l)): _*)).as("lag")
      )
    val y = daily
      .filter(col("event_type") === "purchase")
      .select(col("d").as("dy"), col("sv").as("yv"))
    x.join(y, date_add(col("d"), col("lag")) === col("dy"))
      .groupBy("lag")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("xv").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(col("yv").cast("decimal(38,0)")).cast("double").as("sy"),
        sum((col("xv") * col("xv")).cast("decimal(38,0)")).cast("double").as("sxx"),
        sum((col("xv") * col("yv")).cast("decimal(38,0)")).cast("double").as("sxy"),
        sum((col("yv") * col("yv")).cast("decimal(38,0)")).cast("double").as("syy")
      )
      .select(
        col("lag"),
        col("n").cast("long").as("n_pairs"),
        (round(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif(
              sqrt(
                (col("n") * col("sxx") - col("sx") * col("sx")) *
                  (col("n") * col("syy") - col("sy") * col("sy"))
              ),
              lit(0.0)
            ),
          6
        ) + 0.0).as("xcorr")
      )
      .orderBy("lag")
  }

  private[queries] val XcorrLags: Seq[Int] = Seq(0, 1, 2, 3)

  // ---------- q211: forecast backtest — seasonal-naive + sMAPE/MASE

  /** q211: forecast backtesting — the evaluation harness every
    * metrics-forecasting deployment needs BEFORE any model choice (the
    * seasonal-naive baseline ŷ(d) = y(d−7) is the bar a real model
    * must beat; a "forecast" gate without its eval is decoration):
    * per event type, daily counts are backtested over the LAST 14
    * calendar days against same-weekday-last-week, reporting
    *
    *   - sMAPE: per-day 2|y−ŷ|/(y+ŷ) floor-snapped to the 1e-9 grid
    *     and summed as EXACT BIGINTs (the q174 convention; a
    *     zero-zero day contributes exactly 0 via the nullif guard),
    *     one /n render;
    *   - MASE: MAE(forecast)/MAE(in-sample naive-1): spelled as the
    *     EXACT integer cross-product (Σ|err|·n_in)/(Σ|Δ|·n_eval) —
    *     one division of exact integers, no intermediate float means.
    *
    * Determinism: counts are exact; eval days are those where both
    * y(d) and y(d−7) exist in the daily frame (absent days excluded —
    * deterministic from the data); the in-sample denominator pairs
    * consecutive PRESENT days before the eval window via lag over the
    * calendar-bounded daily frame.
    *
    * Scale shape: one corpus (type, day) aggregate; everything after
    * runs on the calendar-bounded daily frame (lag windows partitioned
    * by type). Output #types rows.
    */
  private def q211(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .table(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("y"))
    val maxd = daily.agg(max(col("d")).as("maxd"))
    val withF = daily
      .join(
        daily.select(
          col("event_type"),
          date_add(col("d"), 7).as("d"),
          col("y").as("f")
        ),
        Seq("event_type", "d")
      )
      .crossJoin(broadcast(maxd))
    val evalW = withF
      .filter(datediff(col("maxd"), col("d")) < 14)
      .withColumn("aerr", abs(col("y") - col("f")))
      .withColumn(
        "sm9",
        expr(
          "CAST(floor(2.0e9 * CAST(abs(y - f) AS DOUBLE) " +
            "/ nullif(CAST(y + f AS DOUBLE), 0.0)) AS BIGINT)"
        )
      )
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_eval"),
        sum(col("aerr")).as("serr"),
        sum(coalesce(col("sm9"), lit(0L))).as("ssm9")
      )
    val w = Window.partitionBy("event_type").orderBy("d")
    val insample = daily
      .crossJoin(broadcast(maxd))
      .filter(datediff(col("maxd"), col("d")) >= 14)
      .withColumn("prev", lag(col("y"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_in"),
        sum(abs(col("y") - col("prev"))).as("sdelta")
      )
    evalW
      .join(insample, Seq("event_type"))
      .select(
        col("event_type"),
        col("n_eval"),
        (round(
          col("ssm9").cast("double") / (col("n_eval") * 1000000000L).cast("double") * 100.0,
          6
        ) + 0.0).as("smape_pct"),
        (round(
          (col("serr") * col("n_in")).cast("double") /
            nullif((col("sdelta") * col("n_eval")).cast("double"), lit(0.0d)),
          6
        ) + 0.0).as("mase")
      )
      .orderBy("event_type")
  }

  // -------- q219: partial correlation controlling for a third series

  /** q219: partial correlation of the daily click and purchase series
    * CONTROLLING for the view series — the confounder-removal step
    * q183's raw cross-correlation cannot do (clicks and purchases both
    * ride overall traffic; a high r(click, purchase) may be nothing
    * but "busy days are busy" — the partial r answers whether clicks
    * predict purchases BEYOND what traffic already explains, which is
    * the honest feature-screening number):
    * r_xy·z = (r_xy − r_xz·r_zy) / √((1 − r_xz²)(1 − r_zy²)) over
    * days where all three series are observed.
    *
    * Determinism: q173's exact centi daily frame; all nine moments
    * (three sums, three squares, three cross-products) are DECIMAL(38)
    * exact sums from ONE aggregate, cast to double once; the three
    * Pearsons and the partial are a single nullif-guarded IEEE dag
    * spelled identically on both engines.
    *
    * Scale shape: one corpus aggregate → three calendar-bounded daily
    * frames, two date equi-joins, a 1-row moment aggregate. No
    * windows.
    */
  private def q219(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .table(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase", "view"))
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
    def series(t: String, as: String) =
      daily.filter(col("event_type") === t).select(col("d"), col("sv").as(as))
    val j = series("click", "x")
      .join(series("purchase", "y"), "d")
      .join(series("view", "z"), "d")
    val m = j.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
      sum(col("z").cast("decimal(38,0)")).cast("double").as("sz"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double").as("sxx"),
      sum((col("y") * col("y")).cast("decimal(38,0)")).cast("double").as("syy"),
      sum((col("z") * col("z")).cast("decimal(38,0)")).cast("double").as("szz"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double").as("sxy"),
      sum((col("x") * col("z")).cast("decimal(38,0)")).cast("double").as("sxz"),
      sum((col("y") * col("z")).cast("decimal(38,0)")).cast("double").as("syz")
    )
    def pearson(
        n: org.apache.spark.sql.Column,
        sa: org.apache.spark.sql.Column,
        sb: org.apache.spark.sql.Column,
        saa: org.apache.spark.sql.Column,
        sab: org.apache.spark.sql.Column,
        sbb: org.apache.spark.sql.Column
    ) =
      (n * sab - sa * sb) /
        nullif(sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)), lit(0.0d))
    m.withColumn("nd", col("n").cast("double"))
      .withColumn(
        "rxy",
        pearson(col("nd"), col("sx"), col("sy"), col("sxx"), col("sxy"), col("syy"))
      )
      .withColumn(
        "rxz",
        pearson(col("nd"), col("sx"), col("sz"), col("sxx"), col("sxz"), col("szz"))
      )
      .withColumn(
        "rzy",
        pearson(col("nd"), col("sz"), col("sy"), col("szz"), col("syz"), col("syy"))
      )
      .select(
        col("n").as("n_days"),
        (round(col("rxy"), 6) + 0.0).as("r_click_purchase"),
        (round(col("rxz"), 6) + 0.0).as("r_click_view"),
        (round(col("rzy"), 6) + 0.0).as("r_view_purchase"),
        (round(
          (col("rxy") - col("rxz") * col("rzy")) /
            nullif(
              sqrt((lit(1.0d) - col("rxz") * col("rxz")) *
                (lit(1.0d) - col("rzy") * col("rzy"))),
              lit(0.0d)
            ),
          6
        ) + 0.0).as("partial_r")
      )
  }

  /** q244: Ljung–Box portmanteau white-noise test — "is there ANY
    * serial structure left" — the residual-diagnostic every forecast
    * deployment (q211) runs before trusting its backtest: q173 reports
    * the per-lag autocorrelations, Ljung–Box pools lags 1..7 into
    * Q = n(n+2)·Σₖ ρ²ₖ/(n−k) and compares χ²₇, so seven individually
    * unremarkable lags still flag when they are jointly too large.
    * Uses the STANDARD acf estimator (global mean, global c₀
    * denominator — not q173's per-lag Pearson): per type,
    * ρₖ·n²den = n²·Σyₜyₜ₋ₖ − n·Sy·(partial sums) + (n−k)·Sy².
    *
    * Determinism: every numerator/denominator is an exact DECIMAL(38)
    * integer combination of centi daily sums cast to double once per
    * lag; the 7-term pooled sum NEVER floats in aggregation order —
    * each lag's ρ²ₖ/(n−k) is floor-snapped to the 1e15 grid as a
    * BIGINT and the grid values sum exactly (the q178 discipline), so
    * Q is one IEEE dag of exact integers; the reject flag compares the
    * RAW Q dag against the exact χ²₇(0.95) literal.
    *
    * Scale shape: one corpus pass → calendar-bounded daily frames;
    * the lag pairing is the q173 rn equi-join (≤ 7n rows per type);
    * everything after is a ≤7-row-per-type frame. One-row-per-type
    * output.
    */
  private def q244(s: SparkSession, dir: String): DataFrame = {
    val lbLags = 1 to 7
    val chi2_7_95 = 14.067140449340169
    val wRn = Window.partitionBy("event_type").orderBy("d")
    val daily = Tables
      .table(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
      .withColumn("rn", row_number().over(wRn))
    val totals = daily
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("sv").cast("decimal(38,0)")).as("sy"),
        sum((col("sv") * col("sv")).cast("decimal(38,0)")).as("syy")
      )
    val cur = daily
      .select(
        col("event_type"),
        col("rn"),
        col("sv"),
        explode(array(lbLags.map(l => lit(l)): _*)).as("lag")
      )
      .as("cur")
    val prior = daily
      .select(col("event_type"), col("rn").as("rn2"), col("sv").as("prev"))
      .as("prior")
    val perLag = cur
      .join(
        prior,
        col("cur.event_type") === col("prior.event_type") &&
          col("cur.rn") - col("cur.lag") === col("prior.rn2")
      )
      .select(
        col("cur.event_type").as("event_type"),
        col("cur.lag").as("lag"),
        col("cur.sv").as("sv"),
        col("prior.prev").as("prev")
      )
      .groupBy("event_type", "lag")
      .agg(
        sum((col("sv") * col("prev")).cast("decimal(38,0)")).as("sxy"),
        sum(col("sv").cast("decimal(38,0)")).as("sxk"),
        sum(col("prev").cast("decimal(38,0)")).as("syk")
      )
    perLag
      .join(totals, "event_type")
      .withColumn("nd", col("n").cast("decimal(38,0)"))
      .withColumn(
        "num",
        col("nd") * col("nd") * col("sxy") -
          col("nd") * col("sy") * (col("sxk") + col("syk")) +
          (col("nd") - col("lag")) * col("sy") * col("sy")
      )
      .withColumn(
        "den",
        (col("nd") * (col("nd") * col("syy") - col("sy") * col("sy")))
          .cast("double")
      )
      .withColumn("rho", col("num").cast("double") / nullif(col("den"), lit(0.0d)))
      .withColumn(
        "term15",
        floor(
          col("rho") * col("rho") /
            (col("n") - col("lag")).cast("double") * 1.0e15
        ).cast("long")
      )
      .groupBy("event_type")
      .agg(
        max("n").as("n_days"),
        count(lit(1)).as("n_lags"),
        sum("term15").as("sum15")
      )
      .withColumn(
        "q_raw",
        (col("n_days") * (col("n_days") + 2)).cast("double") *
          col("sum15").cast("double") / 1.0e15
      )
      .select(
        col("event_type"),
        col("n_days"),
        col("n_lags"),
        (round(col("q_raw"), 4) + 0.0).as("q_lb"),
        (col("q_raw") > lit(chi2_7_95)).as("reject_white_noise")
      )
      .orderBy("event_type")
  }

  /** q250: SAX motif discovery — symbolize the daily revenue series
    * (Symbolic Aggregate approXimation: z-normalize, cut at the
    * standard-normal quartile breakpoints into a 4-letter alphabet)
    * and count every 3-day word: the recurring SHAPES ("low-low-high",
    * "spike-recover") that point statistics and acf can't name, the
    * standard preprocessing for motif/novelty mining on long series.
    * Top-10 words by (count, word).
    *
    * Determinism: z never floats per-row math independently — each
    * day's symbol comes from comparing the exact integer n·yₜ − Sy
    * against breakpoint·√(n(n·Σy²−Sy²)/(n−1)), the SAME single dag on
    * both engines (equality with a breakpoint to 17 digits being the
    * only grid risk — impossible on this corpus); words concatenate
    * via two lead()s over the date order; counts are exact.
    *
    * Scale shape: one corpus pass → the calendar-bounded daily frame;
    * symbolization, leads, and the word count all run on that frame
    * (the q156 allowlist convention). ≤10-row output.
    */
  private def q250(s: SparkSession, dir: String): DataFrame = {
    val bp = 0.6744897501960817
    val daily = Tables
      .table(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
    val tot = daily.agg(
      count(lit(1)).as("n"),
      sum(col("sv").cast("decimal(38,0)")).as("sy"),
      sum((col("sv") * col("sv")).cast("decimal(38,0)")).as("syy")
    )
    val sym = daily
      .crossJoin(broadcast(tot))
      .withColumn(
        "t",
        (col("n").cast("decimal(38,0)") * col("sv") - col("sy")).cast("double")
      )
      .withColumn(
        "cutw",
        sqrt(
          col("n").cast("double") *
            (col("n").cast("decimal(38,0)") * col("syy") -
              col("sy") * col("sy")).cast("double") /
            (col("n") - 1).cast("double")
        )
      )
      .withColumn(
        "sym",
        when(col("t") < -lit(bp) * col("cutw"), "a")
          .when(col("t") < lit(0.0d), "b")
          .when(col("t") < lit(bp) * col("cutw"), "c")
          .otherwise("d")
      )
      .withColumn("s1", lead("sym", 1).over(Window.orderBy("d")))
      .withColumn("s2", lead("sym", 2).over(Window.orderBy("d")))
      .filter(col("s1").isNotNull && col("s2").isNotNull)
      .select(concat(col("sym"), col("s1"), col("s2")).as("word"))
    sym
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("word"))
      .limit(10)
  }

  /** q252: Durbin–Watson statistic per event type — the lag-1 serial-
    * correlation diagnostic read off regression residuals everywhere
    * OLS ships (q244's Ljung–Box pools seven lags; DW is the sharp
    * lag-1 instrument with the classic 0–4 scale, ≈2(1−ρ₁)):
    * DW = Σₜ(yₜ−yₜ₋₁)²/Σ(yₜ−ȳ)² on the centered daily series, i.e.
    * n·Σdiff²/(n·Σy²−Sy²) — a single division of exact integers.
    *
    * Determinism: day-over-day diffs pair via lag() inside the
    * event-type partition; Σdiff² and the centered denominator are
    * exact DECIMAL(38); one division, round-4; the regime flags
    * (positive/negative autocorrelation at the textbook 1.5/2.5
    * rules-of-thumb) compare the RAW dag.
    *
    * Scale shape: one corpus pass → per-type calendar-bounded daily
    * frames; the lag window is PARTITIONED by type. One-row-per-type
    * output.
    */
  private def q252(s: SparkSession, dir: String): DataFrame = {
    val wT = Window.partitionBy("event_type").orderBy("d")
    val daily = Tables
      .table(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
      .withColumn("prev", lag("sv", 1).over(wT))
    daily
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("sv").cast("decimal(38,0)")).as("sy"),
        sum((col("sv") * col("sv")).cast("decimal(38,0)")).as("syy"),
        sum(
          when(
            col("prev").isNotNull,
            ((col("sv") - col("prev")) * (col("sv") - col("prev")))
              .cast("decimal(38,0)")
          ).otherwise(lit(0).cast("decimal(38,0)"))
        ).as("sdd")
      )
      .withColumn(
        "dw_raw",
        (col("n").cast("decimal(38,0)") * col("sdd")).cast("double") /
          nullif(
            (col("n").cast("decimal(38,0)") * col("syy") -
              col("sy") * col("sy")).cast("double"),
            lit(0.0d)
          )
      )
      .select(
        col("event_type"),
        col("n").as("n_days"),
        (round(col("dw_raw"), 4) + 0.0).as("dw"),
        when(col("dw_raw") < lit(1.5d), "positive")
          .when(col("dw_raw") > lit(2.5d), "negative")
          .otherwise("none")
          .as("autocorr_flag")
      )
      .orderBy("event_type")
  }

  /** q254: classical additive decomposition — daily revenue =
    * trend + weekly seasonal + residual, the first model every
    * forecasting/anomaly stack fits (q113 profiles raw hour-of-day
    * cells; decomposition first REMOVES the trend with a centered
    * 7-day moving average, so the weekly indices aren't polluted by
    * growth): the output is the seven day-of-week seasonal indices of
    * the detrended series — the payload consumed by deseasonalizers
    * and the q211 forecaster's seasonal term alike.
    *
    * Determinism: the centered MA never divides per row — detrended
    * stays on the exact ×7 centi grid as 7·yₜ − Σ₋₃..₊₃y (full 7-day
    * windows only); each day-of-week mean is floor-snapped once to
    * the 1e6 grid from the exact integer sum/count (the q248
    * discipline); ISO weekday numbering (1 = Monday) on both engines.
    *
    * Scale shape: one corpus pass → the calendar-bounded daily frame;
    * the moving window and the 7-row day-of-week aggregate run on that
    * frame (the q156 allowlist convention). Seven-row output.
    */
  private def q254(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .table(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
    val w7 = Window.orderBy("d").rowsBetween(-3, 3)
    daily
      .withColumn("ms", sum("sv").over(w7))
      .withColumn("mc", count(lit(1)).over(w7))
      .filter(col("mc") === 7)
      .withColumn("detr7", lit(7L) * col("sv") - col("ms"))
      .withColumn("dow", expr("CAST(weekday(d) + 1 AS BIGINT)"))
      .groupBy("dow")
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col("detr7").cast("decimal(38,0)")).as("sd")
      )
      .withColumn(
        "s6",
        floor(col("sd").cast("double") / col("n_obs").cast("double") * 1.0e6)
          .cast("long")
      )
      .select(
        col("dow"),
        col("n_obs"),
        (round(col("s6").cast("double") / (7.0e6 * 100.0d), 4) + 0.0)
          .as("seasonal_idx")
      )
      .orderBy("dow")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q244_ljung_box" -> q244,
    "q250_sax_motifs" -> q250,
    "q252_durbin_watson" -> q252,
    "q254_decomposition" -> q254,
    "q219_partial_correlation" -> q219,
    "q211_forecast_backtest" -> q211,
    "q183_cross_correlation" -> q183,
    "q119_twap" -> q119,
    "q119b_ohlc_vwap" -> q119b,
    "q155_rolling_median" -> q155,
    "q173_autocorrelation" -> q173
  )

  val oracleSql: Map[String, String] = Map(
    // same daily centi frame and rn lag pairing, same exact HUGEINT
    // numerator/denominator per lag, same 1e15 grid-snapped pooled sum
    // and raw-dag χ²₇ compare
    "q244_ljung_box" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events GROUP BY 1, 2),
        |rn AS (
        |  SELECT event_type, sv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        |  FROM daily),
        |tot AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(sv AS HUGEINT)) AS sy,
        |    sum(CAST(sv * sv AS HUGEINT)) AS syy
        |  FROM rn GROUP BY 1),
        |pl AS (
        |  SELECT c.event_type, l.lag,
        |    sum(CAST(c.sv * p.sv AS HUGEINT)) AS sxy,
        |    sum(CAST(c.sv AS HUGEINT)) AS sxk,
        |    sum(CAST(p.sv AS HUGEINT)) AS syk
        |  FROM rn c
        |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
        |  JOIN rn p ON p.event_type = c.event_type AND p.rn = c.rn - l.lag
        |  GROUP BY 1, 2),
        |rho AS (
        |  SELECT pl.event_type, pl.lag, tot.n,
        |    CAST(CAST(n AS HUGEINT) * n * sxy
        |         - CAST(n AS HUGEINT) * sy * (sxk + syk)
        |         + (CAST(n AS HUGEINT) - lag) * sy * sy AS DOUBLE)
        |      / nullif(CAST(CAST(n AS HUGEINT)
        |          * (CAST(n AS HUGEINT) * syy - sy * sy) AS DOUBLE), 0.0)
        |      AS r
        |  FROM pl JOIN tot ON tot.event_type = pl.event_type),
        |g AS (
        |  SELECT event_type, max(n) AS n_days,
        |    CAST(count(*) AS BIGINT) AS n_lags,
        |    CAST(sum(CAST(floor(r * r / CAST(n - lag AS DOUBLE) * 1.0e15)
        |                  AS BIGINT)) AS BIGINT) AS sum15
        |  FROM rho GROUP BY 1),
        |q AS (
        |  SELECT *, CAST(n_days * (n_days + 2) AS DOUBLE)
        |    * CAST(sum15 AS DOUBLE) / 1.0e15 AS q_raw
        |  FROM g)
        |SELECT event_type, n_days, n_lags,
        |  round(q_raw, 4) + 0.0 AS q_lb,
        |  q_raw > 14.067140449340169 AS reject_white_noise
        |FROM q ORDER BY event_type""".stripMargin,
    // same full-window ×7-grid detrending, same ISO weekday buckets,
    // same 1e6-grid-snapped day-of-week means
    "q254_decomposition" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events GROUP BY 1),
        |mv AS (
        |  SELECT d, sv,
        |    CAST(sum(sv) OVER (ORDER BY d
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS ms,
        |    CAST(count(*) OVER (ORDER BY d
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS mc
        |  FROM daily),
        |dt AS (
        |  SELECT CAST(isodow(d) AS BIGINT) AS dow, 7 * sv - ms AS detr7
        |  FROM mv WHERE mc = 7),
        |ag AS (
        |  SELECT dow, CAST(count(*) AS BIGINT) AS n_obs,
        |    sum(CAST(detr7 AS HUGEINT)) AS sd
        |  FROM dt GROUP BY 1),
        |sn AS (
        |  SELECT dow, n_obs,
        |    CAST(floor(CAST(sd AS DOUBLE) / CAST(n_obs AS DOUBLE) * 1.0e6)
        |         AS BIGINT) AS s6
        |  FROM ag)
        |SELECT dow, n_obs,
        |  round(CAST(s6 AS DOUBLE) / (7.0e6 * 100.0), 4) + 0.0 AS seasonal_idx
        |FROM sn ORDER BY dow""".stripMargin,
    // same exact n·y − Sy vs breakpoint·cutw symbol dag, same two
    // leads over the date order, same exact word counts
    "q250_sax_motifs" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(sv AS HUGEINT)) AS sy,
        |    sum(CAST(sv * sv AS HUGEINT)) AS syy
        |  FROM daily),
        |sym AS (
        |  SELECT d,
        |    CASE
        |      WHEN CAST(CAST(n AS HUGEINT) * sv - sy AS DOUBLE)
        |        < -0.6744897501960817 * sqrt(CAST(n AS DOUBLE)
        |            * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)
        |            / CAST(n - 1 AS DOUBLE)) THEN 'a'
        |      WHEN CAST(CAST(n AS HUGEINT) * sv - sy AS DOUBLE) < 0.0 THEN 'b'
        |      WHEN CAST(CAST(n AS HUGEINT) * sv - sy AS DOUBLE)
        |        < 0.6744897501960817 * sqrt(CAST(n AS DOUBLE)
        |            * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)
        |            / CAST(n - 1 AS DOUBLE)) THEN 'c'
        |      ELSE 'd' END AS s
        |  FROM daily CROSS JOIN tot),
        |w AS (
        |  SELECT s || lead(s, 1) OVER (ORDER BY d)
        |           || lead(s, 2) OVER (ORDER BY d) AS word
        |  FROM sym)
        |SELECT word, CAST(count(*) AS BIGINT) AS cnt
        |FROM w WHERE word IS NOT NULL
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 10""".stripMargin,
    // same per-type daily frame and partitioned lag diffs, same exact
    // DECIMAL moments, same single n·Σdiff²/(n·Σy²−Sy²) division and
    // raw-dag 1.5/2.5 flags
    "q252_durbin_watson" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events GROUP BY 1, 2),
        |lg AS (
        |  SELECT event_type, sv,
        |    lag(sv, 1) OVER (PARTITION BY event_type ORDER BY d) AS prev
        |  FROM daily),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(sv AS HUGEINT)) AS sy,
        |    sum(CAST(sv * sv AS HUGEINT)) AS syy,
        |    sum(CASE WHEN prev IS NOT NULL
        |        THEN CAST((sv - prev) * (sv - prev) AS HUGEINT)
        |        ELSE CAST(0 AS HUGEINT) END) AS sdd
        |  FROM lg GROUP BY 1),
        |q AS (
        |  SELECT *, CAST(CAST(n AS HUGEINT) * sdd AS DOUBLE)
        |    / nullif(CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE), 0.0)
        |    AS dw_raw
        |  FROM m)
        |SELECT event_type, n AS n_days,
        |  round(dw_raw, 4) + 0.0 AS dw,
        |  CASE WHEN dw_raw < 1.5 THEN 'positive'
        |       WHEN dw_raw > 2.5 THEN 'negative'
        |       ELSE 'none' END AS autocorr_flag
        |FROM q ORDER BY event_type""".stripMargin,
    // same three daily centi frames joined on date, nine HUGEINT
    // moments cast once, same guarded Pearson + partial dag
    "q219_partial_correlation" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events WHERE event_type IN ('click', 'purchase', 'view')
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT x.sv AS x, y.sv AS y, z.sv AS z
        |  FROM (SELECT d, sv FROM daily WHERE event_type = 'click') x
        |  JOIN (SELECT d, sv FROM daily WHERE event_type = 'purchase') y USING (d)
        |  JOIN (SELECT d, sv FROM daily WHERE event_type = 'view') z USING (d)),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(*) AS DOUBLE) AS nd,
        |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(z AS HUGEINT)) AS DOUBLE) AS sz,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(z AS HUGEINT) * z) AS DOUBLE) AS szz,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(x AS HUGEINT) * z) AS DOUBLE) AS sxz,
        |    CAST(sum(CAST(y AS HUGEINT) * z) AS DOUBLE) AS syz
        |  FROM j),
        |r AS (
        |  SELECT n,
        |    (nd * sxy - sx * sy)
        |      / nullif(sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 0.0) AS rxy,
        |    (nd * sxz - sx * sz)
        |      / nullif(sqrt((nd * sxx - sx * sx) * (nd * szz - sz * sz)), 0.0) AS rxz,
        |    (nd * syz - sz * sy)
        |      / nullif(sqrt((nd * szz - sz * sz) * (nd * syy - sy * sy)), 0.0) AS rzy
        |  FROM m)
        |SELECT n AS n_days,
        |  round(rxy, 6) + 0.0 AS r_click_purchase,
        |  round(rxz, 6) + 0.0 AS r_click_view,
        |  round(rzy, 6) + 0.0 AS r_view_purchase,
        |  round((rxy - rxz * rzy)
        |        / nullif(sqrt((1.0 - rxz * rxz) * (1.0 - rzy * rzy)), 0.0), 6)
        |    + 0.0 AS partial_r
        |FROM r""".stripMargin,
    // same daily frame, same d−7 self-join, same 1e-9-grid sMAPE terms
    // and exact-integer MASE cross-product
    "q211_forecast_backtest" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |maxd AS (SELECT max(d) AS maxd FROM daily),
        |wf AS (
        |  SELECT a.event_type, a.d, a.y, b.y AS f
        |  FROM daily a JOIN daily b
        |    ON b.event_type = a.event_type AND b.d = a.d - 7),
        |ev AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
        |    CAST(sum(abs(y - f)) AS BIGINT) AS serr,
        |    CAST(sum(coalesce(
        |      CAST(floor(2.0e9 * CAST(abs(y - f) AS DOUBLE)
        |                 / nullif(CAST(y + f AS DOUBLE), 0.0)) AS BIGINT),
        |      0)) AS BIGINT) AS ssm9
        |  FROM wf, maxd WHERE date_diff('day', d, maxd) < 14
        |  GROUP BY 1),
        |ins AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_in,
        |    CAST(sum(abs(y - prev)) AS BIGINT) AS sdelta
        |  FROM (SELECT event_type, y,
        |          lag(y) OVER (PARTITION BY event_type ORDER BY d) AS prev
        |        FROM daily, maxd
        |        WHERE date_diff('day', d, maxd) >= 14)
        |  WHERE prev IS NOT NULL GROUP BY 1)
        |SELECT ev.event_type, n_eval,
        |  round(CAST(ssm9 AS DOUBLE) / CAST(n_eval * 1000000000 AS DOUBLE)
        |        * 100.0, 6) + 0.0 AS smape_pct,
        |  round(CAST(serr * n_in AS DOUBLE)
        |        / nullif(CAST(sdelta * n_eval AS DOUBLE), 0.0), 6) + 0.0
        |    AS mase
        |FROM ev JOIN ins USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // same two daily centi frames, calendar-date lag join, HUGEINT
    // moments, same Pearson dag
    "q183_cross_correlation" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1, 2),
        |lags AS (SELECT unnest([0, 1, 2, 3]) AS lag),
        |x AS (SELECT d, sv AS xv FROM daily WHERE event_type = 'click'),
        |y AS (SELECT d AS dy, sv AS yv FROM daily WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT l.lag, x.xv, y.yv
        |  FROM x CROSS JOIN lags l JOIN y ON x.d + l.lag = y.dy),
        |m AS (
        |  SELECT lag, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(xv) AS DOUBLE) AS sx, CAST(sum(yv) AS DOUBLE) AS sy,
        |    CAST(sum(xv * xv) AS DOUBLE) AS sxx,
        |    CAST(sum(xv * yv) AS DOUBLE) AS sxy,
        |    CAST(sum(yv * yv) AS DOUBLE) AS syy
        |  FROM p GROUP BY 1)
        |SELECT lag, CAST(n AS BIGINT) AS n_pairs,
        |  round((n * sxy - sx * sy) /
        |    nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0.0), 6) + 0.0
        |    AS xcorr
        |FROM m ORDER BY lag""".stripMargin,
    // same daily centi frame, lag() with LITERAL offsets unioned per
    // lag (an independent spelling of the row pairing), same HUGEINT
    // moments and Pearson dag
    "q173_autocorrelation" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sv
         |  FROM events GROUP BY 1, 2),
         |lagged AS (
         |${AcfLags
          .map(l =>
            s"""  SELECT event_type, $l AS lag, sv,
               |    lag(sv, $l) OVER (PARTITION BY event_type ORDER BY d) AS prev
               |  FROM daily""".stripMargin
          )
          .mkString("\n  UNION ALL\n")}),
         |p AS (SELECT * FROM lagged WHERE prev IS NOT NULL),
         |m AS (
         |  SELECT event_type, lag,
         |    CAST(count(*) AS DOUBLE) AS n,
         |    CAST(sum(CAST(sv AS HUGEINT)) AS DOUBLE) AS sx,
         |    CAST(sum(CAST(prev AS HUGEINT)) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(sv AS HUGEINT) * CAST(sv AS HUGEINT)) AS DOUBLE) AS sxx,
         |    CAST(sum(CAST(sv AS HUGEINT) * CAST(prev AS HUGEINT)) AS DOUBLE) AS sxy,
         |    CAST(sum(CAST(prev AS HUGEINT) * CAST(prev AS HUGEINT)) AS DOUBLE) AS syy
         |  FROM p GROUP BY 1, 2)
         |SELECT event_type, CAST(lag AS INT) AS lag,
         |  CAST(n AS BIGINT) AS n_pairs,
         |  round((n * sxy - sx * sy)
         |        / nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
         |                 0.0), 6) + 0.0 AS acf
         |FROM m ORDER BY event_type, lag""".stripMargin,
    "q155_rolling_median" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, d, sv,
        |  CAST(count(*) OVER w AS BIGINT) AS n_in_win,
        |  round(quantile_cont(sv, 0.5) OVER w / 100.0, 4) + 0.0 AS roll_med_7obs
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY d
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, d""".stripMargin,
    "q119_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100.0, 0) AS BIGINT) AS vc
        |  FROM events),
        |d AS (
        |  SELECT user_id, vc,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dur
        |  FROM e)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(dur) AS BIGINT) AS total_dur_us,
        |  round(CAST(sum(vc * dur) AS DOUBLE)
        |        / nullif(CAST(sum(dur) AS DOUBLE) * 100.0, 0.0), 6) AS twap
        |FROM d WHERE dur IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // open/close via first/last row_number rows — a structurally
    // different algorithm from Spark's min_by/max_by struct aggregate
    "q119b_ohlc_vwap" ->
      """WITH e AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, event_id,
        |         epoch_us(ts) AS us,
        |         CAST(round(value * 100.0, 0) AS BIGINT) AS vc,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS vol
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, day
        |                       ORDER BY us, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, day
        |                       ORDER BY us DESC, event_id DESC) AS rn_d
        |  FROM e),
        |agg AS (
        |  SELECT event_type, day,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(max(CASE WHEN rn_a = 1 THEN vc END) AS BIGINT) AS o_c,
        |    CAST(max(vc) AS BIGINT) AS h_c,
        |    CAST(min(vc) AS BIGINT) AS l_c,
        |    CAST(max(CASE WHEN rn_d = 1 THEN vc END) AS BIGINT) AS c_c,
        |    CAST(sum(vol) AS BIGINT) AS volume,
        |    CAST(sum(vc * vol) AS BIGINT) AS spv
        |  FROM r GROUP BY 1, 2)
        |SELECT event_type, day, n_events,
        |  CAST(o_c AS DOUBLE) / 100.0 AS open,
        |  CAST(h_c AS DOUBLE) / 100.0 AS high,
        |  CAST(l_c AS DOUBLE) / 100.0 AS low,
        |  CAST(c_c AS DOUBLE) / 100.0 AS close,
        |  volume,
        |  round(CAST(spv AS DOUBLE)
        |        / nullif(CAST(volume AS DOUBLE) * 100.0, 0.0), 6) AS vwap
        |FROM agg ORDER BY event_type, day""".stripMargin
  )
}
