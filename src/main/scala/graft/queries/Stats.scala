package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
      // Cast the margins to double BEFORE the multiply: row_n·col_n is a
      // long·long product that can wrap at ~1e12-row margins (100 TB
      // territory) in non-ANSI Spark while DuckDB promotes to HUGEINT —
      // cross-engine divergence exactly at scale. Double first on both
      // engines keeps the arithmetic identical (and exact: counts here
      // stay below 2^53).
      .withColumn(
        "expected",
        col("row_n").cast("double") * col("col_n").cast("double") / col("n").cast("double")
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
    // Every division below runs on explicit doubles (cast once, here) and
    // the emitted counts are explicit BIGINTs. Rationale: DuckDB types
    // sum(int) as HUGEINT and its `/` result typing has shifted across
    // versions — the only way the driver-side oracle hashes bit-identically
    // regardless of its DuckDB build is to pin every operand type in BOTH
    // spellings. The z statistic is additionally gridded round(·,6) →
    // round(·,4) (the q81 convention) so no ulp of engine drift can flip
    // the 4th decimal.
    val g = users
      .groupBy("variant")
      .agg(count(lit(1)).as("n"), sum("conv").cast("long").as("k"))
    val a = g.filter(col("variant") === "A").select(col("n").as("na"), col("k").as("ka"))
    val b = g.filter(col("variant") === "B").select(col("n").as("nb"), col("k").as("kb"))
    a.crossJoin(b) // two 1-row frames
      .withColumn("pa", col("ka").cast("double") / col("na").cast("double"))
      .withColumn("pb", col("kb").cast("double") / col("nb").cast("double"))
      .withColumn(
        "pp",
        (col("ka") + col("kb")).cast("double") / (col("na") + col("nb")).cast("double")
      )
      .select(
        col("na"),
        col("ka"),
        (round(col("pa"), 6) + 0.0).as("rate_a"),
        col("nb"),
        col("kb"),
        (round(col("pb"), 6) + 0.0).as("rate_b"),
        (round(
          round(
            (col("pa") - col("pb")) /
              sqrt(col("pp") * (lit(1.0d) - col("pp"))
                * (lit(1.0d) / col("na").cast("double")
                  + lit(1.0d) / col("nb").cast("double"))),
            6
          ),
          4
        ) + 0.0).as("z_stat")
      )
  }

  /** q120: closed-form two-regressor OLS — the "linear probe" fit a
    * pipeline runs to weight quality signals (here: predict line price
    * from quantity and discount): y = β0 + β1·x1 + β2·x2 solved from
    * the normal equations with the 2×2 centered-moment inverse, plus
    * R². The distributed part is ONE hash aggregate of exact
    * integer-scaled moments (centi/1e-4-snapped inputs, DECIMAL(38)
    * sums — Σy² overflows BIGINT at sf0.1 already); the solve is a
    * closed-form chain on the nine aggregate values, spelled
    * textually-identically on both engines (pure IEEE arithmetic on
    * identical operands — deterministic without any mid-grid), with
    * one round-6 grid on the emitted coefficients and nullif guards on
    * the two degenerate denominators (collinear regressors, constant
    * y).
    *
    * Scale shape: map-side partial aggregation does all the work; the
    * driver-visible frame is one row. This is the moment-sketch
    * pattern every distributed ML system uses for linear models — at
    * 100 TB nothing changes but the partial-aggregate fan-in.
    */
  private def q120(s: SparkSession, dir: String): DataFrame = {
    val m = graft.queries.Tables
      .table(s, dir, "lineitem")
      .select(
        round(col("l_quantity") * 100.0, 0).cast("long").as("x1c"),
        round(col("l_discount") * 10000.0, 0).cast("long").as("x2m"),
        round(col("l_extendedprice") * 100.0, 0).cast("long").as("yc")
      )
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x1c").cast("decimal(38,0)")).cast("double").as("rs1"),
        sum(col("x2m").cast("decimal(38,0)")).cast("double").as("rs2"),
        sum(col("yc").cast("decimal(38,0)")).cast("double").as("rsy"),
        sum((col("x1c") * col("x1c")).cast("decimal(38,0)")).cast("double").as("rs11"),
        sum((col("x1c") * col("x2m")).cast("decimal(38,0)")).cast("double").as("rs12"),
        sum((col("x2m") * col("x2m")).cast("decimal(38,0)")).cast("double").as("rs22"),
        sum((col("x1c") * col("yc")).cast("decimal(38,0)")).cast("double").as("rs1y"),
        sum((col("x2m") * col("yc")).cast("decimal(38,0)")).cast("double").as("rs2y"),
        sum((col("yc") * col("yc")).cast("decimal(38,0)")).cast("double").as("rsyy")
      )
      // unscale the exact integer moments into variable units — each is
      // ONE correctly-rounded IEEE division of identical operands
      .withColumn("s1", col("rs1") / 1.0e2)
      .withColumn("s2", col("rs2") / 1.0e4)
      .withColumn("sy", col("rsy") / 1.0e2)
      .withColumn("s11", col("rs11") / 1.0e4)
      .withColumn("s12", col("rs12") / 1.0e6)
      .withColumn("s22", col("rs22") / 1.0e8)
      .withColumn("s1y", col("rs1y") / 1.0e4)
      .withColumn("s2y", col("rs2y") / 1.0e6)
      .withColumn("syy", col("rsyy") / 1.0e4)
      .withColumn("c11", col("s11") - col("s1") * col("s1") / col("n"))
      .withColumn("c12", col("s12") - col("s1") * col("s2") / col("n"))
      .withColumn("c22", col("s22") - col("s2") * col("s2") / col("n"))
      .withColumn("c1y", col("s1y") - col("s1") * col("sy") / col("n"))
      .withColumn("c2y", col("s2y") - col("s2") * col("sy") / col("n"))
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("n"))
      .withColumn(
        "det",
        col("c11") * col("c22") - col("c12") * col("c12")
      )
      .withColumn(
        "b1",
        (col("c1y") * col("c22") - col("c2y") * col("c12"))
          / nullif(col("det"), lit(0.0))
      )
      .withColumn(
        "b2",
        (col("c2y") * col("c11") - col("c1y") * col("c12"))
          / nullif(col("det"), lit(0.0))
      )
      .withColumn(
        "b0",
        (col("sy") - col("b1") * col("s1") - col("b2") * col("s2")) / col("n")
      )
      .withColumn(
        "r2",
        (col("b1") * col("c1y") + col("b2") * col("c2y"))
          / nullif(col("cyy"), lit(0.0))
      )
    m.select(
      col("n").cast("long").as("n_rows"),
      (round(col("b0"), 6) + 0.0).as("beta0"),
      (round(col("b1"), 6) + 0.0).as("beta1"),
      (round(col("b2"), 6) + 0.0).as("beta2"),
      (round(col("r2"), 6) + 0.0).as("r2")
    )
  }

  /** q145: exact two-sample Kolmogorov–Smirnov statistic — the
    * distribution-drift test a pipeline runs when it compares a new data
    * snapshot's value distribution against the serving one (here: event
    * values in the q87 A arm vs the B arm). The D statistic is kept
    * EXACT: with values snapped to centi ints, D = max_v |F_A(v)−F_B(v)|
    * = max_v |ca_le(v)·nb − cb_le(v)·na| / (na·nb), and the max runs over
    * the integer numerator — no float comparison decides anything. The
    * argmax value reports WHERE the distributions diverge most (ties →
    * smallest value, via a max-struct with the negated value).
    *
    * Scale shape: one corpus hash aggregate → per-distinct-centivalue
    * counts; the at-or-below cumulation is the q111/q46b TWO-LEVEL
    * pattern (global window only over ≤ range/256 shard subtotals, a
    * partitioned window within shards) — never a single-task scan of
    * the distinct-value frame. Output is one row.
    */
  private def q145(s: SparkSession, dir: String): DataFrame = {
    val perVal = Tables
      .table(s, dir, "events")
      .select(
        round(col("value") * 100.0, 0).cast("long").as("vc"),
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, 1L)
          .otherwise(0L)
          .as("a")
      )
      .groupBy("vc")
      .agg(sum("a").as("ca"), (count(lit(1)) - sum("a")).as("cb"))
      // floor-shard on any sign (the q111 convention; vc ≥ 0 here but the
      // spelling stays uniform across the cumulation family)
      .withColumn("shard", expr("(vc - pmod(vc, 256)) div 256"))
    val offsets = perVal
      .groupBy("shard")
      .agg(sum("ca").as("sa"), sum("cb").as("sb"))
      .withColumn(
        "off_a",
        coalesce(
          sum("sa").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .withColumn(
        "off_b",
        coalesce(
          sum("sb").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("shard", "off_a", "off_b")
    // at-or-below ⇒ INCLUSIVE local frame (KS compares CDFs, not strict
    // ranks — the one frame-bound difference vs q111's neg_below)
    val local = Window
      .partitionBy("shard")
      .orderBy("vc")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = perVal
      .join(broadcast(offsets), "shard")
      .withColumn("ca_le", col("off_a") + sum("ca").over(local))
      .withColumn("cb_le", col("off_b") + sum("cb").over(local))
    val tot = cum.agg(sum("ca").as("na"), sum("cb").as("nb"))
    cum
      .crossJoin(broadcast(tot)) // 1-row totals frame
      .agg(
        max("na").as("na"),
        max("nb").as("nb"),
        max(
          struct(
            abs(col("ca_le") * col("nb") - col("cb_le") * col("na")).as("d"),
            (-col("vc")).as("nvc")
          )
        ).as("m")
      )
      .select(
        col("na"),
        col("nb"),
        col("m.d").as("ks_num"),
        (round(
          col("m.d").cast("double")
            / (col("na").cast("double") * col("nb").cast("double")),
          6
        ) + 0.0).as("ks_d"),
        (-col("m.nvc")).as("ks_at_centi")
      )
  }

  /** q146: one-way ANOVA decomposition — "does mean quantity differ by
    * return flag". Emits PER-GROUP rows (the q86 χ² convention: every
    * float is a closed-form function of exact integers computed
    * row-locally, so no engine ever float-SUMs in nondeterministic
    * order; the analyst sums the rounded partials for F):
    * n_g, group mean, the group's between-group contribution
    * n_g·(m_g−m)², and its within-group contribution ss_g − s_g²/n_g.
    * Inputs snap to centi ints; per-group sums ride DECIMAL(38) (Σy²
    * outgrows BIGINT at scale — the q120 lesson) and cast to double
    * once; grand totals broadcast back onto the ≤|flags| group frame.
    *
    * Scale shape: ONE corpus hash aggregate (map-side partials do all
    * the work); everything after runs on a 3-row frame.
    */
  private def q146(s: SparkSession, dir: String): DataFrame = {
    val g = Tables
      .table(s, dir, "lineitem")
      .select(
        col("l_returnflag").as("flag"),
        round(col("l_quantity") * 100.0, 0).cast("long").as("qc")
      )
      .groupBy("flag")
      .agg(
        count(lit(1)).as("n_g"),
        sum(col("qc").cast("decimal(38,0)")).cast("double").as("s_g"),
        sum((col("qc") * col("qc")).cast("decimal(38,0)"))
          .cast("double")
          .as("ss_g")
      )
    val tot = g.agg(
      sum("n_g").as("n"),
      sum("s_g").as("s"),
      count(lit(1)).as("k")
    )
    g.crossJoin(broadcast(tot)) // |flags|-row frame × 1-row totals
      .withColumn("m_g", col("s_g") / col("n_g").cast("double") / 100.0)
      .withColumn("m", col("s") / col("n").cast("double") / 100.0)
      .select(
        col("flag"),
        col("n_g"),
        col("k").as("k_groups"),
        col("n").as("n_rows"),
        (round(col("m_g"), 6) + 0.0).as("mean_g"),
        (round(
          col("n_g").cast("double")
            * (col("m_g") - col("m")) * (col("m_g") - col("m")),
          4
        ) + 0.0).as("ssb_part"),
        (round(
          (col("ss_g")
            - col("s_g") * col("s_g") / col("n_g").cast("double")) / 10000.0,
          4
        ) + 0.0).as("ssw_part")
      )
      .orderBy("flag")
  }

  /** q150: Mann-Whitney U rank-sum test — the nonparametric companion
    * to q87 (two-proportion z) and q145 (KS): "is one arm's value
    * distribution stochastically larger", robust to the heavy right
    * tail that breaks mean-based tests on revenue-like columns. Same
    * q145 arms (bucket100(user_id) split on centi-snapped event
    * values).
    *
    * Exactness contract: U is NEVER computed from float midranks —
    * with per-distinct-value arm counts ca/cb and the STRICT-below
    * B-cumulation cb_lt, 2·U_A = Σ_v ca·(2·cb_lt + cb) stays in exact
    * integer arithmetic (the ½-tie term is absorbed by the doubling),
    * and the tie-corrected variance consumes Σ(t³−t) and N³−N as exact
    * DECIMAL(38) integers cast to double ONCE. The oracle spells the
    * INDEPENDENT rank-sum identity (2·U_A = 2·R_A − na·(na+1) via
    * midrank posting 2·R_A = Σ ca·(2·lt_all + t + 1)), so an error in
    * either derivation cannot self-confirm. z rides the q87 round-6 →
    * round-4 grid; the rank-biserial effect size 2U/(na·nb) − 1 is a
    * division of exact integers, gridded round-6.
    *
    * Scale shape: one corpus hash aggregate → per-distinct-centivalue
    * counts; the strict-below cumulation is the q111/q145 TWO-LEVEL
    * shard pattern (global window only over ≤ range/256 shard
    * subtotals, partitioned window within shards); one-row output.
    * Per-value products fit LONG while both arms are < 2^31 rows
    * (value range is corpus-bounded, not row-bounded); the DECIMAL(38)
    * sums remove the aggregate-side overflow (the q146 lesson).
    */
  private def q150(s: SparkSession, dir: String): DataFrame = {
    val perVal = Tables
      .table(s, dir, "events")
      .select(
        round(col("value") * 100.0, 0).cast("long").as("vc"),
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, 1L)
          .otherwise(0L)
          .as("a")
      )
      .groupBy("vc")
      .agg(sum("a").as("ca"), (count(lit(1)) - sum("a")).as("cb"))
      .withColumn("t", col("ca") + col("cb"))
      .withColumn("shard", expr("(vc - pmod(vc, 256)) div 256"))
    val offsets = perVal
      .groupBy("shard")
      .agg(sum("cb").as("sb"))
      .withColumn(
        "off_b",
        coalesce(
          sum("sb").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("shard", "off_b")
    // STRICT-below local frame (ranks, not CDFs — the one frame-bound
    // difference vs q145's inclusive at-or-below)
    val localEx = Window
      .partitionBy("shard")
      .orderBy("vc")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = perVal
      .join(broadcast(offsets), "shard")
      .withColumn(
        "cb_lt",
        col("off_b") + coalesce(sum("cb").over(localEx), lit(0L))
      )
    cum
      .agg(
        sum("ca").as("na"),
        sum("cb").as("nb"),
        sum((col("ca") * (col("cb_lt") * 2 + col("cb"))).cast("decimal(38,0)"))
          .as("u2a_dec"),
        sum(
          (col("t").cast("decimal(12,0)") * col("t") * col("t") - col("t"))
            .cast("decimal(38,0)")
        ).as("t3t_dec")
      )
      .withColumn("n", col("na") + col("nb"))
      .withColumn(
        "corr_dec",
        (col("n").cast("decimal(12,0)") * col("n") * col("n") - col("n"))
          .cast("decimal(38,0)") - col("t3t_dec")
      )
      .select(
        col("na"),
        col("nb"),
        col("u2a_dec").cast("long").as("u2_a"),
        (round(
          col("u2a_dec").cast("double")
            / (col("na").cast("double") * col("nb").cast("double")) - 1.0,
          6
        ) + 0.0).as("rank_biserial"),
        (round(
          round(
            (col("u2a_dec").cast("double")
              - col("na").cast("double") * col("nb").cast("double"))
              / (lit(2.0d) * sqrt(
                (col("na").cast("double") * col("nb").cast("double")
                  * col("corr_dec").cast("double"))
                  / (lit(12.0d) * col("n").cast("double")
                    * (col("n").cast("double") - 1.0))
              )),
            6
          ),
          4
        ) + 0.0).as("z_stat")
      )
  }

  /** Poisson(1) CDF cut-points on the integer 10⁶ grid — the
    * multiplicity lookup both engines spell identically, so replica
    * membership is decided by INTEGER comparisons on the md5-derived
    * uniform (never a float).
    */
  private val PoissonCdf1e6: Seq[Int] =
    Seq(367879, 735758, 919698, 981011, 996340, 999405)

  /** q152: percentile-bootstrap confidence interval for the mean event
    * value via the DETERMINISTIC Poisson bootstrap — the way you
    * bootstrap 100 TB: classical resampling draws n indices per
    * replica (a corpus-sized shuffle × B), while Poisson(1)
    * multiplicities are independent per (row, replica), so all B = 32
    * replicas ride ONE map pass (explode ×B) into one 32-group
    * aggregate — no resample materialization, no shuffle beyond the
    * 32-row rollup. Multiplicity = inverse-CDF lookup of an md5-derived
    * uniform on the integer 10⁶ grid (the q43 split-hash convention) —
    * since r13 each md5 seeds THREE replicas from its three 40-bit hex
    * slices (11 hashes per row, not 32; see the body comment on the
    * ≤ 10⁻⁶ residue bias) — so every replica is bit-reproducible on
    * both engines and across reruns — a rerun-stable CI, which
    * "random" bootstraps never give.
    * CI bounds are ORDER STATISTICS of the 32 replica means (2nd and
    * 31st — the [2/32, 31/32] ≈ [6.25%, 96.875%] percentile pair,
    * ~91% nominal coverage), never interpolated;
    * replica means divide exact integer sums, and ties rank by
    * replica id.
    */
  private def q152(s: SparkSession, dir: String): DataFrame = {
    // hash-spread (r16): the 11-md5s-per-row replica expansion below is
    // fused into the single-task scan stage otherwise — one explicit
    // exchange of the 2-column frame puts the hash work on every core
    // (measured 4.6 s → 1.0 s at sf0.1; see Tables.spread).
    val base = Tables.spread(
      Tables
        .table(s, dir, "events")
        .select(
          col("event_id"),
          round(col("value") * 100.0, 0).cast("long").as("vc")
        ),
      "event_id"
    )
    // One md5 seeds THREE replicas: the 32-hex digest splits into three
    // 10-hex (40-bit) slices, each reduced mod 10⁶ — the residue bias of
    // a 2^40 → 10⁶ reduction is ≤ 10⁶/2^40 ≈ 10⁻⁶ relative (every
    // residue has ⌊2^40/10⁶⌋ or ⌈…⌉ preimages), negligible and
    // deterministic. 11 hashes per row instead of 32: measured the
    // bench's slowest honest gate down from ~6.3 s (hash-bound).
    val m = {
      val u = col("u")
      // fold REVERSED so the smallest cut lands outermost: the chain
      // must test u < 367879 → 0 before u < 735758 → 1, etc.
      PoissonCdf1e6.zipWithIndex.reverse.foldLeft(lit(6)) {
        case (acc, (cut, k)) => when(u < cut, lit(k)).otherwise(acc)
      }
    }
    val perReplica = base
      .select(col("event_id"), col("vc"), explode(expr("sequence(0, 10)")).as("hj"))
      .withColumn(
        "hex",
        md5(
          concat(
            col("event_id").cast("string"),
            lit(":"),
            col("hj").cast("string")
          ).cast("binary")
        )
      )
      .select(
        col("vc"),
        explode(
          expr(
            "filter(transform(sequence(0, 2), s -> struct(" +
              "hj * 3 + s AS b, " +
              "CAST(conv(substring(hex, 1 + 10 * s, 10), 16, 10) AS BIGINT)" +
              " % 1000000 AS u)), p -> p.b <= 31)"
          )
        ).as("p")
      )
      .select(col("p.b").as("b"), col("vc"), col("p.u").as("u"))
      .select(col("b"), (m.cast("long") * col("vc")).as("mv"), m.cast("long").as("mm"))
      .groupBy("b")
      .agg(
        sum("mv").as("sum_mv"),
        sum("mm").as("sum_m")
      )
      .select(
        col("b"),
        (col("sum_mv").cast("double") / col("sum_m").cast("double") / 100.0)
          .as("mean_b")
      )
    val ranked = perReplica.withColumn(
      "rk",
      row_number().over(Window.orderBy(col("mean_b"), col("b")))
    )
    val tot = Tables
      .table(s, dir, "events")
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100.0, 0).cast("long")).as("sv")
      )
    tot
      .crossJoin(
        broadcast(
          ranked.filter(col("rk") === 2).select(col("mean_b").as("lo"))
        )
      )
      .crossJoin(
        broadcast(
          ranked.filter(col("rk") === 31).select(col("mean_b").as("hi"))
        )
      )
      .select(
        col("n"),
        (round(col("sv").cast("double") / col("n").cast("double") / 100.0, 6)
          + 0.0).as("mean_value"),
        (round(col("lo"), 6) + 0.0).as("ci_lo"),
        (round(col("hi"), 6) + 0.0).as("ci_hi")
      )
  }

  /** q153: exact WEIGHTED quantiles (p25/p50/p75 of l_extendedprice
    * weighted by l_quantity, per return flag) — the estimator a
    * token-weighted corpus percentile needs (a doc's length weights its
    * contribution; unweighted quantiles over doc rows answer a
    * different question). Neither engine has a weighted-quantile
    * builtin, so both spell the DEFINITION: the p-quantile is the
    * smallest value whose cumulative weight reaches p·W — pure integer
    * arithmetic (4·cum ≥ k·W for k = 1,2,3), no interpolation, so the
    * gate is bit-exact cross-engine.
    *
    * Scale shape: ONE hash aggregate to the per-(flag, centivalue)
    * weight frame (domain-bounded: ≤ price-range/1 cent rows, never
    * corpus rows), then the q46b/q111 two-level shard cumulation —
    * per-(flag, shard) totals, a flag-partitioned window over ≤
    * range/65536 shard rows for offsets, a (flag, shard)-partitioned
    * local window (≤ 65536 values per task) — and a 3-row conditional-
    * min aggregate. No corpus-sized window, no sort of the corpus.
    * Weight sums stay far under 2^63/4 here; at 100 TB the cum column
    * is the q146 DECIMAL(38) swap-in.
    */
  private def q153(s: SparkSession, dir: String): DataFrame = {
    val pv = Tables
      .table(s, dir, "lineitem")
      .select(
        col("l_returnflag").as("f"),
        round(col("l_extendedprice") * 100.0, 0).cast("long").as("vc"),
        round(col("l_quantity"), 0).cast("long").as("w")
      )
      .groupBy("f", "vc")
      .agg(sum("w").as("w"))
      .withColumn("shard", expr("vc div 65536"))
    val offsets = pv
      .groupBy("f", "shard")
      .agg(sum("w").as("shard_w"))
      .withColumn(
        "shard_offset",
        coalesce(
          sum("shard_w").over(
            Window
              .partitionBy("f")
              .orderBy("shard")
              .rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("f", "shard", "shard_offset")
    val local = Window
      .partitionBy("f", "shard")
      .orderBy("vc")
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = pv.groupBy("f").agg(sum("w").as("tot"))
    pv.join(broadcast(offsets), Seq("f", "shard"))
      .withColumn("cum_le", col("shard_offset") + sum("w").over(local))
      .join(broadcast(totals), "f")
      .groupBy(col("f").as("l_returnflag"))
      .agg(
        max(col("tot")).as("w_total"),
        min(when(col("cum_le") * 4 >= col("tot"), col("vc"))).as("wp25_centi"),
        min(when(col("cum_le") * 4 >= col("tot") * 2, col("vc"))).as("wp50_centi"),
        min(when(col("cum_le") * 4 >= col("tot") * 3, col("vc"))).as("wp75_centi")
      )
      .orderBy("l_returnflag")
  }

  /** q156: CUSUM change-point detection over the daily event-value
    * series — "did the mean shift, and on which day" (the monitoring
    * primitive a pipeline runs on ingest volume / quality-score drift
    * before retraining on a contaminated window). Per-day deviation is
    * kept EXACT by cross-multiplying instead of dividing: dev_d =
    * s_d·N − n_d·SV (the day's sum against the global mean, scaled by
    * N), so the cumulative statistic is an integer and the peak argmax
    * is decided by integer comparison — no float accumulation order
    * anywhere. Emitted per day: exact counts/sums, the N-scaled CUSUM
    * re-expressed in dollars (one exact-integer→double division, then
    * the round grid), and the peak flag (max |CUSUM|, earliest-day
    * tie-break).
    *
    * Scale shape: ONE corpus hash aggregate to the day frame; every
    * window/join after it runs over #days rows (calendar-bounded — 30
    * here, ≤ a few thousand at any corpus age). The day-ordered window
    * is unpartitioned but bounded by construction (allowlisted in
    * GlobalWindowAuditSpec). dev products stay under 2^63 through
    * sf0.1 ~1e9-row territory; the DECIMAL(38) swap-in is documented
    * for beyond (the q146 convention).
    *
    * The emitted CUSUM stays the exact N·centi-scaled INTEGER — an
    * sf0.001 probe caught round(cusum/(N·100), 4) landing one ulp on
    * opposite sides of a .00005 boundary across engines (Spark rounds
    * through exact BigDecimal, DuckDB through float scaling), so the
    * gate exposes no post-division rounding at all; the analyst divides
    * by N·100 for a dollar display.
    */
  private def q156(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .table(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100.0, 0).cast("long")).as("sv_centi")
      )
    val tot = daily.agg(
      sum("n_events").as("nn"),
      sum("sv_centi").as("svv")
    )
    val cum = daily
      .crossJoin(broadcast(tot)) // 1 row
      .withColumn("dev", col("sv_centi") * col("nn") - col("n_events") * col("svv"))
      .withColumn(
        "cusum",
        sum("dev").over(
          Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
        )
      )
    val peak = cum
      .agg(max(abs(col("cusum"))).as("peak_abs"))
    val peakDay = cum
      .crossJoin(broadcast(peak))
      .filter(abs(col("cusum")) === col("peak_abs"))
      .agg(min("d").as("peak_d"))
    cum
      .crossJoin(broadcast(peakDay)) // 1 row
      .select(
        col("d"),
        col("n_events"),
        col("sv_centi"),
        col("cusum").as("cusum_num"),
        (col("d") === col("peak_d")).as("is_peak")
      )
      .orderBy("d")
  }

  /** q158: split-conformal prediction intervals per event type — the
    * distribution-free uncertainty wrapper an eval pipeline puts around
    * ANY point predictor ("the interval that covers 90% of unseen
    * values, guaranteed, no normality assumption"). THREE-way q43-style
    * md5 split on event_id — train (<34) fits the group-mean predictor,
    * calibration (34–66) supplies residuals, test (≥67) audits — the
    * split-conformal contract: scores must be computed with a model
    * INDEPENDENT of the calibration rows (fitting the mean on the
    * calibration set itself biases its own residuals small; the first
    * cut of this query did exactly that and its spec caught realized
    * coverage at 0.80, 4.7σ below nominal). The conformal radius is the
    * ⌈0.9·(n_cal+1)⌉-th smallest absolute residual — an EXACT order
    * statistic selected WITHOUT sorting the corpus: residuals stay
    * integer by the common-denominator trick (|vc·n_tr − sv_tr| —
    * within one group every comparison shares the train-side scale),
    * counted per distinct value, rank threshold via the q153
    * cumulative-walk. Test-side coverage is an exact integer count
    * against the same integer radius; exchangeability says ≥ 90% in
    * expectation.
    *
    * Scale shape: one hash aggregate per split side, a per-(type,
    * residual) count frame (domain-bounded), the q153 two-level shard
    * cumulation for the rank selection, and a broadcast of the 5-row
    * radius table back onto the test side. No corpus sort, no window
    * over corpus rows. vc·n products fit BIGINT through ~10⁸ rows/group;
    * DECIMAL(38) is the documented swap-in (q146 convention).
    */
  private def q158(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .table(s, dir, "events")
      .select(
        col("event_type"),
        round(col("value") * 100.0, 0).cast("long").as("vc"),
        graft.llm.Sampling.bucket100(col("event_id")).as("b")
      )
    // train slice fits the predictor; its (n, sv) is the model
    val model = e
      .filter(col("b") < 34)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_tr"), sum("vc").as("sv"))
    // calibration residuals on the common denominator n_tr
    val resid = e
      .filter(col("b") >= 34 && col("b") < 67)
      .join(broadcast(model), "event_type")
      .select(
        col("event_type"),
        abs(col("vc") * col("n_tr") - col("sv")).as("r")
      )
      .groupBy("event_type", "r")
      .agg(count(lit(1)).as("c"))
      .withColumn("shard", expr("r div 1048576"))
    val offsets = resid
      .groupBy("event_type", "shard")
      .agg(sum("c").as("shard_c"))
      .withColumn(
        "shard_offset",
        coalesce(
          sum("shard_c").over(
            Window
              .partitionBy("event_type")
              .orderBy("shard")
              .rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("event_type", "shard", "shard_offset")
    val local = Window
      .partitionBy("event_type", "shard")
      .orderBy("r")
      .rowsBetween(Window.unboundedPreceding, 0)
    // k = ⌈0.9·(n+1)⌉ spelled in integers: (9·(n+1) + 9) div 10
    val ncal = resid.groupBy("event_type").agg(sum("c").as("n_cal"))
    val radius = resid
      .join(broadcast(offsets), Seq("event_type", "shard"))
      .withColumn("cum_le", col("shard_offset") + sum("c").over(local))
      .join(broadcast(ncal), "event_type")
      .groupBy("event_type")
      .agg(
        max("n_cal").as("n_cal"),
        min(
          when(
            col("cum_le") * 10 >= (col("n_cal") + 1) * 9,
            col("r")
          )
        ).as("qhat_num")
      )
      .join(broadcast(model), "event_type")
    e.filter(col("b") >= 67)
      .join(broadcast(radius), "event_type")
      .groupBy(
        col("event_type"),
        col("n_tr"),
        col("n_cal"),
        col("qhat_num")
      )
      .agg(
        count(lit(1)).as("n_test"),
        sum(
          when(
            abs(col("vc") * col("n_tr") - col("sv")) <= col("qhat_num"),
            1L
          ).otherwise(0L)
        ).as("n_covered")
      )
      .select(
        col("event_type"),
        col("n_tr"),
        col("n_cal"),
        col("n_test"),
        col("qhat_num"),
        // human-scale twins stay INTEGER (floored centi / basis points)
        // — the q156 lesson: a rounded exact-int quotient can land one
        // ulp on opposite sides of a grid midpoint across engines
        expr("qhat_num div n_tr").as("qhat_centi_floor"),
        col("n_covered"),
        expr("(n_covered * 10000) div n_test").as("coverage_bp")
      )
      .orderBy("event_type")
  }

  /** q161: winsorized mean per event type — the robust location
    * estimate a cleaning pipeline reports next to the raw mean (one
    * fat-finger row drags a mean arbitrarily; clamping at the p5/p95
    * order statistics bounds any single row's influence). Thresholds
    * are EXACT order statistics from the q153 cumulative-walk (smallest
    * value with 20·cum ≥ n, resp. ≥ 19·n — pure integer comparisons on
    * the per-(type, centivalue) count frame); the winsorized sum clamps
    * each value to [lo, hi] ON THE COUNT FRAME (Σ c·clamp(v) — never a
    * second corpus pass) and every emitted figure is integer: exact
    * clamped sum, n, and the mean in micro-dollar floor units
    * ((sum·100) div n on centi values — the q156/q158 grid-midpoint
    * lesson: no rounded float quotients in a gate). The integer
    * divisions ride on a NON-NEGATIVE domain (event values ≥ 0), where
    * Spark's truncating `div` and DuckDB's flooring `//` agree — a
    * signed metric would need floor spelled explicitly on both sides.
    *
    * Scale shape: ONE corpus hash aggregate to the domain-bounded count
    * frame; the cumulation windows are (type)-partitioned over ≤
    * range/256-row shard frames; thresholds broadcast back onto the
    * SAME count frame for the clamped sum — the corpus is touched
    * exactly once.
    */
  private def q161(s: SparkSession, dir: String): DataFrame = {
    val pv = Tables
      .table(s, dir, "events")
      .select(
        col("event_type"),
        round(col("value") * 100.0, 0).cast("long").as("vc")
      )
      .groupBy("event_type", "vc")
      .agg(count(lit(1)).as("c"))
      .withColumn("shard", expr("vc div 256"))
    val offsets = pv
      .groupBy("event_type", "shard")
      .agg(sum("c").as("shard_c"))
      .withColumn(
        "shard_offset",
        coalesce(
          sum("shard_c").over(
            Window
              .partitionBy("event_type")
              .orderBy("shard")
              .rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("event_type", "shard", "shard_offset")
    val local = Window
      .partitionBy("event_type", "shard")
      .orderBy("vc")
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = pv.groupBy("event_type").agg(sum("c").as("n"))
    val cut = pv
      .join(broadcast(offsets), Seq("event_type", "shard"))
      .withColumn("cum_le", col("shard_offset") + sum("c").over(local))
      .join(broadcast(totals), "event_type")
      .groupBy("event_type")
      .agg(
        max("n").as("n"),
        min(when(col("cum_le") * 20 >= col("n"), col("vc"))).as("lo"),
        min(when(col("cum_le") * 20 >= col("n") * 19, col("vc"))).as("hi")
      )
    pv.join(broadcast(cut), "event_type")
      .groupBy(col("event_type"), col("n"), col("lo"), col("hi"))
      .agg(
        sum(col("c") * greatest(least(col("vc"), col("hi")), col("lo")))
          .as("wsum_centi")
      )
      .select(
        col("event_type"),
        col("n"),
        col("lo").as("p5_centi"),
        col("hi").as("p95_centi"),
        col("wsum_centi"),
        expr("(wsum_centi * 10000) div (n * 100)").as("wmean_micro")
      )
      .orderBy("event_type")
  }

  /** q169: Spearman rank correlation (with the average-rank tie
    * convention) between two per-document metrics — char length and the
    * integer-gridded distinct-word ratio — next to the raw Pearson on
    * the same pair. The audit question it answers ("is doc quality
    * MONOTONICALLY related to length, outliers notwithstanding?") is
    * the rank-statistics staple Pearson can't: one 10⁶-char outlier doc
    * owns Pearson's covariance, while its rank contributes like any
    * other row.
    *
    * Determinism: ranks are EXACT integers on a ×2 grid (average rank
    * of a tie group = (2·cum_before + c + 1)/2 — doubled to stay
    * integral), every moment is an exact DECIMAL(38) sum, and ρ/r are
    * fixed IEEE dags on the moment scalars (the q120 discipline). The
    * ×2 rank scale cancels in ρ.
    *
    * Scale shape: one corpus scan to (doc_id, x, y); per-metric
    * VALUE-count frames (domain-bounded: distinct lengths, ≤ 101 ratio
    * grid points) get their cumulative offsets on frames that size —
    * never the corpus (the q33b per-length-aggregate convention; at an
    * unbounded domain the q46b shard cumulation is the swap-in); two
    * broadcast-sized rank-map joins back to the doc frame; one 1-row
    * moment aggregate.
    */
  private def q169(s: SparkSession, dir: String): DataFrame = {
    val d = graft.queries.Tables
      .table(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w0"))
      .select(
        col("doc_id"),
        expr("size(filter(w0, x -> x <> ''))").as("nw"),
        expr("size(array_distinct(filter(w0, x -> x <> '')))").as("ndw"),
        expr("aggregate(w0, 0, (a, x) -> a + length(x))").as("x")
      )
      .filter(col("nw") > 0)
      // y: distinct-word percentage on an integer grid (floor — exact);
      // LONG metrics so the row-level moment products below never
      // overflow before their DECIMAL(38) cast
      .select(
        col("doc_id"),
        col("x").cast("long").as("x"),
        expr("(100 * ndw) div nw").cast("long").as("y")
      )
    def rankMap(c: String): DataFrame = {
      val w = Window.orderBy(col(c))
      d.groupBy(c)
        .agg(count(lit(1)).as("cnt"))
        .select(
          col(c),
          // 2·(average rank) = 2·cumBefore + cnt + 1, exact integers
          (lit(2) * (coalesce(
            sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)
          )) + col("cnt") + lit(1)).as(s"r2$c")
        )
    }
    val ranked = d
      .join(broadcast(rankMap("x")), "x")
      .join(broadcast(rankMap("y")), "y")
    ranked
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("r2x").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(col("r2y").cast("decimal(38,0)")).cast("double").as("sy"),
        sum((col("r2x") * col("r2x")).cast("decimal(38,0)")).cast("double").as("sxx"),
        sum((col("r2x") * col("r2y")).cast("decimal(38,0)")).cast("double").as("sxy"),
        sum((col("r2y") * col("r2y")).cast("decimal(38,0)")).cast("double").as("syy"),
        sum(col("x").cast("decimal(38,0)")).cast("double").as("rx"),
        sum(col("y").cast("decimal(38,0)")).cast("double").as("ry"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double").as("rxx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double").as("rxy"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).cast("double").as("ryy")
      )
      .select(
        col("n").cast("long").as("n_docs"),
        (round(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt(
              (col("n") * col("sxx") - col("sx") * col("sx")) *
                (col("n") * col("syy") - col("sy") * col("sy"))
            ),
          6
        ) + 0.0).as("spearman_rho"),
        (round(
          (col("n") * col("rxy") - col("rx") * col("ry")) /
            sqrt(
              (col("n") * col("rxx") - col("rx") * col("rx")) *
                (col("n") * col("ryy") - col("ry") * col("ry"))
            ),
          6
        ) + 0.0).as("pearson_r")
      )
  }

  /** q174: Kaplan–Meier survival estimator — the right-censoring-aware
    * time-to-event curve (here: days from a user's first event to
    * their first 'error', users who never error censored at their last
    * observed day). The naive "average time to error over users who
    * errored" is biased by exactly the users it drops; KM is how
    * retention/reliability/time-to-conversion is actually reported.
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over observed-event times, with
    * censored users leaving the risk set without contributing an
    * event.
    *
    * Determinism: risk counts and event counts are exact integers from
    * one duration-value frame; each step factor (nᵢ−dᵢ)/nᵢ is one IEEE
    * division of exact ints, its ln snaps to a 10⁻⁹ grid (the q168 ln
    * convention), the cumulative sum is exact BIGINT, and S is one
    * exp + round. A step with d = n (risk set dies out) forces S = 0
    * exactly via a cumulated flag rather than ln(0).
    *
    * Scale shape: one corpus hash aggregate to per-user (first, event,
    * last) days, one tiny duration-value frame (≤ observation-window
    * days), cumulations over THAT frame (bounded — the q33b window
    * convention). The corpus is touched once.
    */
  private def q174(s: SparkSession, dir: String): DataFrame = {
    val u = graft.queries.Tables
      .table(s, dir, "events")
      .groupBy("user_id")
      .agg(
        min(to_date(col("ts"))).as("f"),
        min(when(col("event_type") === "error", to_date(col("ts")))).as("p"),
        max(to_date(col("ts"))).as("l")
      )
      .select(
        when(col("p").isNotNull, datediff(col("p"), col("f")))
          .otherwise(datediff(col("l"), col("f")))
          .as("dur"),
        when(col("p").isNotNull, lit(1L)).otherwise(lit(0L)).as("obs")
      )
    val vc = u
      .groupBy("dur")
      .agg(
        sum(col("obs")).as("d_t"),
        count(lit(1)).as("a_t")
      )
    val wc = Window.orderBy("dur")
    val wRisk = wc.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vc.withColumn("n_t", sum(col("a_t")).over(wRisk))
      .withColumn(
        "lf",
        when(col("d_t") === col("n_t"), lit(0L)).otherwise(
          floor(
            log(
              (col("n_t") - col("d_t")).cast("double") / col("n_t").cast("double")
            ) * 1.0e9
          ).cast("long")
        )
      )
      .withColumn("zflag", when(col("d_t") === col("n_t"), 1L).otherwise(0L))
      .withColumn("cum_lf", sum(col("lf")).over(wCum))
      .withColumn("zcum", sum(col("zflag")).over(wCum))
      .filter(col("d_t") > 0)
      .select(
        col("dur").cast("int").as("t_days"),
        col("n_t").as("n_risk"),
        col("d_t").as("d_events"),
        when(col("zcum") > 0, lit(0.0))
          .otherwise(
            round(exp(col("cum_lf").cast("double") / 1.0e9), 6) + 0.0
          )
          .as("survival")
      )
      .orderBy("t_days")
  }

  // --------------------------- q178: Benjamini–Hochberg FDR correction

  /** q178: Benjamini–Hochberg step-up FDR control over a FAMILY of
    * per-segment hypothesis tests — the multiple-comparisons discipline
    * every per-segment A/B readout needs (test 10 segments at α=0.05
    * and "one significant segment" is the EXPECTED false positive; BH
    * bounds the false-discovery RATE instead): per event type, the
    * q87-convention pooled two-proportion z (high-value events, arms by
    * the q43 user hash), p-value via the Abramowitz–Stegun 7.1.26
    * normal-tail polynomial (max error 7.5e-8 — far under the decision
    * grid) spelled textually identically on both engines over the
    * ALREADY-GRIDDED z, with the one exp() snapped to the 1e-9 grid
    * (the q168 ln convention) so the p is engine-exact; then the
    * step-up rule on EXACT INTEGERS — reject ranks ≤ k* where
    * k* = max{i : 20·m·p9(i) ≤ i·10⁹} (α = 1/20, p9 the BIGINT
    * nano-p) — so no boundary can flip on a float ulp.
    *
    * Scale shape: one corpus aggregate to (type, arm) counts, the rest
    * runs on the m-row family frame (m = #event types, bounded by the
    * type domain); the rank window is m rows (allowlisted).
    */
  private def q178(s: SparkSession, dir: String): DataFrame = {
    val perArm = Tables
      .table(s, dir, "events")
      .withColumn(
        "variant",
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, "A")
          .otherwise("B")
      )
      .groupBy("event_type", "variant")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") > 150, 1L).otherwise(0L)).as("k")
      )
    val a = perArm
      .filter(col("variant") === "A")
      .select(col("event_type"), col("n").as("na"), col("k").as("ka"))
    val b = perArm
      .filter(col("variant") === "B")
      .select(col("event_type"), col("n").as("nb"), col("k").as("kb"))
    val z = a
      .join(b, "event_type")
      .withColumn("pa", col("ka").cast("double") / col("na").cast("double"))
      .withColumn("pb", col("kb").cast("double") / col("nb").cast("double"))
      .withColumn(
        "pp",
        (col("ka") + col("kb")).cast("double") / (col("na") + col("nb")).cast("double")
      )
      .withColumn(
        "z",
        round(
          round(
            (col("pa") - col("pb")) /
              nullif(
                sqrt(col("pp") * (lit(1.0d) - col("pp"))
                  * (lit(1.0d) / col("na").cast("double")
                    + lit(1.0d) / col("nb").cast("double"))),
                lit(0.0d)
              ),
            6
          ),
          4
        )
      )
      .filter(col("z").isNotNull)
    // A&S 7.1.26 upper tail on |z|: identical text both engines; exp
    // snapped to 1e-9 BEFORE the polynomial so the one transcendental
    // can never split the engines
    val p = z
      .withColumn("az", abs(col("z")))
      .withColumn("t", lit(1.0d) / (lit(1.0d) + lit(0.2316419d) * col("az")))
      .withColumn(
        "pdf",
        round(exp(col("az") * col("az") * lit(-0.5d)), 9) / lit(2.5066282746310002d)
      )
      .withColumn(
        "tail",
        col("pdf") * (col("t") * (lit(0.319381530d) + col("t") * (lit(-0.356563782d) +
          col("t") * (lit(1.781477937d) + col("t") * (lit(-1.821255978d) +
            col("t") * lit(1.330274429d))))))
      )
      .withColumn(
        "p9",
        expr("CAST(round(least(2.0d * tail, 1.0d) * 1.0e9, 0) AS BIGINT)")
      )
    val m = p.agg(count(lit(1)).as("m"))
    val ranked = p
      .withColumn("p_rank", row_number().over(Window.orderBy("p9", "event_type")))
      .crossJoin(broadcast(m))
      .withColumn(
        "bh_ok",
        col("p9") * lit(20L) * col("m") <= col("p_rank") * lit(1000000000L)
      )
    val kstar = ranked.agg(max(when(col("bh_ok"), col("p_rank"))).as("kstar"))
    ranked
      .crossJoin(broadcast(kstar))
      .select(
        col("event_type"),
        (col("z") + 0.0).as("z_stat"),
        (round(col("p9").cast("double") / 1.0e9, 9) + 0.0).as("p_value"),
        col("p_rank"),
        col("m").as("m_tests"),
        (col("p_rank") <= coalesce(col("kstar"), lit(0))).as("reject")
      )
      .orderBy("event_type")
  }

  // --------------------------------------- q179: two-group log-rank test

  /** q179: log-rank (Mantel–Cox) test — "do the two arms' survival
    * curves differ?", the hypothesis-test companion of q174's
    * Kaplan–Meier estimate (q87's z compares one-shot conversion; this
    * compares WHEN events happen under right-censoring): at each
    * observed event time, arm A's observed events vs the expected
    * count under the null (d_t·nA_t/n_t, the hypergeometric mean given
    * the at-risk split), variance d·(nA/n)·(nB/n)·(n−d)/(n−1);
    * z = (O−E)/√V over the summed terms. Durations/censoring exactly
    * q174's frame, arms by the q43 user hash. Per-time E and V are
    * snapped to the 1e-9 grid and summed as EXACT BIGINTs (the q174
    * ln-cumsum convention — never an order-dependent float sum), the
    * final z the one IEEE dag on the two grid sums.
    *
    * Scale shape: one corpus aggregate to per-user durations, one
    * (dur)-value-frame aggregate with per-arm counts, reverse-cum risk
    * sets over the ≤ observation-window-days frame (allowlisted), one
    * final 1-row reduce.
    */
  private def q179(s: SparkSession, dir: String): DataFrame = {
    val u = Tables
      .table(s, dir, "events")
      .groupBy("user_id")
      .agg(
        min(to_date(col("ts"))).as("f"),
        min(when(col("event_type") === "error", to_date(col("ts")))).as("p"),
        max(to_date(col("ts"))).as("l")
      )
      .select(
        col("user_id"),
        when(col("p").isNotNull, datediff(col("p"), col("f")))
          .otherwise(datediff(col("l"), col("f")))
          .as("dur"),
        when(col("p").isNotNull, lit(1L)).otherwise(lit(0L)).as("obs")
      )
      .withColumn(
        "grp",
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, "A")
          .otherwise("B")
      )
    val vc = u
      .groupBy("dur")
      .agg(
        sum(when(col("grp") === "A", 1L).otherwise(0L)).as("a_a"),
        sum(when(col("grp") === "B", 1L).otherwise(0L)).as("a_b"),
        sum(when(col("grp") === "A", col("obs")).otherwise(0L)).as("d_a"),
        sum(when(col("grp") === "B", col("obs")).otherwise(0L)).as("d_b")
      )
    val wRisk = Window
      .orderBy("dur")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val terms = vc
      .withColumn("n_a", sum(col("a_a")).over(wRisk))
      .withColumn("n_b", sum(col("a_b")).over(wRisk))
      .withColumn("n_t", col("n_a") + col("n_b"))
      .withColumn("d_t", col("d_a") + col("d_b"))
      .filter(col("d_t") > 0)
      .withColumn(
        "e9",
        expr(
          "CAST(round(CAST(d_t AS DOUBLE) * CAST(n_a AS DOUBLE) " +
            "/ CAST(n_t AS DOUBLE) * 1.0e9, 0) AS BIGINT)"
        )
      )
      .withColumn(
        "v9",
        when(col("n_t") > 1,
          expr(
            "CAST(round(CAST(d_t AS DOUBLE) * (CAST(n_a AS DOUBLE) / CAST(n_t AS DOUBLE)) " +
              "* (CAST(n_b AS DOUBLE) / CAST(n_t AS DOUBLE)) " +
              "* (CAST(n_t - d_t AS DOUBLE) / CAST(n_t - 1 AS DOUBLE)) * 1.0e9, 0) AS BIGINT)"
          )
        ).otherwise(lit(0L))
      )
    terms
      .agg(
        sum(col("d_a")).as("o_a"),
        sum(col("e9")).as("se9"),
        sum(col("v9")).as("sv9")
      )
      .select(
        col("o_a"),
        (round(col("se9").cast("double") / 1.0e9, 6) + 0.0).as("e_a"),
        (round(col("sv9").cast("double") / 1.0e9, 6) + 0.0).as("var_a"),
        (round(
          round(
            (col("o_a").cast("double") - col("se9").cast("double") / 1.0e9) /
              nullif(sqrt(col("sv9").cast("double") / 1.0e9), lit(0.0d)),
            6
          ),
          4
        ) + 0.0).as("z_stat")
      )
  }

  // ------------------------------- q185: Welch's t-test + Cohen's d

  /** q185: Welch's unequal-variance t-test + Cohen's d effect size on a
    * CONTINUOUS metric (per-user total purchase value) — the readout
    * q87's proportion z cannot give (a conversion-rate tie can hide a
    * large spend difference), with the variance-pooling honesty Student
    * t lacks (arms differ in spread whenever a treatment shifts heavy
    * spenders): t = (m̄A−m̄B)/√(vA/nA+vB/nB), Welch–Satterthwaite df,
    * d = (m̄A−m̄B)/s_pooled. Per-user metric is an exact centi BIGINT;
    * per-arm moments are exact DECIMAL(38) sums cast to double ONCE
    * (the q120 convention) so every downstream IEEE op sees identical
    * operands on both engines; outputs gridded round(6)→round(4).
    *
    * Scale shape: one corpus aggregate to per-user centi totals, one
    * 2-row arm aggregate, a 1×1 cross join — no windows, no corpus
    * joins.
    */
  private def q185(s: SparkSession, dir: String): DataFrame = {
    val users = Tables
      .table(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        sum(round(col("value") * 100.0, 0).cast("long")).as("su")
      )
      .withColumn(
        "variant",
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, "A")
          .otherwise("B")
      )
    val g = users
      .groupBy("variant")
      .agg(
        count(lit(1)).as("n"),
        sum(col("su").cast("decimal(38,0)")).cast("double").as("s"),
        sum((col("su") * col("su")).cast("decimal(38,0)")).cast("double").as("ss")
      )
      .withColumn("mean", col("s") / col("n").cast("double"))
      .withColumn(
        "v",
        (col("ss") - col("s") * col("s") / col("n").cast("double")) /
          nullif(col("n") - 1, lit(0)).cast("double")
      )
    val a = g
      .filter(col("variant") === "A")
      .select(col("n").as("na"), col("mean").as("ma"), col("v").as("va"))
    val b = g
      .filter(col("variant") === "B")
      .select(col("n").as("nb"), col("mean").as("mb"), col("v").as("vb"))
    a.crossJoin(b)
      .withColumn("sea", col("va") / col("na").cast("double"))
      .withColumn("seb", col("vb") / col("nb").cast("double"))
      .withColumn(
        "sp",
        sqrt(
          ((col("na") - 1).cast("double") * col("va") +
            (col("nb") - 1).cast("double") * col("vb")) /
            nullif((col("na") + col("nb") - 2), lit(0)).cast("double")
        )
      )
      .select(
        col("na"),
        col("nb"),
        (round(col("ma") / 100.0, 4) + 0.0).as("mean_a"),
        (round(col("mb") / 100.0, 4) + 0.0).as("mean_b"),
        (round(
          round(
            (col("ma") - col("mb")) / nullif(sqrt(col("sea") + col("seb")), lit(0.0d)),
            6
          ),
          4
        ) + 0.0).as("t_stat"),
        (round(
          (col("sea") + col("seb")) * (col("sea") + col("seb")) /
            nullif(
              col("sea") * col("sea") / nullif(col("na") - 1, lit(0)).cast("double") +
                col("seb") * col("seb") / nullif(col("nb") - 1, lit(0)).cast("double"),
              lit(0.0d)
            ),
          4
        ) + 0.0).as("welch_df"),
        (round(
          round((col("ma") - col("mb")) / nullif(col("sp"), lit(0.0d)), 6),
          4
        ) + 0.0).as("cohen_d")
      )
  }

  // ------------------------------ q186: Cramér's V association strength

  /** q186: Cramér's V — the EFFECT-SIZE companion of q86's χ² test
    * (χ² grows with n, so at corpus scale everything is "significant";
    * V = √(χ²/(n·(min(r,c)−1))) ∈ [0,1] is the sample-size-free
    * association strength an analyst actually compares across pairs):
    * over the same (event_type × tier) contingency. The per-cell χ²
    * contributions are snapped to the 1e-6 grid and summed as EXACT
    * BIGINTs (q86 exposes the rounded cells precisely so no float sum
    * of nondeterministic order exists; this gate keeps that discipline
    * when it must sum), the final V one IEEE dag on the grid sum.
    *
    * Scale shape: ONE corpus aggregate to the r×c contingency frame;
    * margins, grid sum, and the dag all run on domain-bounded frames.
    */
  private def q186(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables
      .table(s, dir, "events")
      .groupBy(col("event_type"), (col("user_id") % 3).as("tier"))
      .agg(count(lit(1)).as("obs"))
    val rowTot = obs.groupBy("event_type").agg(sum("obs").as("row_n"))
    val colTot = obs.groupBy("tier").agg(sum("obs").as("col_n"))
    val grand = obs.agg(
      sum("obs").as("n"),
      countDistinct("event_type").as("r_levels"),
      countDistinct("tier").as("c_levels")
    )
    obs
      .join(broadcast(rowTot), "event_type")
      .join(broadcast(colTot), "tier")
      .crossJoin(broadcast(grand))
      .withColumn(
        "expected",
        col("row_n").cast("double") * col("col_n").cast("double") / col("n").cast("double")
      )
      .withColumn(
        "cell6",
        expr(
          "CAST(round(round((obs - expected) * (obs - expected) / expected, 6) * 1.0e6, 0) AS BIGINT)"
        )
      )
      .groupBy("n", "r_levels", "c_levels")
      .agg(sum(col("cell6")).as("chi2_6"))
      .select(
        col("n"),
        col("r_levels"),
        col("c_levels"),
        (round(col("chi2_6").cast("double") / 1.0e6, 6) + 0.0).as("chi2"),
        (round(
          sqrt(
            col("chi2_6").cast("double") / 1.0e6 /
              (col("n") * (least(col("r_levels"), col("c_levels")) - 1)).cast("double")
          ),
          6
        ) + 0.0).as("cramers_v")
      )
  }

  // ------------------------ q191: population stability index (PSI)

  /** q191: PSI — the ML-monitoring drift statistic (PSI < 0.1 stable,
    * 0.1–0.25 watch, > 0.25 retrain — the thresholds every model-ops
    * runbook quotes) between the two arms' event-value distributions,
    * complementing q145's KS (KS finds the worst POINT divergence; PSI
    * sums bin-wise contribution so a broad small shift and one hot
    * bin read differently, and the per-bin rows say WHERE): fixed
    * exact-centi bin edges (widening toward the tail), Laplace-
    * smoothed bin shares, contribution (pa−pb)·ln(pa/pb) per bin
    * floor-snapped to the 1e-9 grid and summed as EXACT BIGINTs.
    *
    * Scale shape: one corpus aggregate to the ≤10-row bin frame;
    * totals, smoothing, contributions, and the PSI sum all run on that
    * domain-bounded frame — no windows, no corpus joins.
    */
  private def q191(s: SparkSession, dir: String): DataFrame = {
    val binned = Tables
      .table(s, dir, "events")
      .select(
        expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("cv"),
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, "A")
          .otherwise("B")
          .as("variant")
      )
      .withColumn(
        "bin",
        when(col("cv") < 500, 0)
          .when(col("cv") < 1000, 1)
          .when(col("cv") < 2000, 2)
          .when(col("cv") < 3500, 3)
          .when(col("cv") < 5500, 4)
          .when(col("cv") < 8500, 5)
          .when(col("cv") < 13000, 6)
          .when(col("cv") < 20000, 7)
          .when(col("cv") < 30000, 8)
          .otherwise(9)
      )
    val counts = binned
      .groupBy("bin")
      .agg(
        sum(when(col("variant") === "A", 1L).otherwise(0L)).as("ca"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("cb")
      )
    val tot = counts.agg(
      sum("ca").as("na"),
      sum("cb").as("nb"),
      count(lit(1)).as("nbins")
    )
    val terms = counts
      .crossJoin(broadcast(tot))
      .withColumn(
        "pa",
        (col("ca") + 1).cast("double") / (col("na") + col("nbins")).cast("double")
      )
      .withColumn(
        "pb",
        (col("cb") + 1).cast("double") / (col("nb") + col("nbins")).cast("double")
      )
      .withColumn(
        "c9",
        expr("CAST(floor((pa - pb) * ln(pa / pb) * 1.0e9) AS BIGINT)")
      )
    val psi = terms.agg(sum(col("c9")).as("psi9"))
    terms
      .crossJoin(broadcast(psi))
      .select(
        col("bin"),
        col("ca"),
        col("cb"),
        (round(col("pa"), 6) + 0.0).as("share_a"),
        (round(col("pb"), 6) + 0.0).as("share_b"),
        (round(col("c9").cast("double") / 1.0e9, 9) + 0.0).as("contrib"),
        (round(col("psi9").cast("double") / 1.0e9, 6) + 0.0).as("psi_total")
      )
      .orderBy("bin")
  }

  // ------------------ q194: restricted mean survival time (RMST)

  /** q194: RMST — the ONE-NUMBER summary of q174's Kaplan–Meier curve
    * clinicians and retention analysts actually report ("average
    * error-free days in the first τ=30", valid under censoring where
    * the naive mean-to-event is not): ∫₀^τ Ŝ(t)dt = Σ over KM steps of
    * S(t_k)·(next step ∧ τ − t_k), plus the S=1 segment before the
    * first event. The KM machinery is exactly q174's (same duration
    * frame, same 1e-9 ln-grid cumsum); each rectangle's area S·width
    * is snapped to the 1e-9 grid and summed as EXACT BIGINTs, so the
    * integral is engine-exact.
    *
    * Scale shape: q174's frames throughout — the corpus reduces to a
    * duration-value frame, the windows run on ≤ observation-window
    * days (allowlisted), the output is one row.
    */
  private def q194(s: SparkSession, dir: String): DataFrame = {
    val Tau = 30
    val u = Tables
      .table(s, dir, "events")
      .groupBy("user_id")
      .agg(
        min(to_date(col("ts"))).as("f"),
        min(when(col("event_type") === "error", to_date(col("ts")))).as("p"),
        max(to_date(col("ts"))).as("l")
      )
      .select(
        when(col("p").isNotNull, datediff(col("p"), col("f")))
          .otherwise(datediff(col("l"), col("f")))
          .as("dur"),
        when(col("p").isNotNull, lit(1L)).otherwise(lit(0L)).as("obs")
      )
    val vc = u
      .groupBy("dur")
      .agg(sum(col("obs")).as("d_t"), count(lit(1)).as("a_t"))
    val wc = Window.orderBy("dur")
    val wRisk = wc.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val steps = vc
      .withColumn("n_t", sum(col("a_t")).over(wRisk))
      .withColumn(
        "lf",
        when(col("d_t") === col("n_t"), lit(0L)).otherwise(
          floor(
            log((col("n_t") - col("d_t")).cast("double") / col("n_t").cast("double")) * 1.0e9
          ).cast("long")
        )
      )
      .withColumn("zflag", when(col("d_t") === col("n_t"), 1L).otherwise(0L))
      .withColumn("cum_lf", sum(col("lf")).over(wCum))
      .withColumn("zcum", sum(col("zflag")).over(wCum))
      .filter(col("d_t") > 0)
      .select(
        col("dur"),
        when(col("zcum") > 0, lit(0.0d))
          .otherwise(exp(col("cum_lf").cast("double") / 1.0e9))
          .as("surv")
      )
    // rectangle widths: from each event time to the next (∧ τ); the
    // S=1 segment before the first event contributes its full width
    val rect = steps
      .withColumn("next_t", lead("dur", 1).over(Window.orderBy("dur")))
      .filter(col("dur") < Tau)
      .withColumn(
        "width",
        least(coalesce(col("next_t"), lit(Tau)), lit(Tau)) - col("dur")
      )
      .withColumn("a9", expr("CAST(floor(surv * width * 1.0e9) AS BIGINT)"))
    val firstSeg = steps
      .agg(min(col("dur")).as("t1"))
      .select(
        (least(col("t1"), lit(Tau)).cast("long") * lit(1000000000L)).as("head9")
      )
    rect
      .agg(sum(col("a9")).as("tail9"), count(lit(1)).as("n_steps"))
      .crossJoin(broadcast(firstSeg))
      .select(
        lit(Tau).as("tau_days"),
        col("n_steps"),
        (round(
          (col("head9") + coalesce(col("tail9"), lit(0L))).cast("double") / 1.0e9,
          4
        ) + 0.0).as("rmst_days")
      )
  }

  // -------------------- q198: Theil–Sen robust trend estimator

  /** q198: Theil–Sen slope of the daily purchase-value series — the
    * robust trend a single outlier day cannot own (OLS q120's slope
    * moves arbitrarily with one corrupted day; the MEDIAN of pairwise
    * slopes has a 29% breakdown point — the difference between "the
    * metric is drifting" and "one bad ingest day"): slope over all
    * day pairs (d1 < d2), slope = Δcenti/Δdays, plus the
    * median-residual intercept.
    *
    * Determinism: every pairwise slope is ONE division of exact
    * integers (correctly-rounded IEEE — identical both engines);
    * median selection is positional under the total (slope, d1, d2)
    * order with the even-count midpoint averaged on the 1e-9 grid.
    *
    * Scale shape: the corpus reduces to the calendar-bounded daily
    * frame; the pair self-join and rank windows run on days²/2 pairs
    * (≤ ~4k at a 90-day window — calendar-bounded by construction,
    * allowlisted); nothing corpus-sized after the first aggregate.
    */
  private def q198(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .table(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
      .select(datediff(col("d"), lit("2024-01-01").cast("date")).as("x"), col("sv"))
    val pairs = daily
      .as("l")
      .join(daily.as("r"), col("l.x") < col("r.x"))
      .select(
        col("l.x").as("x1"),
        col("r.x").as("x2"),
        ((col("r.sv") - col("l.sv")).cast("double") /
          (col("r.x") - col("l.x")).cast("double")).as("slope")
      )
    val w = Window.orderBy("slope", "x1", "x2")
    val ranked = pairs
      .withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(pairs.agg(count(lit(1)).as("np"))))
    // positional median: lower and upper middle averaged on the grid
    val med = ranked
      .filter(
        col("rn") === expr("(np + 1) div 2") || col("rn") === expr("(np + 2) div 2")
      )
      .agg(
        (sum(expr("CAST(floor(slope * 1.0e9) AS BIGINT)")).cast("double") /
          (count(lit(1)) * lit(1000000000L)).cast("double")).as("ts_slope_raw")
      )
    val nd = daily.agg(count(lit(1)).as("n_days"))
    val np = pairs.agg(count(lit(1)).as("n_pairs"))
    // intercept: median of (sv − slope·x) residuals under the same
    // positional convention, on the slope just selected
    val resid = daily
      .crossJoin(broadcast(med))
      .select(
        (col("sv").cast("double") - col("ts_slope_raw") * col("x").cast("double"))
          .as("res")
      )
    val wr = Window.orderBy("res")
    val medRes = resid
      .withColumn("rn", row_number().over(wr))
      .crossJoin(broadcast(resid.agg(count(lit(1)).as("nr"))))
      .filter(
        col("rn") === expr("(nr + 1) div 2") || col("rn") === expr("(nr + 2) div 2")
      )
      .agg(
        (sum(expr("CAST(floor(res * 1.0e9) AS BIGINT)")).cast("double") /
          (count(lit(1)) * lit(1000000000L)).cast("double")).as("icept_raw")
      )
    nd.crossJoin(broadcast(np))
      .crossJoin(broadcast(med))
      .crossJoin(broadcast(medRes))
      .select(
        col("n_days"),
        col("n_pairs"),
        (round(col("ts_slope_raw") / 100.0, 6) + 0.0).as("ts_slope"),
        (round(col("icept_raw") / 100.0, 4) + 0.0).as("ts_intercept")
      )
  }

  // ------------------ q201: Wilson score intervals per segment

  /** q201: Wilson 95% score interval for each segment's high-value
    * rate — the ESTIMATION companion of q178's testing (BH says which
    * segments differ from the null; Wilson says what each rate
    * plausibly IS, and unlike the naive ±1.96·√(p(1−p)/n) Wald band it
    * never leaves [0,1] and stays honest at small n or extreme p —
    * the interval every ranking-by-rate UI should sort by): per event
    * type, lower/upper = (p̂ + z²/2n ∓ z√(p̂(1−p̂)/n + z²/4n²))/(1+z²/n)
    * with z = 1.96 literal.
    *
    * Determinism: one corpus aggregate to exact (n, k) per type; the
    * interval is a fixed IEEE dag on two exact integers (sqrt is
    * correctly rounded), outputs gridded round(6). No windows, no
    * joins.
    */
  private def q201(s: SparkSession, dir: String): DataFrame = {
    val z = 1.96d
    Tables
      .table(s, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") > 150, 1L).otherwise(0L)).as("k")
      )
      .withColumn("p", col("k").cast("double") / col("n").cast("double"))
      .withColumn("zz_n", lit(z * z) / col("n").cast("double"))
      .withColumn(
        "half",
        lit(z) * sqrt(
          col("p") * (lit(1.0d) - col("p")) / col("n").cast("double") +
            lit(z * z) / (lit(4.0d) * col("n").cast("double") * col("n").cast("double"))
        ) / (lit(1.0d) + col("zz_n"))
      )
      .withColumn(
        "center",
        (col("p") + col("zz_n") / lit(2.0d)) / (lit(1.0d) + col("zz_n"))
      )
      .select(
        col("event_type"),
        col("n"),
        col("k"),
        (round(col("p"), 6) + 0.0).as("rate"),
        (round(col("center") - col("half"), 6) + 0.0).as("wilson_lo"),
        (round(col("center") + col("half"), 6) + 0.0).as("wilson_hi")
      )
      .orderBy("event_type")
  }

  // ------------------------ q204: Kendall's τ-b rank correlation

  /** q204: Kendall's τ-b over the q169 metric pair (per-doc word count
    * vs the 0–100 lexical-diversity grid) — the CONCORDANCE companion
    * of Spearman's ρ: ρ asks "are the rank SEQUENCES linearly related",
    * τ asks "what fraction of pairs ORDER the same way", the statistic
    * with the direct probabilistic read (τ = P(concordant) −
    * P(discordant)) and better behavior under heavy ties — which this
    * gridded pair has, hence the τ-b tie correction:
    * τ-b = (C − D) / √((n₀−n₁)(n₀−n₂)), n₀ = n(n−1)/2,
    * n₁/n₂ = Σ t(t−1)/2 over x-/y-tie groups.
    *
    * Determinism: EVERYTHING up to the final dag is exact integer
    * arithmetic — C and D are Σ cₐ·c_b over joint VALUE cells (never a
    * float), tie terms are exact integer sums, the one division and
    * √ run on exactly-representable integers (BIGINT-safe to ~10⁹
    * docs; the DECIMAL(38) swap-in is the q185 convention). The
    * render snaps τ to the 1e-6 grid with floor(·×1e6)/1e6 — one
    * IEEE multiply + floor both engines spell bit-identically — never
    * round(·, 6), whose decimal-midpoint behavior is
    * implementation-defined across engines (the r16 q204/q216/q217
    * hash failures).
    *
    * Scale shape: the corpus collapses to the joint (x, y) VALUE-cell
    * frame in one aggregate; both metrics are DOMAIN-bounded (words ≤
    * corpus max-doc-words, y ≤ 101 grid points — the q33b/q169
    * argument), so the cell×cell concordance join is a
    * CORPUS-INDEPENDENT constant (≪ 10⁴ cells here), broadcast on one
    * side; the marginals ride two more domain-bounded aggregates.
    */
  private def q204(s: SparkSession, dir: String): DataFrame = {
    val d = graft.queries.Tables
      .table(s, dir, "documents")
      .select(split(col("text"), " ").as("w0"))
      .select(
        expr("size(filter(w0, x -> x <> ''))").as("nw"),
        expr("size(array_distinct(filter(w0, x -> x <> '')))").as("ndw")
      )
      .filter(col("nw") > 0)
      .select(
        col("nw").cast("long").as("x"),
        expr("(100 * ndw) div nw").cast("long").as("y")
      )
    val cells = d.groupBy("x", "y").agg(count(lit(1)).as("c"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"), col("c").as("cb"))
    val cd = cells
      .join(broadcast(b), col("x") < col("xb"))
      .agg(
        sum(when(col("y") < col("yb"), col("c") * col("cb")).otherwise(0L))
          .as("nc"),
        sum(when(col("y") > col("yb"), col("c") * col("cb")).otherwise(0L))
          .as("nd")
      )
    val tots = d.agg(count(lit(1)).as("n"))
    val tx = d
      .groupBy("x")
      .agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1) div 2")).as("n1"))
    val ty = d
      .groupBy("y")
      .agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1) div 2")).as("n2"))
    cd.crossJoin(broadcast(tots))
      .crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      .withColumn("n0", expr("n * (n - 1) div 2"))
      .select(
        col("n").as("n_docs"),
        col("nc").as("concordant"),
        col("nd").as("discordant"),
        col("n1").as("ties_x"),
        col("n2").as("ties_y"),
        (floor(
          (col("nc") - col("nd")).cast("double") /
            nullif(
              sqrt(
                (col("n0") - col("n1")).cast("double") *
                  (col("n0") - col("n2")).cast("double")
              ),
              lit(0.0d)
            ) * 1.0e6
        ).cast("double") / 1.0e6 + 0.0).as("kendall_tau_b")
      )
  }

  // ---------------- q214: Mann–Kendall trend test

  /** q214: Mann–Kendall — the SIGNIFICANCE companion of q198's
    * Theil–Sen slope (Theil–Sen says HOW STEEP, MK says whether a
    * monotone trend exists at all, distribution-free — the pairing
    * every environmental/metrics monitoring standard prescribes):
    * over the daily purchase series, S = Σ_{i<j} sign(y_j − y_i),
    * Var(S)·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) over y-tie groups
    * (kept ×18 as an EXACT BIGINT), the continuity-corrected
    * z = (S ∓ 1)/√(VarS18/18), and the 1.96 two-sided call.
    *
    * Determinism: S and VarS18 are exact integer aggregates (the
    * q204 concordance discipline applied to the time axis); z is one
    * guarded dag; the trend label derives from z against the exact
    * 1.96 literal.
    *
    * Scale shape: the corpus reduces to the calendar-bounded daily
    * frame; the pair join is days²/2 (the q198 argument); ties ride a
    * value-frame aggregate.
    */
  private def q214(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .table(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
      .select(
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        col("sv")
      )
    val sStat = daily
      .as("l")
      .join(daily.as("r"), col("l.x") < col("r.x"))
      .agg(
        sum(signum((col("r.sv") - col("l.sv")).cast("double")).cast("long"))
          .as("s_stat")
      )
    val nD = daily.agg(count(lit(1)).as("n"))
    val ties = daily
      .groupBy("sv")
      .agg(count(lit(1)).as("t"))
      .agg(
        coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L)).as("tt")
      )
    sStat
      .crossJoin(broadcast(nD))
      .crossJoin(broadcast(ties))
      .withColumn("vs18", expr("n * (n - 1) * (2 * n + 5) - tt"))
      .withColumn(
        "z",
        when(col("s_stat") > 0,
          (col("s_stat") - 1).cast("double") /
            sqrt(nullif(col("vs18").cast("double") / 18.0d, lit(0.0d))))
          .when(col("s_stat") < 0,
            (col("s_stat") + 1).cast("double") /
              sqrt(nullif(col("vs18").cast("double") / 18.0d, lit(0.0d))))
          .otherwise(lit(0.0d))
      )
      .select(
        col("n").as("n_days"),
        col("s_stat"),
        col("vs18").as("var_s_x18"),
        (round(col("z"), 6) + 0.0).as("mk_z"),
        when(col("z") > 1.96, "increasing")
          .when(col("z") < -1.96, "decreasing")
          .otherwise("none")
          .as("trend")
      )
  }

  // ------------- q215: Wasserstein-1 distance between arms

  /** q215: Wasserstein-1 (earth-mover) drift between the two md5 user
    * arms' value distributions — the MAGNITUDE companion of q145's KS
    * (KS is the sup-gap, blind to WHERE mass moved and by how much;
    * W₁ = ∫|F_A − F_B| is the average transport distance in value
    * units, the number a drift dashboard can threshold in dollars):
    * over the merged centi-value frame,
    * W₁ = Σ_k |F_A(v_k) − F_B(v_k)| · (v_{k+1} − v_k).
    *
    * Determinism: cumulative counts ride q145's two-level shard
    * cumulation (exact integers); each term is the exact cross-product
    * |ca_le·nb − cb_le·na| · gap summed as DECIMAL(38); ONE final
    * division by na·nb and the centi scale.
    *
    * Scale shape: identical to q145 — per-VALUE count frame (domain-
    * bounded), shard-offset windows, plus one lead() over the value
    * frame for the gaps (value-frame bounded — allowlisted with the
    * q33b argument).
    */
  private def q215(s: SparkSession, dir: String): DataFrame = {
    val perVal = Tables
      .table(s, dir, "events")
      .select(
        round(col("value") * 100.0, 0).cast("long").as("vc"),
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, 1L)
          .otherwise(0L)
          .as("a")
      )
      .groupBy("vc")
      .agg(sum("a").as("ca"), (count(lit(1)) - sum("a")).as("cb"))
      .withColumn("shard", expr("(vc - pmod(vc, 256)) div 256"))
    val offsets = perVal
      .groupBy("shard")
      .agg(sum("ca").as("sa"), sum("cb").as("sb"))
      .withColumn(
        "off_a",
        coalesce(
          sum("sa").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .withColumn(
        "off_b",
        coalesce(
          sum("sb").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("shard", "off_a", "off_b")
    val local = Window
      .partitionBy("shard")
      .orderBy("vc")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = perVal
      .join(broadcast(offsets), "shard")
      .withColumn("ca_le", col("off_a") + sum("ca").over(local))
      .withColumn("cb_le", col("off_b") + sum("cb").over(local))
      // the gap to the NEXT distinct value: a lead over the VALUE
      // frame (≤ distinct centi values — the q33b bound); the largest
      // value's gap is 0 (both CDFs are 1 past it)
      .withColumn(
        "gap",
        coalesce(lead("vc", 1).over(Window.orderBy("vc")) - col("vc"), lit(0L))
      )
    val tot = cum.agg(sum("ca").as("na"), sum("cb").as("nb"))
    cum
      .crossJoin(broadcast(tot))
      .agg(
        max("na").as("na"),
        max("nb").as("nb"),
        count(lit(1)).as("n_values"),
        sum(
          (abs(col("ca_le") * col("nb") - col("cb_le") * col("na")) * col("gap"))
            .cast("decimal(38,0)")
        ).cast("double").as("num")
      )
      .select(
        col("na"),
        col("nb"),
        col("n_values"),
        (round(
          col("num") / (col("na").cast("double") * col("nb").cast("double")) / 100.0d,
          6
        ) + 0.0).as("wasserstein_1")
      )
  }

  // ------------- q216: Brown–Forsythe robust variance-equality test

  /** q216: Brown–Forsythe test — "do the two arms' value SPREADS
    * differ", the variance-homogeneity companion of q185's Welch mean
    * test (Welch asks whether the centers moved; a pricing experiment
    * can leave the mean fixed and widen the tails — and classic
    * Levene/Bartlett answers are outlier-fragile, which is why the
    * median-centered Brown–Forsythe variant is what validation suites
    * actually run): per arm, z = |v − median(arm)| on exact centi
    * values, then the one-way ANOVA F on z across the two q43 arms,
    * F = (N−2)·SSB/SSW with the usual between/within sums of squares.
    *
    * Determinism: arm medians are EXACT value-based positional
    * selections over the per-arm centi value frame (percentile_disc
    * lower-median semantics — min v with 2·cum ≥ n, never an
    * interpolation float); |v−med| is an exact integer, so the z
    * moments are DECIMAL(38) exact sums cast to double ONCE (the
    * q120/q185 convention) and F is a single IEEE dag both engines
    * spell identically; the render snaps F to the 1e-6 grid with
    * floor(·×1e6)/1e6 (the q204 discipline — round(·, 6) is
    * implementation-defined at decimal midpoints). The significance
    * call compares the raw F dag against the exact double literal
    * 3.8415999999999997 (the q201 z² convention — F(1,∞) = z²).
    *
    * Scale shape: ONE corpus hash aggregate to the per-(arm, centi
    * value) frame; medians, z-moments, and F all derive from that
    * domain-bounded frame (windows partitioned by arm over distinct
    * values — the q33b bound). The corpus is touched once.
    */
  private def q216(s: SparkSession, dir: String): DataFrame = {
    val perVal = Tables
      .table(s, dir, "events")
      .select(
        round(col("value") * 100.0, 0).cast("long").as("vc"),
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, "A")
          .otherwise("B")
          .as("arm")
      )
      .groupBy("arm", "vc")
      .agg(count(lit(1)).as("c"))
    val wCum = Window
      .partitionBy("arm")
      .orderBy("vc")
      .rowsBetween(Window.unboundedPreceding, 0)
    val meds = perVal
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(Window.partitionBy("arm")))
      .groupBy("arm")
      .agg(
        min(when(col("cum") * 2 >= col("n"), col("vc"))).as("med"),
        max("n").as("n")
      )
    val z = perVal
      .join(broadcast(meds), "arm")
      .select(
        col("arm"),
        col("n"),
        col("med"),
        (abs(col("vc") - col("med")) * col("c")).as("sz"),
        (abs(col("vc") - col("med")) * abs(col("vc") - col("med")) * col("c"))
          .as("qz")
      )
      .groupBy("arm")
      .agg(
        max("n").as("n"),
        max("med").as("med"),
        sum(col("sz").cast("decimal(38,0)")).cast("double").as("s"),
        sum(col("qz").cast("decimal(38,0)")).cast("double").as("q")
      )
    val a = z.filter(col("arm") === "A").select(
      col("n").as("na"), col("med").as("ma"), col("s").as("sa"), col("q").as("qa"))
    val b = z.filter(col("arm") === "B").select(
      col("n").as("nb"), col("med").as("mb"), col("s").as("sb"), col("q").as("qb"))
    a.crossJoin(b)
      .withColumn(
        "ssb",
        col("sa") * col("sa") / col("na").cast("double") +
          col("sb") * col("sb") / col("nb").cast("double") -
          (col("sa") + col("sb")) * (col("sa") + col("sb")) /
          (col("na") + col("nb")).cast("double")
      )
      .withColumn(
        "ssw",
        col("qa") + col("qb") -
          (col("sa") * col("sa") / col("na").cast("double") +
            col("sb") * col("sb") / col("nb").cast("double"))
      )
      .withColumn(
        "f_raw",
        (col("na") + col("nb") - 2).cast("double") * col("ssb") /
          nullif(col("ssw"), lit(0.0d))
      )
      .select(
        col("na"),
        col("nb"),
        (col("ma").cast("double") / 100.0d).as("median_a"),
        (col("mb").cast("double") / 100.0d).as("median_b"),
        (floor(col("f_raw") * 1.0e6).cast("double") / 1.0e6 + 0.0)
          .as("f_stat"),
        (col("f_raw") > lit(3.8415999999999997d)).as("spread_differs")
      )
  }

  // ---------------- q217: Nelson–Aalen cumulative hazard

  /** q217: Nelson–Aalen cumulative hazard + Fleming–Harrington
    * survival — the HAZARD-scale view of q174's Kaplan–Meier frame
    * (KM multiplies survival factors; NA sums the instantaneous risks
    * d/n, which is the curve additive-risk models and hazard-ratio
    * eyeballing read, is defined with no special case at d = n, and
    * gives the small-sample-preferred Fleming–Harrington estimator
    * S = exp(−H) for free): H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ with variance
    * Σ dᵢ(nᵢ−dᵢ)/nᵢ³, on q174's exact duration frame verbatim (days
    * from first event to first 'error', censored at last observed).
    *
    * Determinism: per-time d/n snaps to the 1e-9 grid and the
    * variance term d(n−d)/n³ to the 1e-12 grid (exact integers inside
    * one IEEE division each); BOTH cumulations are exact BIGINT sums
    * over the duration value frame, so H and its variance are
    * engine-exact before the renders. The renders are pure integer
    * grid coarsenings (cum_h9 div 1000 / cum_v12 div 1000 — no float
    * round at all) and the one exp output snaps to the 1e-6 grid with
    * floor(·×1e6)/1e6 (the q204 discipline; round(·, 6) is
    * implementation-defined at decimal midpoints).
    *
    * Scale shape: q174's exactly — one corpus hash aggregate to
    * per-user durations, then cumulations over the ≤ observation-
    * window-days value frame (the q33b window bound).
    */
  private def q217(s: SparkSession, dir: String): DataFrame = {
    val u = Tables
      .table(s, dir, "events")
      .groupBy("user_id")
      .agg(
        min(to_date(col("ts"))).as("f"),
        min(when(col("event_type") === "error", to_date(col("ts")))).as("p"),
        max(to_date(col("ts"))).as("l")
      )
      .select(
        when(col("p").isNotNull, datediff(col("p"), col("f")))
          .otherwise(datediff(col("l"), col("f")))
          .as("dur"),
        when(col("p").isNotNull, lit(1L)).otherwise(lit(0L)).as("obs")
      )
    val vc = u
      .groupBy("dur")
      .agg(sum(col("obs")).as("d_t"), count(lit(1)).as("a_t"))
    val wc = Window.orderBy("dur")
    val wRisk = wc.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vc.withColumn("n_t", sum(col("a_t")).over(wRisk))
      .withColumn(
        "h9",
        floor(
          col("d_t").cast("double") / col("n_t").cast("double") * 1.0e9
        ).cast("long")
      )
      .withColumn(
        "v12",
        floor(
          (col("d_t") * (col("n_t") - col("d_t"))).cast("double") /
            (col("n_t") * col("n_t") * col("n_t")).cast("double") * 1.0e12
        ).cast("long")
      )
      .withColumn("cum_h9", sum(col("h9")).over(wCum))
      .withColumn("cum_v12", sum(col("v12")).over(wCum))
      .filter(col("d_t") > 0)
      .select(
        col("dur").cast("int").as("t_days"),
        col("n_t").as("n_risk"),
        col("d_t").as("d_events"),
        (expr("cum_h9 div 1000").cast("double") / 1.0e6 + 0.0).as("cum_hazard"),
        (expr("cum_v12 div 1000").cast("double") / 1.0e9 + 0.0).as("hazard_var"),
        (floor(exp(-col("cum_h9").cast("double") / 1.0e9) * 1.0e6)
          .cast("double") / 1.0e6 + 0.0).as("fh_survival")
      )
      .orderBy("t_days")
  }

  // ------------- q218: Cochran–Armitage trend test

  /** q218: Cochran–Armitage test for trend — "does conversion RISE
    * with exposure", the ordered-categories test a χ² on the same
    * table throws away (q86 treats exposure bins as unordered labels;
    * CA weights them by score and detects the monotone dose–response
    * a funnel/engagement analysis is actually after): users binned by
    * view count (scores 0..3 via ⌊views/5⌋ capped at 3 — the corpus's
    * per-user view counts center near 13, so the 5-wide bins populate
    * all four scores), outcome = ever made a HIGH-VALUE purchase
    * (value > 90 — the rare event; "any purchase" is ~1.0 on this
    * corpus and degenerates the table); T = N·Σsᵢrᵢ − R·Σsᵢnᵢ and
    * z = T·√N / √(R(N−R)(N·Σsᵢ²nᵢ − (Σsᵢnᵢ)²)).
    *
    * Determinism: every moment (N, R, Σsr, Σsn, Σs²n) is an exact
    * BIGINT from one bin-frame aggregate; T is an exact BIGINT
    * cross-product; the variance product rides DECIMAL(38) (it
    * overflows BIGINT at ~10⁹ users) and casts to double once for the
    * single z dag. The trend call compares the raw z² dag against the
    * exact double literal 3.8415999999999997 (q201 convention).
    *
    * Scale shape: one corpus user aggregate → ≤4-row score-bin frame;
    * every moment and the dag live on that frame. No windows, no
    * joins past the bin rollup.
    */
  private def q218(s: SparkSession, dir: String): DataFrame = {
    val bins = Tables
      .table(s, dir, "events")
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
        max(
          when(col("event_type") === "purchase" && col("value") > 90.0d, 1L)
            .otherwise(0L)
        ).as("y")
      )
      // views ≥ 0, so truncating div == floor div
      .select(least(expr("views div 5"), lit(3L)).as("sc"), col("y"))
      .groupBy("sc")
      .agg(count(lit(1)).as("n_i"), sum("y").as("r_i"))
    val m = bins.agg(
      sum("n_i").as("nn"),
      sum("r_i").as("rr"),
      sum(col("sc") * col("r_i")).as("ssr"),
      sum(col("sc") * col("n_i")).as("ssn"),
      sum(col("sc") * col("sc") * col("n_i")).as("ss2n")
    )
    m.withColumn("t_num", col("nn") * col("ssr") - col("rr") * col("ssn"))
      .withColumn(
        "var_num",
        (col("rr").cast("decimal(38,0)") * (col("nn") - col("rr")) *
          (col("nn") * col("ss2n") - col("ssn") * col("ssn"))).cast("double")
      )
      .withColumn(
        "z_raw",
        col("t_num").cast("double") * sqrt(col("nn").cast("double")) /
          nullif(sqrt(col("var_num")), lit(0.0d))
      )
      .select(
        col("nn").as("n_users"),
        col("rr").as("n_converted"),
        col("t_num").as("trend_num"),
        (round(col("z_raw"), 6) + 0.0).as("z"),
        (col("z_raw") * col("z_raw") > lit(3.8415999999999997d))
          .as("trend_detected")
      )
  }

  // ------------- q231: Fisher's exact test on the 2×2 conversion table

  /** q231: Fisher's exact test — the EXACT 2×2 independence test the
    * asymptotic machinery (q86 χ², q87 z) silently approximates, and
    * the one that stays valid when a cell is small (a rare-outcome
    * segment cut can leave single-digit cells where the χ²
    * approximation is junk — reviewers ask for Fisher there by name):
    * arms by the q43 user hash × ever made a high-value purchase (the
    * q218 outcome), hypergeometric tail by the standard "all tables
    * with pmf ≤ observed pmf" two-sided rule.
    *
    * Determinism — the whole computation lives on integer grids:
    * ln-factorials are exact BIGINT prefix sums of per-integer
    * floor(ln j·10⁹) over the 0..N integer frame (grid error < N·10⁻⁹
    * in the exponent — far under the round-6 render, and identical on
    * both engines); each table's ln-pmf is pure BIGINT addition of
    * nine lf9 lookups; the tail sums floor(exp(lnpmf)·10¹²) as exact
    * BIGINTs; the significance call is the exact integer compare
    * p12·20 < 10¹². The odds ratio is one guarded division of exact
    * cell products.
    *
    * Scale shape: one corpus user aggregate → a 1-row cell frame; the
    * integer frame is N rows with the q52-convention TWO-LEVEL shard
    * cumulation (never a single-task window over N); the support
    * frame is ≤ min(nA, K) rows with four equi-joins against the lf9
    * frame.
    */
  private def q231(s: SparkSession, dir: String): DataFrame = {
    val users = Tables
      .table(s, dir, "events")
      .groupBy("user_id")
      .agg(
        max(
          when(col("event_type") === "purchase" && col("value") > 90.0d, 1L)
            .otherwise(0L)
        ).as("y")
      )
      .select(
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, 1L)
          .otherwise(0L)
          .as("ia"),
        col("y")
      )
    val cells = users.agg(
      sum(col("ia") * col("y")).as("a"),
      sum(col("ia") * (lit(1L) - col("y"))).as("b"),
      sum((lit(1L) - col("ia")) * col("y")).as("c"),
      sum((lit(1L) - col("ia")) * (lit(1L) - col("y"))).as("d")
    )
    val margins = cells.select(
      col("a"), col("b"), col("c"), col("d"),
      (col("a") + col("b")).as("na"),
      (col("c") + col("d")).as("nb"),
      (col("a") + col("c")).as("kk"),
      (col("b") + col("d")).as("nk"),
      (col("a") + col("b") + col("c") + col("d")).as("n")
    )
    // exact BIGINT ln-factorial table over 0..N: per-integer gridded
    // ln, two-level shard cumulation (j ≥ 0, so truncating div == floor)
    val ints = margins
      .select(explode(sequence(lit(0L), col("n"))).as("j"))
      .withColumn(
        "l9",
        when(col("j") <= 1L, 0L)
          .otherwise(floor(log(col("j").cast("double")) * 1.0e9).cast("long"))
      )
      .withColumn("shard", expr("j div 256"))
    val offs = ints
      .groupBy("shard")
      .agg(sum("l9").as("sl"))
      .withColumn(
        "off",
        coalesce(
          sum("sl").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("shard", "off")
    val localW = Window
      .partitionBy("shard")
      .orderBy("j")
      .rowsBetween(Window.unboundedPreceding, 0)
    val lf = ints
      .join(broadcast(offs), "shard")
      .withColumn("lf9", col("off") + sum("l9").over(localW))
      .select("j", "lf9")
    def lfOf(df: DataFrame, key: String, as: String): DataFrame =
      df.join(
        lf.select(col("j").as(key + "_j"), col("lf9").as(as)),
        col(key) === col(key + "_j")
      ).drop(key + "_j")
    // the five margin lookups fold into one broadcast constant
    val const9 = lfOf(
      lfOf(lfOf(lfOf(lfOf(margins, "na", "l_na"), "nb", "l_nb"), "kk", "l_k"),
        "nk", "l_nk"),
      "n", "l_n"
    ).withColumn(
      "const9",
      col("l_na") + col("l_nb") + col("l_k") + col("l_nk") - col("l_n")
    )
    val ks = const9
      .select(
        col("a"), col("b"), col("c"), col("d"),
        col("na"), col("nb"), col("kk"), col("n"), col("const9"),
        explode(
          sequence(greatest(lit(0L), col("kk") - col("nb")), least(col("na"), col("kk")))
        ).as("k")
      )
      .withColumn("ak", col("na") - col("k"))
      .withColumn("kx", col("kk") - col("k"))
      .withColumn("bk", col("nb") - col("kk") + col("k"))
    val pmf = lfOf(lfOf(lfOf(lfOf(ks, "k", "l_1"), "ak", "l_2"), "kx", "l_3"), "bk", "l_4")
      .withColumn(
        "lnp9",
        col("const9") - col("l_1") - col("l_2") - col("l_3") - col("l_4")
      )
      .withColumn(
        "e12",
        floor(exp(col("lnp9").cast("double") / 1.0e9) * 1.0e12).cast("long")
      )
    val obs = pmf
      .filter(col("k") === col("a"))
      .select(col("lnp9").as("obs9"))
    pmf
      .crossJoin(broadcast(obs))
      .filter(col("lnp9") <= col("obs9"))
      .groupBy("a", "b", "c", "d")
      .agg(sum("e12").as("p12"))
      .select(
        col("a").as("n_a"), col("b").as("n_b"),
        col("c").as("n_c"), col("d").as("n_d"),
        (round(
          (col("a") * col("d")).cast("double") /
            nullif((col("b") * col("c")).cast("double"), lit(0.0d)),
          6
        ) + 0.0).as("odds_ratio"),
        (round(col("p12").cast("double") / 1.0e12, 6) + 0.0).as("p_two_sided"),
        (col("p12") * 20 < 1000000000000L).as("significant")
      )
  }

  // ------------- q237: Kruskal–Wallis H (k-sample rank test)

  /** q237: Kruskal–Wallis H — the k-SAMPLE extension of q150's
    * Mann–Whitney ("is ANY of these four cohorts' value distribution
    * shifted"), the nonparametric one-way ANOVA that replaces q146/q216
    * when revenue-like tails break normality: rank all N values
    * jointly, H = 12/(N(N+1))·Σⱼ R²ⱼ/nⱼ − 3(N+1), tie-corrected by
    * C = 1 − Σ(t³−t)/(N³−N), compared against χ²₃(0.95). Four arms are
    * the md5 user-bucket quartiles (the q43 split convention), so the
    * expected answer on this synthetic corpus is "no shift" — the gate
    * pins the MACHINERY, not a planted effect.
    *
    * Exactness contract (the q150 lesson, extended to k groups): rank
    * sums are NEVER float midranks — per distinct centivalue with arm
    * counts c₀..c₃, total t, and strict-below total lt_all, the
    * doubled midrank 2·m = 2·lt_all + t + 1 is an exact INTEGER, so
    * 2·Rⱼ = Σ_v cⱼᵥ·(2·lt_all + t + 1) stays exact (DECIMAL(38) sums);
    * Σ(t³−t) and N³−N identically. All four (2Rⱼ)², the 1/nⱼ
    * divisions, and the tie ratio form ONE literal-order IEEE dag cast
    * from the exact integers once, spelled identically in the oracle;
    * the significance call compares the raw tie-corrected dag against
    * the exact double literal 7.814727903251179 (χ²₃ 0.95 — the q216
    * raw-dag convention).
    *
    * Scale shape: one corpus hash aggregate → per-distinct-centivalue
    * arm counts (value-frame bounded); the strict-below cumulation is
    * the q111/q150 TWO-LEVEL shard pattern (global window only over
    * ≤ range/256 shard subtotals); one-row output. Identity check
    * Σⱼ 2Rⱼ = N(N+1) rides the output as exact integers.
    */
  private def q237(s: SparkSession, dir: String): DataFrame = {
    val b = graft.llm.Sampling.bucket100(col("user_id"))
    val perVal = Tables
      .table(s, dir, "events")
      .select(
        round(col("value") * 100.0, 0).cast("long").as("vc"),
        when(b < 25, 0).when(b < 50, 1).when(b < 75, 2).otherwise(3).as("g")
      )
      .groupBy("vc")
      .agg(
        sum(when(col("g") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("g") === 2, 1L).otherwise(0L)).as("c2"),
        sum(when(col("g") === 3, 1L).otherwise(0L)).as("c3"),
        count(lit(1)).as("t")
      )
      .withColumn("shard", expr("(vc - pmod(vc, 256)) div 256"))
    val offsets = perVal
      .groupBy("shard")
      .agg(sum("t").as("st"))
      .withColumn(
        "off",
        coalesce(
          sum("st").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("shard", "off")
    val localEx = Window
      .partitionBy("shard")
      .orderBy("vc")
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = perVal
      .join(broadcast(offsets), "shard")
      .withColumn(
        "mr2",
        (col("off") + coalesce(sum("t").over(localEx), lit(0L))) * 2 +
          col("t") + 1
      )
      .agg(
        sum("t").as("n"),
        sum("c0").as("n0"),
        sum("c1").as("n1"),
        sum("c2").as("n2"),
        sum("c3").as("n3"),
        sum((col("c0") * col("mr2")).cast("decimal(38,0)")).as("r2_0d"),
        sum((col("c1") * col("mr2")).cast("decimal(38,0)")).as("r2_1d"),
        sum((col("c2") * col("mr2")).cast("decimal(38,0)")).as("r2_2d"),
        sum((col("c3") * col("mr2")).cast("decimal(38,0)")).as("r2_3d"),
        sum(
          (col("t").cast("decimal(12,0)") * col("t") * col("t") - col("t"))
            .cast("decimal(38,0)")
        ).as("t3t")
      )
      .withColumn(
        "n3n",
        (col("n").cast("decimal(12,0)") * col("n") * col("n") - col("n"))
          .cast("decimal(38,0)")
      )
    val nd = col("n").cast("double")
    def term(r2: String, nj: String): org.apache.spark.sql.Column =
      col(r2).cast("double") * col(r2).cast("double") /
        col(nj).cast("double")
    agg
      .withColumn(
        "h_raw",
        lit(3.0d) * (term("r2_0d", "n0") + term("r2_1d", "n1") +
          term("r2_2d", "n2") + term("r2_3d", "n3")) /
          (nd * (nd + 1.0d)) - lit(3.0d) * (nd + 1.0d)
      )
      .withColumn(
        "h_tied_raw",
        col("h_raw") * col("n3n").cast("double") /
          (col("n3n") - col("t3t")).cast("double")
      )
      .select(
        col("n"),
        col("n0"),
        col("n1"),
        col("n2"),
        col("n3"),
        col("r2_0d").cast("long").as("r2_0"),
        col("r2_1d").cast("long").as("r2_1"),
        col("r2_2d").cast("long").as("r2_2"),
        col("r2_3d").cast("long").as("r2_3"),
        (round(col("h_raw"), 4) + 0.0).as("h_stat"),
        (round(col("h_tied_raw"), 4) + 0.0).as("h_tied"),
        col("h_tied_raw").gt(lit(7.814727903251179d)).as("significant")
      )
  }

  // ------------- q239: CUPED variance-reduced treatment effect

  /** q239: CUPED (Controlled-experiment Using Pre-Experiment Data) —
    * the variance-reduction adjustment every mature experimentation
    * platform applies before reading q87's z: the user's PRE-period
    * metric x is uncorrelated with assignment but correlated with the
    * post-period metric y, so ỹ = y − θ(x − x̄) with θ = cov(x,y)/var(x)
    * keeps the treatment effect unbiased while shrinking variance by
    * exactly ρ² — the same experiment reaches significance on ρ²-fold
    * less traffic. Pre/post split at the corpus calendar midpoint
    * ((min+max) div 2 on epoch-µs — exact integer), arms the q43 md5
    * halves, per-user metrics exact centi-sums.
    *
    * Determinism: the user frame is exact integers; all six moments
    * (n, Σx, Σy, Σxy, Σxx, Σyy) are DECIMAL(38) exact sums of LONG
    * products; θ's numerator n·Σxy − Σx·Σy and denominator n·Σxx −
    * (Σx)² stay exact integer arithmetic cast to double ONCE; the
    * variance-reduction factor is the closed form ρ² = num²/(den·deny)
    * (var(y−θx) = var(y) − cov²/var(x) at the optimal θ — no second
    * pass over users); per-arm adjusted means need only arm sums +
    * pooled θ. One literal-order IEEE dag, round-6 renders.
    *
    * Scale shape: one corpus pass → per-user aggregate (user-bounded);
    * the calendar cut is a broadcast 1-row frame; moments + per-arm
    * sums are two aggregates over the user frame; one-row output. The
    * per-user LONG products hold while per-user centi-sums < 3·10⁹
    * (9·10¹⁸ product ceiling) — beyond that the sums themselves move
    * to DECIMAL, same shape.
    */
  private def q239(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .table(s, dir, "events")
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100.0, 0).cast("long").as("vc")
      )
    val cut = ev.selectExpr("(min(us) + max(us)) div 2 as cut_us")
    val user = ev
      .crossJoin(broadcast(cut))
      .groupBy("user_id")
      .agg(
        sum(when(col("us") < col("cut_us"), col("vc")).otherwise(0L)).as("x"),
        sum(when(col("us") >= col("cut_us"), col("vc")).otherwise(0L)).as("y")
      )
      .withColumn(
        "ia",
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, 1L)
          .otherwise(0L)
      )
    val mom = user.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
      sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
      sum("ia").as("na"),
      sum((col("x") * col("ia")).cast("decimal(38,0)")).as("sxa"),
      sum((col("y") * col("ia")).cast("decimal(38,0)")).as("sya")
    )
    mom
      .withColumn("nb", col("n") - col("na"))
      .withColumn("sxb", col("sx") - col("sxa"))
      .withColumn("syb", col("sy") - col("sya"))
      .withColumn(
        "num_d",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
      )
      .withColumn(
        "den_d",
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
      )
      .withColumn(
        "deny_d",
        (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
      )
      .withColumn("theta_raw", col("num_d") / nullif(col("den_d"), lit(0.0d)))
      .withColumn(
        "diff_raw_c",
        col("sya").cast("double") / col("na").cast("double") -
          col("syb").cast("double") / col("nb").cast("double")
      )
      .withColumn(
        "dx_c",
        col("sxa").cast("double") / col("na").cast("double") -
          col("sxb").cast("double") / col("nb").cast("double")
      )
      .select(
        col("n").as("n_users"),
        col("na").as("n_a"),
        col("nb").as("n_b"),
        (round(col("theta_raw"), 6) + 0.0).as("theta"),
        (round(col("diff_raw_c") / 100.0d, 6) + 0.0).as("diff_raw"),
        (round(
          (col("diff_raw_c") - col("theta_raw") * col("dx_c")) / 100.0d,
          6
        ) + 0.0).as("diff_cuped"),
        (round(
          col("num_d") * col("num_d") /
            nullif(col("den_d") * col("deny_d"), lit(0.0d)),
          6
        ) + 0.0).as("var_reduction")
      )
  }

  /** q243: difference-in-differences — the quasi-experimental estimate
    * an analyst reaches for when assignment wasn't randomized at t₀:
    * compare each arm's pre→post CHANGE so any level difference between
    * the arms (and any common shock over time) cancels, leaving
    * DiD = (ȳ_post^A − ȳ_pre^A) − (ȳ_post^B − ȳ_pre^B). With per-user
    * panels this is exactly a two-sample Welch t on the user-level
    * first differences dᵤ = yᵤ − xᵤ — the companion of q239 (CUPED
    * adjusts by a FITTED θ; DiD pins θ = 1), sharing its frame: the
    * exact epoch-µs midpoint pre/post cut, per-user exact centi sums,
    * md5-bucket arms.
    *
    * Determinism: dᵤ is an exact BIGINT; all per-arm moments (Σd, Σd²)
    * are DECIMAL(38) exact; the four cell means, the DiD point, the
    * Welch SE, and t are IEEE dags of those exact integers spelled
    * identically on both engines, round-6; the significance flag
    * compares the RAW t dag against the 1.96 literal (the q237
    * convention) so rounding can never flip it.
    *
    * Scale shape: one corpus pass → one user-keyed aggregate → a
    * single 9-moment global aggregate → one-row output. Nothing after
    * the user frame depends on corpus size.
    */
  private def q243(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .table(s, dir, "events")
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100.0, 0).cast("long").as("vc")
      )
    val cut = ev.selectExpr("(min(us) + max(us)) div 2 as cut_us")
    val user = ev
      .crossJoin(broadcast(cut))
      .groupBy("user_id")
      .agg(
        sum(when(col("us") < col("cut_us"), col("vc")).otherwise(0L)).as("x"),
        sum(when(col("us") >= col("cut_us"), col("vc")).otherwise(0L)).as("y")
      )
      .withColumn("d", col("y") - col("x"))
      .withColumn(
        "ia",
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, 1L)
          .otherwise(0L)
      )
    user
      .agg(
        sum("ia").as("na"),
        sum(lit(1L) - col("ia")).as("nb"),
        sum((col("x") * col("ia")).cast("decimal(38,0)")).as("sxa"),
        sum((col("y") * col("ia")).cast("decimal(38,0)")).as("sya"),
        sum((col("x") * (lit(1L) - col("ia"))).cast("decimal(38,0)")).as("sxb"),
        sum((col("y") * (lit(1L) - col("ia"))).cast("decimal(38,0)")).as("syb"),
        sum((col("d") * col("ia")).cast("decimal(38,0)")).as("sda"),
        sum((col("d") * (lit(1L) - col("ia"))).cast("decimal(38,0)")).as("sdb"),
        sum((col("d") * col("d") * col("ia")).cast("decimal(38,0)")).as("sdda"),
        sum((col("d") * col("d") * (lit(1L) - col("ia"))).cast("decimal(38,0)"))
          .as("sddb")
      )
      .withColumn(
        "va",
        (col("na") * col("sdda") - col("sda") * col("sda")).cast("double") /
          (col("na") * (col("na") - 1)).cast("double")
      )
      .withColumn(
        "vb",
        (col("nb") * col("sddb") - col("sdb") * col("sdb")).cast("double") /
          (col("nb") * (col("nb") - 1)).cast("double")
      )
      .withColumn(
        "did_c",
        col("sda").cast("double") / col("na").cast("double") -
          col("sdb").cast("double") / col("nb").cast("double")
      )
      .withColumn(
        "se_c",
        sqrt(
          col("va") / col("na").cast("double") +
            col("vb") / col("nb").cast("double")
        )
      )
      .withColumn("t_raw", col("did_c") / nullif(col("se_c"), lit(0.0d)))
      .select(
        col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        (round(col("sxa").cast("double") / col("na").cast("double") / 100.0d, 6)
          + 0.0).as("pre_a"),
        (round(col("sya").cast("double") / col("na").cast("double") / 100.0d, 6)
          + 0.0).as("post_a"),
        (round(col("sxb").cast("double") / col("nb").cast("double") / 100.0d, 6)
          + 0.0).as("pre_b"),
        (round(col("syb").cast("double") / col("nb").cast("double") / 100.0d, 6)
          + 0.0).as("post_b"),
        (round(col("did_c") / 100.0d, 6) + 0.0).as("did"),
        (round(col("se_c") / 100.0d, 6) + 0.0).as("se"),
        (round(col("t_raw"), 4) + 0.0).as("t_stat"),
        (abs(col("t_raw")) > lit(1.96d)).as("significant")
      )
  }

  /** q245: Wald–Wolfowitz runs test — "is the daily revenue series
    * RANDOM about its median, or does it trend/cluster" — the
    * order-only randomness screen that needs no distributional
    * assumption at all (q214's Mann–Kendall asks for monotone trend;
    * the runs test flags ANY serial clustering: too FEW runs = sticky
    * regimes, too MANY = oscillation): days above the median and days
    * not-above form a binary sequence; R = number of maximal runs;
    * under randomness E[R] = 1 + 2n₁n₂/n and
    * Var[R] = 2n₁n₂(2n₁n₂−n)/(n²(n−1)).
    *
    * Determinism: the median is the exact ⌈n/2⌉-th order statistic of
    * the centi daily sums (an integer — row_number pick, tie-order
    * irrelevant to the k-th value); ties AT the median are dropped per
    * the standard test; run starts count exactly via lag(); n₁, n₂, R
    * and every moment product are exact BIGINTs cast to double once
    * for the single z dag; the randomness flag compares the RAW |z|
    * dag against the 1.96 literal.
    *
    * Scale shape: one corpus pass → the calendar-bounded daily frame;
    * the median pick, sign/lag walk, and run count all run over that
    * ≤ observation-window-days frame (the q156 allowlist convention).
    * One-row output.
    */
  private def q245(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .table(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
    val nTot = daily.agg(count(lit(1)).as("n_all"))
    val med = daily
      .withColumn("rn", row_number().over(Window.orderBy("sv", "d")))
      .crossJoin(broadcast(nTot))
      .filter(col("rn") === expr("(n_all + 1) div 2"))
      .select(col("sv").as("med"))
    val signs = daily
      .crossJoin(broadcast(med))
      .filter(col("sv") =!= col("med"))
      .withColumn("above", (col("sv") > col("med")).cast("long"))
      .withColumn("prev", lag("above", 1).over(Window.orderBy("d")))
      .withColumn(
        "start",
        when(col("prev").isNull || col("prev") =!= col("above"), 1L)
          .otherwise(0L)
      )
    signs
      .agg(
        sum("above").as("n1"),
        sum(lit(1L) - col("above")).as("n2"),
        sum("start").as("r")
      )
      .withColumn("n", col("n1") + col("n2"))
      .withColumn(
        "mu",
        lit(1.0d) +
          (lit(2L) * col("n1") * col("n2")).cast("double") /
          col("n").cast("double")
      )
      .withColumn(
        "va",
        (lit(2L) * col("n1") * col("n2") *
          (lit(2L) * col("n1") * col("n2") - col("n"))).cast("double") /
          (col("n") * col("n") * (col("n") - 1)).cast("double")
      )
      .withColumn(
        "z_raw",
        (col("r").cast("double") - col("mu")) /
          nullif(sqrt(col("va")), lit(0.0d))
      )
      .select(
        col("n").as("n_days"),
        col("n1").as("n_above"),
        col("n2").as("n_below"),
        col("r").as("n_runs"),
        (round(col("z_raw"), 4) + 0.0).as("z"),
        (abs(col("z_raw")) <= lit(1.96d)).as("looks_random")
      )
  }

  /** q246: Hodges–Lehmann pseudo-median of the per-user event count —
    * the location estimator the Wilcoxon signed-rank test inverts to
    * (median of all n(n+1)/2 pairwise Walsh averages (xᵢ+xⱼ)/2):
    * robust like the median (25% breakdown) but far more efficient on
    * near-symmetric data (~96% vs the mean, where the plain median
    * manages 64%) — the right center for a skew-prone engagement
    * metric that q68's MAD screens but never summarizes.
    *
    * Determinism: counts are integers, so the pair universe collapses
    * onto the VALUE frame — for distinct values vᵢ ≤ vⱼ with counts
    * cᵢ, cⱼ the Walsh SUM vᵢ+vⱼ (the ×2 grid — never /2 in float)
    * carries exact weight cᵢ·cⱼ (i<j) or cᵢ(cᵢ+1)/2 (i=j); the
    * weighted median of that multiset comes off an exact cumsum at
    * ranks ⌈M/2⌉ and ⌊M/2⌋+1, and the estimator is (ws₁+ws₂)/4 — an
    * exact quarter-integer.
    *
    * Scale shape: one user aggregate → the distinct-count VALUE frame
    * (≲ hundreds of rows by construction); the d² Walsh pair frame and
    * its cumsum never touch corpus size (the q33b convention squared).
    * One-row output.
    */
  private def q246(s: SparkSession, dir: String): DataFrame = {
    val vf = Tables
      .table(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("v"))
      .groupBy("v")
      .agg(count(lit(1)).as("c"))
    val tot = vf
      .agg(
        sum("c").as("n_users"),
        sum((col("v") * col("c")).cast("decimal(38,0)")).cast("long").as("sv")
      )
      .withColumn("m_pairs", expr("n_users * (n_users + 1) div 2"))
    val pairs = vf
      .as("a")
      .join(vf.as("b"), col("a.v") <= col("b.v"))
      .select(
        (col("a.v") + col("b.v")).as("ws"),
        when(col("a.v") < col("b.v"), col("a.c") * col("b.c"))
          .otherwise(expr("a.c * (a.c + 1) div 2"))
          .as("w")
      )
      .groupBy("ws")
      .agg(sum("w").as("w"))
      .withColumn(
        "cum",
        sum("w").over(
          Window.orderBy("ws").rowsBetween(Window.unboundedPreceding, 0)
        )
      )
    val picks = pairs
      .crossJoin(broadcast(tot))
      .agg(
        min(when(col("cum") >= expr("(m_pairs + 1) div 2"), col("ws"))).as("ws1"),
        min(when(col("cum") >= expr("m_pairs div 2 + 1"), col("ws"))).as("ws2"),
        max("n_users").as("n_users"),
        max("m_pairs").as("m_pairs"),
        max("sv").as("sv")
      )
    picks.select(
      col("n_users"),
      col("m_pairs"),
      ((col("ws1") + col("ws2")).cast("double") / 4.0d + 0.0)
        .as("hl_pseudomedian"),
      (round(col("sv").cast("double") / col("n_users").cast("double"), 6)
        + 0.0).as("mean_count")
    )
  }

  /** q247: peaks-over-threshold GPD tail fit — the extreme-value
    * question the bulk statistics can never answer ("how big is the
    * 1-in-100k event?") gets the principled answer: exceedances over a
    * high threshold converge to a Generalized Pareto Distribution
    * (Pickands–Balkema–de Haan), so fit (ξ, σ) to the P95 exceedances
    * by method of moments — ξ̂ = ½(1 − m²/s²), σ̂ = m(1−ξ̂) — and read
    * the N-observation return level x_N = u + σ/ξ·((N·ζᵤ)^ξ − 1),
    * ζᵤ = P(X>u). The ξ sign is the headline: ξ>0 heavy tail (no
    * moment cap), ξ<0 bounded tail, ξ≈0 exponential.
    *
    * Determinism: the threshold is the exact ⌈0.95n⌉-th order
    * statistic picked off the per-VALUE centi cumsum; exceedance
    * moments Σc·e, Σc·e² are exact integers off the SAME value frame
    * (no second corpus pass); m, s², ξ, σ and the return level are one
    * IEEE dag of those integers with the power spelled exp(ξ·ln(Nζ))
    * identically on both engines, round-6/round-4.
    *
    * Scale shape: one corpus pass → the per-VALUE centi count frame
    * (≤ value-range grid points, the q33b convention); threshold pick,
    * exceedance moments, and the fit all run on that frame. One-row
    * output.
    */
  private def q247(s: SparkSession, dir: String): DataFrame = {
    val retN = 100000.0d
    val vf = Tables
      .table(s, dir, "events")
      .select(round(col("value") * 100.0, 0).cast("long").as("vc"))
      .groupBy("vc")
      .agg(count(lit(1)).as("c"))
      .withColumn(
        "cum",
        sum("c").over(
          Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
        )
      )
    val tot = vf.agg(sum("c").as("n"))
    val u = vf
      .crossJoin(broadcast(tot))
      .filter(col("cum") >= expr("(95 * n + 99) div 100"))
      .agg(min("vc").as("u"))
    val mom = vf
      .crossJoin(broadcast(u))
      .filter(col("vc") > col("u"))
      .select(col("c"), (col("vc") - col("u")).as("e"), col("u"))
      .agg(
        max("u").as("u"),
        sum("c").as("ne"),
        sum((col("c") * col("e")).cast("decimal(38,0)")).as("se"),
        sum((col("c") * col("e") * col("e")).cast("decimal(38,0)")).as("see")
      )
    mom
      .crossJoin(broadcast(tot))
      .withColumn("m", col("se").cast("double") / col("ne").cast("double"))
      .withColumn(
        "v",
        (col("ne") * col("see") - col("se") * col("se")).cast("double") /
          (col("ne") * (col("ne") - 1)).cast("double")
      )
      .withColumn(
        "xi",
        lit(0.5d) * (lit(1.0d) - col("m") * col("m") / nullif(col("v"), lit(0.0d)))
      )
      .withColumn("sigma", col("m") * (lit(1.0d) - col("xi")))
      .withColumn(
        "zeta",
        col("ne").cast("double") / col("n").cast("double")
      )
      .withColumn(
        "rl",
        col("u").cast("double") + col("sigma") / nullif(col("xi"), lit(0.0d)) *
          (exp(col("xi") * log(lit(retN) * col("zeta"))) - lit(1.0d))
      )
      .select(
        (col("u").cast("double") / 100.0d + 0.0).as("threshold"),
        col("ne").as("n_exceed"),
        (round(col("xi"), 6) + 0.0).as("xi"),
        (round(col("sigma") / 100.0d, 6) + 0.0).as("sigma"),
        (round(col("rl") / 100.0d, 4) + 0.0).as("return_level_100k")
      )
  }

  /** q248: coarsened exact matching (CEM) ATT — the causal trio's
    * matching member (q239 CUPED adjusts variance, q243 DiD differences
    * out levels; CEM fixes CONFOUNDING when heavy pre-period users are
    * over-represented in one arm): coarsen the confounder (pre-period
    * event count) into its exact quartile bins, match treated and
    * control WITHIN each bin, and weight per-stratum effects by the
    * treated counts — ATT = Σₛ n_Tˢ(ȳ_Tˢ − ȳ_Cˢ)/Σₛ n_Tˢ over strata
    * holding both arms. The unadjusted diff rides along so the
    * confounding correction is visible.
    *
    * Determinism: quartile thresholds are exact ⌈qn/4⌉-th order
    * statistics off the pre-count VALUE frame cumsum; per-stratum
    * counts/sums are exact integers; each stratum's weighted effect is
    * floor-snapped to the 1e6 centi grid as a BIGINT so the ≤4-term
    * ATT sum NEVER order-floats (the q244 discipline), then one
    * division.
    *
    * Scale shape: one corpus pass → one user aggregate → the
    * distinct-pre-count VALUE frame for thresholds → a ≤4-row stratum
    * frame. One-row output.
    */
  private def q248(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .table(s, dir, "events")
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100.0, 0).cast("long").as("vc")
      )
    val cut = ev.selectExpr("(min(us) + max(us)) div 2 as cut_us")
    val user = ev
      .crossJoin(broadcast(cut))
      .groupBy("user_id")
      .agg(
        sum(when(col("us") < col("cut_us"), 1L).otherwise(0L)).as("pc"),
        sum(when(col("us") >= col("cut_us"), col("vc")).otherwise(0L)).as("y")
      )
      .withColumn(
        "ia",
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, 1L)
          .otherwise(0L)
      )
    val vf = user
      .groupBy("pc")
      .agg(count(lit(1)).as("c"))
      .withColumn(
        "cum",
        sum("c").over(
          Window.orderBy("pc").rowsBetween(Window.unboundedPreceding, 0)
        )
      )
    val nTot = user.agg(count(lit(1)).as("n"))
    val th = vf
      .crossJoin(broadcast(nTot))
      .agg(
        min(when(col("cum") >= expr("(n + 3) div 4"), col("pc"))).as("t1"),
        min(when(col("cum") >= expr("(2 * n + 3) div 4"), col("pc"))).as("t2"),
        min(when(col("cum") >= expr("(3 * n + 3) div 4"), col("pc"))).as("t3")
      )
    val strata = user
      .crossJoin(broadcast(th))
      .withColumn(
        "bin",
        lit(1) + (col("pc") > col("t1")).cast("int") +
          (col("pc") > col("t2")).cast("int") +
          (col("pc") > col("t3")).cast("int")
      )
      .groupBy("bin")
      .agg(
        sum("ia").as("nt"),
        sum(lit(1L) - col("ia")).as("nc"),
        sum((col("y") * col("ia")).cast("decimal(38,0)")).as("syt"),
        sum((col("y") * (lit(1L) - col("ia"))).cast("decimal(38,0)")).as("syc")
      )
      .filter(col("nt") > 0 && col("nc") > 0)
      .withColumn(
        "eff_c",
        col("syt").cast("double") / col("nt").cast("double") -
          col("syc").cast("double") / col("nc").cast("double")
      )
      .withColumn(
        "term6",
        floor(col("nt").cast("double") * col("eff_c") * 1.0e6).cast("long")
      )
    val naive = user.agg(
      sum("ia").as("nta"),
      sum(lit(1L) - col("ia")).as("nca"),
      sum((col("y") * col("ia")).cast("decimal(38,0)")).as("syta"),
      sum((col("y") * (lit(1L) - col("ia"))).cast("decimal(38,0)")).as("syca")
    )
    strata
      .agg(
        count(lit(1)).as("n_strata"),
        sum("nt").as("n_t"),
        sum("nc").as("n_c"),
        sum("term6").as("sum6")
      )
      .crossJoin(broadcast(naive))
      .select(
        col("n_strata"),
        col("n_t"),
        col("n_c"),
        (round(
          col("sum6").cast("double") /
            (col("n_t").cast("double") * 1.0e6) / 100.0d,
          4
        ) + 0.0).as("att"),
        (round(
          (col("syta").cast("double") / col("nta").cast("double") -
            col("syca").cast("double") / col("nca").cast("double")) / 100.0d,
          4
        ) + 0.0).as("naive_diff")
      )
  }

  /** q249: ridge regression path — q120's closed-form two-regressor OLS
    * with an L2 penalty swept over three λ values, the regularization
    * every feature pipeline applies when regressors collide (here
    * quantity and discount): β̂ = (XᶜᵀXᶜ + λI)⁻¹Xᶜᵀy is the SAME
    * centered Cramer solve with λ on the diagonal, and the output path
    * (λ = 0, 5%·tr, 50%·tr of the covariance trace) makes the
    * coefficient shrinkage — ridge's entire point — visible in one
    * three-row frame.
    *
    * Determinism: the nine moments are q120's exact DECIMAL(38)
    * integers unscaled by fixed powers of ten; λ derives from the
    * centered trace by the two literal factors; each β is the same
    * Cramer dag as q120 with (c11+λ)(c22+λ) − c12² in the
    * denominator, round-6.
    *
    * Scale shape: ONE aggregate over the corpus (the q120 pass), then
    * a 3-row λ explode on the single moment row. Three-row output.
    */
  private def q249(s: SparkSession, dir: String): DataFrame = {
    val m = Tables
      .table(s, dir, "lineitem")
      .select(
        round(col("l_quantity") * 100.0, 0).cast("long").as("x1c"),
        round(col("l_discount") * 10000.0, 0).cast("long").as("x2m"),
        round(col("l_extendedprice") * 100.0, 0).cast("long").as("yc")
      )
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x1c").cast("decimal(38,0)")).cast("double").as("rs1"),
        sum(col("x2m").cast("decimal(38,0)")).cast("double").as("rs2"),
        sum(col("yc").cast("decimal(38,0)")).cast("double").as("rsy"),
        sum((col("x1c") * col("x1c")).cast("decimal(38,0)")).cast("double").as("rs11"),
        sum((col("x1c") * col("x2m")).cast("decimal(38,0)")).cast("double").as("rs12"),
        sum((col("x2m") * col("x2m")).cast("decimal(38,0)")).cast("double").as("rs22"),
        sum((col("x1c") * col("yc")).cast("decimal(38,0)")).cast("double").as("rs1y"),
        sum((col("x2m") * col("yc")).cast("decimal(38,0)")).cast("double").as("rs2y")
      )
      .withColumn("s1", col("rs1") / 1.0e2)
      .withColumn("s2", col("rs2") / 1.0e4)
      .withColumn("sy", col("rsy") / 1.0e2)
      .withColumn("s11", col("rs11") / 1.0e4)
      .withColumn("s12", col("rs12") / 1.0e6)
      .withColumn("s22", col("rs22") / 1.0e8)
      .withColumn("s1y", col("rs1y") / 1.0e4)
      .withColumn("s2y", col("rs2y") / 1.0e6)
      .withColumn("c11", col("s11") - col("s1") * col("s1") / col("n"))
      .withColumn("c12", col("s12") - col("s1") * col("s2") / col("n"))
      .withColumn("c22", col("s22") - col("s2") * col("s2") / col("n"))
      .withColumn("c1y", col("s1y") - col("s1") * col("sy") / col("n"))
      .withColumn("c2y", col("s2y") - col("s2") * col("sy") / col("n"))
      .withColumn("tr", col("c11") + col("c22"))
    m.select(
      col("*"),
      explode(
        array(
          struct(lit("l0_none").as("lambda_id"), lit(0.0d).as("f")),
          struct(lit("l1_light").as("lambda_id"), lit(0.05d).as("f")),
          struct(lit("l2_heavy").as("lambda_id"), lit(0.5d).as("f"))
        )
      ).as("lam")
    ).withColumn("lmb", col("lam.f") * col("tr"))
      .withColumn(
        "det",
        (col("c11") + col("lmb")) * (col("c22") + col("lmb")) -
          col("c12") * col("c12")
      )
      .withColumn(
        "b1",
        (col("c1y") * (col("c22") + col("lmb")) - col("c2y") * col("c12"))
          / nullif(col("det"), lit(0.0))
      )
      .withColumn(
        "b2",
        (col("c2y") * (col("c11") + col("lmb")) - col("c1y") * col("c12"))
          / nullif(col("det"), lit(0.0))
      )
      .select(
        col("lam.lambda_id").as("lambda_id"),
        (round(col("lmb"), 4) + 0.0).as("lambda"),
        (round(col("b1"), 6) + 0.0).as("beta1"),
        (round(col("b2"), 6) + 0.0).as("beta2"),
        (round(sqrt(col("b1") * col("b1") + col("b2") * col("b2")), 6) + 0.0)
          .as("l2_norm")
      )
      .orderBy("lambda_id")
  }

  /** q251: Mantel–Haenszel pooled odds ratio + Cochran–Mantel–Haenszel
    * χ² — "does the arm move conversion AFTER controlling for the
    * confounder" — the stratified 2×2 analysis that q86's marginal χ²
    * gets wrong under Simpson's paradox (a confounder correlated with
    * both arm exposure and conversion flips the pooled table): strata
    * are the q248 pre-activity quartile bins; per stratum the 2×2 is
    * arm × "post purchases exceeded pre purchases" (deliberately
    * non-saturating — EVERY user on this corpus purchases in both
    * halves, so "any purchase" would degenerate to b = d = 0);
    * OR_MH = Σaᵢdᵢ/nᵢ ÷ Σbᵢcᵢ/nᵢ and
    * CMH χ² = (Σ(aᵢ−Eᵢ))²/ΣVᵢ with the exact hypergeometric moments.
    *
    * Determinism: cell counts are exact; each stratum's ad/n, bc/n,
    * a−E, and V term is floor-snapped to the 1e9 grid as a BIGINT so
    * the ≤4-term sums NEVER order-float (the q244/q248 discipline);
    * OR and χ² are single divisions of those exact integers; the
    * significance flag compares the RAW χ² dag to the exact
    * χ²₁(0.95) literal.
    *
    * Scale shape: q248's user frame + threshold pick, then a ≤4-row
    * stratum frame. One-row output.
    */
  private def q251(s: SparkSession, dir: String): DataFrame = {
    val chi2_1_95 = 3.841458820694124
    val ev = Tables
      .table(s, dir, "events")
      .select(
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us")
      )
    val cut = ev.selectExpr("(min(us) + max(us)) div 2 as cut_us")
    val user = ev
      .crossJoin(broadcast(cut))
      .groupBy("user_id")
      .agg(
        sum(when(col("us") < col("cut_us"), 1L).otherwise(0L)).as("pc"),
        when(
          sum(
            when(
              col("us") >= col("cut_us") && col("event_type") === "purchase",
              1L
            ).otherwise(0L)
          ) > sum(
            when(
              col("us") < col("cut_us") && col("event_type") === "purchase",
              1L
            ).otherwise(0L)
          ),
          1L
        ).otherwise(0L).as("o")
      )
      .withColumn(
        "ia",
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, 1L)
          .otherwise(0L)
      )
    val vf = user
      .groupBy("pc")
      .agg(count(lit(1)).as("c"))
      .withColumn(
        "cum",
        sum("c").over(
          Window.orderBy("pc").rowsBetween(Window.unboundedPreceding, 0)
        )
      )
    val nTot = user.agg(count(lit(1)).as("n"))
    val th = vf
      .crossJoin(broadcast(nTot))
      .agg(
        min(when(col("cum") >= expr("(n + 3) div 4"), col("pc"))).as("t1"),
        min(when(col("cum") >= expr("(2 * n + 3) div 4"), col("pc"))).as("t2"),
        min(when(col("cum") >= expr("(3 * n + 3) div 4"), col("pc"))).as("t3")
      )
    val cells = user
      .crossJoin(broadcast(th))
      .withColumn(
        "bin",
        lit(1) + (col("pc") > col("t1")).cast("int") +
          (col("pc") > col("t2")).cast("int") +
          (col("pc") > col("t3")).cast("int")
      )
      .groupBy("bin")
      .agg(
        sum(col("ia") * col("o")).as("a"),
        sum(col("ia") * (lit(1L) - col("o"))).as("b"),
        sum((lit(1L) - col("ia")) * col("o")).as("cc"),
        sum((lit(1L) - col("ia")) * (lit(1L) - col("o"))).as("d")
      )
      .withColumn("nn", col("a") + col("b") + col("cc") + col("d"))
      .withColumn(
        "ad9",
        floor((col("a") * col("d")).cast("double") / col("nn").cast("double") * 1.0e9)
          .cast("long")
      )
      .withColumn(
        "bc9",
        floor((col("b") * col("cc")).cast("double") / col("nn").cast("double") * 1.0e9)
          .cast("long")
      )
      .withColumn(
        "e9",
        floor(
          (col("a").cast("double") -
            ((col("a") + col("b")) * (col("a") + col("cc"))).cast("double") /
              col("nn").cast("double")) * 1.0e9
        ).cast("long")
      )
      .withColumn(
        "v9",
        floor(
          ((col("a") + col("b")) * (col("cc") + col("d"))).cast("double") *
            ((col("a") + col("cc")) * (col("b") + col("d"))).cast("double") /
            (col("nn") * col("nn")).cast("double") /
            (col("nn") - 1).cast("double") * 1.0e9
        ).cast("long")
      )
    cells
      .agg(
        count(lit(1)).as("n_strata"),
        sum("ad9").as("sad9"),
        sum("bc9").as("sbc9"),
        sum("e9").as("se9"),
        sum("v9").as("sv9")
      )
      .withColumn(
        "chi2_raw",
        (col("se9").cast("double") / 1.0e9) *
          (col("se9").cast("double") / 1.0e9) /
          nullif(col("sv9").cast("double") / 1.0e9, lit(0.0d))
      )
      .select(
        col("n_strata"),
        (round(
          col("sad9").cast("double") / nullif(col("sbc9").cast("double"), lit(0.0d)),
          4
        ) + 0.0).as("or_mh"),
        (round(col("chi2_raw"), 4) + 0.0).as("chi2_cmh"),
        (col("chi2_raw") > lit(chi2_1_95)).as("significant")
      )
  }

  /** q253: Pettitt change-point test — the RANK-based single
    * change-point detector that complements q156's CUSUM (CUSUM scans
    * for a mean shift in the VALUES and is wrecked by one outlier day;
    * Pettitt scans Mann–Whitney statistics over every split point, so
    * it finds a DISTRIBUTIONAL shift robustly): U_t = Σᵢ≤t Σⱼ>t
    * sgn(yᵢ−yⱼ), K = max|U_t|, τ = argmax, with the standard
    * approximation p ≈ 2·exp(−6K²/(n³+n²)).
    *
    * Determinism: with midranks, U_t = Σᵢ≤t 2Rᵢ − t(n+1) EXACTLY, and
    * 2R = 2·lt + t + 1 per distinct value is an exact integer (the
    * q150 posting), so every U_t is an exact BIGINT; the argmax
    * tie-breaks on the earliest date; p is one exp dag of exact
    * integers; the significance flag compares the RAW p dag to 0.05.
    *
    * Scale shape: one corpus pass → the calendar-bounded daily frame;
    * the rank posting runs over the distinct daily-value frame and the
    * U_t cumsum over the daily frame (the q156 allowlist convention);
    * the argmax is a 1-row TakeOrdered. One-row output.
    */
  private def q253(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .table(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
    val vf = daily
      .groupBy("sv")
      .agg(count(lit(1)).as("t"))
      .withColumn(
        "r2",
        coalesce(
          sum("t").over(
            Window.orderBy("sv").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        ) * 2 + col("t") + 1
      )
      .select("sv", "r2")
    val nTot = daily.agg(count(lit(1)).as("n"))
    val u = daily
      .join(vf, "sv")
      .withColumn("ti", row_number().over(Window.orderBy("d")))
      .withColumn(
        "a",
        sum("r2").over(
          Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
        )
      )
      .crossJoin(broadcast(nTot))
      .filter(col("ti") < col("n"))
      .withColumn("u", col("a") - col("ti") * (col("n") + 1))
    u.orderBy(abs(col("u")).desc, col("d"))
      .limit(1)
      .withColumn(
        "p_raw",
        lit(2.0d) * exp(
          lit(-6.0d) * (col("u") * col("u")).cast("double") /
            (col("n") * col("n") * col("n") + col("n") * col("n"))
              .cast("double")
        )
      )
      .select(
        col("n").as("n_days"),
        abs(col("u")).as("k_stat"),
        col("d").cast("string").as("tau_date"),
        (round(col("p_raw"), 6) + 0.0).as("p_approx"),
        (col("p_raw") < lit(0.05d)).as("significant")
      )
  }

  /** q256: Poisson overdispersion test — "are per-user event counts
    * Poisson, or clumpier" — the screen run before ANY count model
    * (Poisson regression, rate alarms, q152's CI width) is trusted,
    * because real user activity is nearly always overdispersed and a
    * Poisson assumption then understates every variance: the index of
    * dispersion D = (n−1)s²/x̄ is χ²ₙ₋₁ under Poisson, read through
    * the classic √(2D) − √(2df−1) normal approximation.
    *
    * Determinism: D = (n·Σx² − (Σx)²)/Σx is a ratio of EXACT integers
    * (the s²/x̄ algebra cancels the 1/(n(n−1)) against (n−1)) cast to
    * double once; z is one sqrt dag; the flag compares the RAW z dag
    * to the one-sided 1.645 literal.
    *
    * Scale shape: one user aggregate → one 3-moment global aggregate.
    * One-row output.
    */
  private def q256(s: SparkSession, dir: String): DataFrame = {
    Tables
      .table(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("x"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx")
      )
      .withColumn(
        "d_raw",
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
          col("sx").cast("double")
      )
      .withColumn(
        "z_raw",
        sqrt(lit(2.0d) * col("d_raw")) -
          sqrt(lit(2.0d) * (col("n") - 1).cast("double") - lit(1.0d))
      )
      .select(
        col("n").as("n_users"),
        (round(col("d_raw") / (col("n") - 1).cast("double"), 6) + 0.0)
          .as("dispersion_ratio"),
        (round(col("z_raw"), 4) + 0.0).as("z"),
        (col("z_raw") > lit(1.645d)).as("overdispersed")
      )
  }

  /** q257: Theil T and Atkinson(1) inequality indices of per-user
    * activity — the DECOMPOSABLE inequality measures economists reach
    * for where Gini cannot split by subgroup (q188 fits Gini to the
    * vocabulary; these price ENGAGEMENT concentration, the "1% of
    * users produce X% of events" number a capacity planner reads):
    * T = (1/S)·Σᵥ cᵥ·v·ln(v·n/S) and A₁ = 1 − exp(ln-mean − ln μ),
    * both zero at perfect equality.
    *
    * Determinism: counts are integers so both indices work the VALUE
    * frame; every ln argument v·n/S is a ratio of exact integers
    * floor-snapped to the 1e-9 grid and weighted by exact counts (the
    * q241 convention), so the sums are exact BIGINTs and T / A₁ are
    * single dags.
    *
    * Scale shape: one user aggregate → the distinct-count VALUE frame
    * (≲ hundreds of rows); no window at all. One-row output.
    */
  private def q257(s: SparkSession, dir: String): DataFrame = {
    val vf = Tables
      .table(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("v"))
      .groupBy("v")
      .agg(count(lit(1)).as("c"))
    val tot = vf.agg(
      sum("c").as("n"),
      sum((col("v") * col("c")).cast("decimal(38,0)")).cast("long").as("s")
    )
    vf.crossJoin(broadcast(tot))
      .withColumn(
        "l9",
        floor(
          log(
            (col("v") * col("n")).cast("double") / col("s").cast("double")
          ) * 1.0e9
        ).cast("long")
      )
      .agg(
        max("n").as("n"),
        max("s").as("s"),
        sum((col("c") * col("v") * col("l9")).cast("decimal(38,0)"))
          .cast("double")
          .as("t9s"),
        sum((col("c") * col("l9")).cast("decimal(38,0)"))
          .cast("double")
          .as("a9n")
      )
      .select(
        col("n").as("n_users"),
        (round(col("s").cast("double") / col("n").cast("double"), 6) + 0.0)
          .as("mean_count"),
        (round(col("t9s") / (col("s").cast("double") * 1.0e9), 6) + 0.0)
          .as("theil_t"),
        (round(
          lit(1.0d) - exp(col("a9n") / (col("n").cast("double") * 1.0e9)),
          6
        ) + 0.0).as("atkinson_1")
      )
  }

  /** q259: log-log price elasticity of demand — the econometric
    * workhorse ("a 1% price rise moves quantity by ε%") read straight
    * off lineitem: regress ln(quantity) on ln(unit price), ε = the
    * slope = cov(ln q, ln p)/var(ln p), with R² alongside. The q120
    * machinery on LOG scales — which is exactly how elasticities are
    * estimated in production.
    *
    * Determinism: both logs take EXACT-integer-ratio arguments
    * (quantity centi / 100; price = extendedprice-centi / quantity-
    * centi) and floor-snap to the 1e-9 grid per row, so all five
    * moments are exact DECIMAL(38) sums of BIGINTs; slope and R² are
    * the q120 ratio dags of those integers, round-6.
    *
    * Scale shape: ONE corpus aggregate, no shuffle beyond the partial
    * agg. One-row output.
    */
  private def q259(s: SparkSession, dir: String): DataFrame = {
    val m = Tables
      .table(s, dir, "lineitem")
      .select(
        round(col("l_quantity") * 100.0, 0).cast("long").as("qc"),
        round(col("l_extendedprice") * 100.0, 0).cast("long").as("pc")
      )
      .select(
        floor(
          log(col("qc").cast("double") / lit(100.0d)) * 1.0e9
        ).cast("long").as("lq9"),
        floor(
          log(col("pc").cast("double") / col("qc").cast("double")) * 1.0e9
        ).cast("long").as("lp9")
      )
      .agg(
        count(lit(1)).as("n"),
        sum(col("lq9").cast("decimal(38,0)")).as("sq"),
        sum(col("lp9").cast("decimal(38,0)")).as("sp"),
        // l9 values sit near 1e10, so products overflow BIGINT —
        // widen to DECIMAL(38) BEFORE multiplying
        sum(col("lq9").cast("decimal(38,0)") * col("lp9")).as("sqp"),
        sum(col("lp9").cast("decimal(38,0)") * col("lp9")).as("spp"),
        sum(col("lq9").cast("decimal(38,0)") * col("lq9")).as("sqq")
      )
    m.withColumn(
      "cov_d",
      (col("n") * col("sqp") - col("sq") * col("sp")).cast("double")
    ).withColumn(
      "varp_d",
      (col("n") * col("spp") - col("sp") * col("sp")).cast("double")
    ).withColumn(
      "varq_d",
      (col("n") * col("sqq") - col("sq") * col("sq")).cast("double")
    ).select(
      col("n").as("n_rows"),
      (round(col("cov_d") / nullif(col("varp_d"), lit(0.0d)), 6) + 0.0)
        .as("elasticity"),
      (round(
        col("cov_d") * col("cov_d") /
          nullif(col("varp_d") * col("varq_d"), lit(0.0d)),
        6
      ) + 0.0).as("r2"),
      (round(col("sp").cast("double") / (col("n").cast("double") * 1.0e9), 6)
        + 0.0).as("mean_ln_price"),
      (round(col("sq").cast("double") / (col("n").cast("double") * 1.0e9), 6)
        + 0.0).as("mean_ln_qty")
    )
  }

  /** q262: Cliff's delta effect size — the number the q150
    * Mann–Whitney p-value is supposed to be read WITH (at corpus n,
    * everything is "significant"; δ = P(a>b) − P(a<b) ∈ [−1, 1] says
    * whether the dominance is worth acting on), plus the standard
    * Romano magnitude label (|δ| < .147 negligible, < .33 small,
    * < .474 medium, else large).
    *
    * Determinism: rides q150's exact machinery unchanged — per-value
    * arm counts, the two-level shard cumulation, u2a = Σcₐ(2·cb_lt +
    * c_b) = 2·U_A exact — and δ = (u2a − nₐn_b)/(nₐn_b) is ONE
    * division of exact integers; the label compares the RAW |δ| dag
    * against the Romano literals.
    *
    * Scale shape: q150's exactly (value-frame + shard offsets).
    * One-row output.
    */
  private def q262(s: SparkSession, dir: String): DataFrame = {
    val perVal = Tables
      .table(s, dir, "events")
      .select(
        round(col("value") * 100.0, 0).cast("long").as("vc"),
        when(graft.llm.Sampling.bucket100(col("user_id")) < 50, 1L)
          .otherwise(0L)
          .as("a")
      )
      .groupBy("vc")
      .agg(sum("a").as("ca"), (count(lit(1)) - sum("a")).as("cb"))
      .withColumn("shard", expr("(vc - pmod(vc, 256)) div 256"))
    val offsets = perVal
      .groupBy("shard")
      .agg(sum("cb").as("sb"))
      .withColumn(
        "off_b",
        coalesce(
          sum("sb").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("shard", "off_b")
    val localEx = Window
      .partitionBy("shard")
      .orderBy("vc")
      .rowsBetween(Window.unboundedPreceding, -1)
    perVal
      .join(broadcast(offsets), "shard")
      .withColumn(
        "cb_lt",
        col("off_b") + coalesce(sum("cb").over(localEx), lit(0L))
      )
      .agg(
        sum("ca").as("na"),
        sum("cb").as("nb"),
        sum((col("ca") * (col("cb_lt") * 2 + col("cb"))).cast("decimal(38,0)"))
          .as("u2a")
      )
      .withColumn(
        "delta_raw",
        (col("u2a") - col("na").cast("decimal(38,0)") * col("nb"))
          .cast("double") /
          (col("na").cast("decimal(38,0)") * col("nb")).cast("double")
      )
      .select(
        col("na").as("n_a"),
        col("nb").as("n_b"),
        (round(col("delta_raw"), 6) + 0.0).as("cliffs_delta"),
        when(abs(col("delta_raw")) < lit(0.147d), "negligible")
          .when(abs(col("delta_raw")) < lit(0.33d), "small")
          .when(abs(col("delta_raw")) < lit(0.474d), "medium")
          .otherwise("large")
          .as("magnitude")
      )
  }

  /** q263: sequential probability ratio test (SPRT) trace — Wald's
    * always-valid test, the ancestor of every "peeking-safe"
    * experimentation platform (fixed-horizon tests like q87 are
    * invalid under daily peeking; the SPRT's LLR random walk with
    * ln B / ln A boundaries holds α and β by construction at EVERY
    * look): daily cumulative LLR of the purchase share against
    * H₀: p₀ = 0.19 vs H₁: p₁ = 0.21, α = β = 0.05.
    *
    * Determinism: the two per-observation log-likelihood increments
    * are floor-snapped to the 1e-9 grid ONCE (their arguments are the
    * p₀/p₁ literals), so each day's LLR is an exact BIGINT
    * S·l₁ + F·l₂ and the cumulative walk never floats; boundary
    * crossings compare exact integers against the snapped ±ln(19)
    * boundary; the first-crossing day is an exact min.
    *
    * Scale shape: one corpus pass → the calendar-bounded daily frame;
    * one cumsum (the q156 convention); a 1-row summary. One-row
    * output.
    */
  private def q263(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .table(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("sc"),
        sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L)).as("fc")
      )
    val l1 = floor(log(lit(0.21d) / lit(0.19d)) * 1.0e9).cast("long")
    val l2 = floor(log(lit(0.79d) / lit(0.81d)) * 1.0e9).cast("long")
    val bound = floor(log(lit(19.0d)) * 1.0e9).cast("long")
    val walk = daily
      .withColumn(
        "llr9",
        sum(col("sc") * l1 + col("fc") * l2).over(
          Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
        )
      )
      .withColumn(
        "decision",
        when(col("llr9") >= bound, "accept_h1")
          .when(col("llr9") <= -bound, "accept_h0")
          .otherwise("continue")
      )
    val firstCross = walk
      .filter(col("decision") =!= "continue")
      .agg(min(col("d").cast("string")).as("first_cross_day"))
    val last = walk
      .orderBy(col("d").desc)
      .limit(1)
      .select(
        col("llr9"),
        col("decision").as("final_decision")
      )
    walk
      .agg(
        count(lit(1)).as("n_days"),
        sum("sc").as("n_success"),
        sum("fc").as("n_failure")
      )
      .crossJoin(broadcast(firstCross))
      .crossJoin(broadcast(last))
      .select(
        col("n_days"),
        col("n_success"),
        col("n_failure"),
        col("first_cross_day"),
        (round(col("llr9").cast("double") / 1.0e9, 4) + 0.0).as("final_llr"),
        col("final_decision")
      )
  }

  /** q264: empirical-Bayes rate shrinkage — the "smoothed CTR" every
    * ranking and quality pipeline ships (a part with 1 return in 2
    * sales must not outrank one with 40 in 100): fit a Beta prior to
    * the observed per-part return-rate distribution by method of
    * moments (α = m(m(1−m)/v − 1), β = (1−m)·same), then shrink each
    * part's rate to (x + α)/(n + α + β) — small-n parts pull to the
    * prior mean, large-n parts keep their data. Top-10 by shrunken
    * rate.
    *
    * Determinism: per-part rates live on the exact per-million `div`
    * grid; the prior's m and v come from exact integer moments of
    * those grid rates (one aggregate); α, β, and every shrunken rate
    * are single dags of exact integers, round-6; the top-10 orders on
    * (rounded rate, part).
    *
    * Scale shape: one fact aggregate keyed by part → one 3-moment
    * aggregate → a broadcast 1-row prior joined back map-side;
    * TakeOrdered top-10. Ten-row output.
    */
  private def q264(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables
      .table(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("part"))
      .agg(
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("x"),
        count(lit(1)).as("n")
      )
      .withColumn("r6", expr("x * 1000000 div n"))
    val prior = parts
      .agg(
        count(lit(1)).as("k"),
        sum(col("r6").cast("decimal(38,0)")).as("sr"),
        sum((col("r6") * col("r6")).cast("decimal(38,0)")).as("srr")
      )
      .withColumn("m", col("sr").cast("double") / (col("k").cast("double") * 1.0e6))
      .withColumn(
        "v",
        (col("k") * col("srr") - col("sr") * col("sr")).cast("double") /
          ((col("k") * (col("k") - 1)).cast("double") * 1.0e12)
      )
      .withColumn(
        "ab",
        col("m") * (lit(1.0d) - col("m")) / nullif(col("v"), lit(0.0d)) -
          lit(1.0d)
      )
      .withColumn("alpha", col("m") * col("ab"))
      .withColumn("beta", (lit(1.0d) - col("m")) * col("ab"))
      .select("alpha", "beta")
    parts
      .crossJoin(broadcast(prior))
      .withColumn(
        "shrunk",
        round(
          (col("x").cast("double") + col("alpha")) /
            (col("n").cast("double") + col("alpha") + col("beta")),
          6
        ) + 0.0
      )
      .select(
        col("part"),
        col("x").as("n_returns"),
        col("n").as("n_sales"),
        (round(col("x").cast("double") / col("n").cast("double"), 6) + 0.0)
          .as("raw_rate"),
        col("shrunk").as("shrunken_rate"),
        (round(col("alpha"), 4) + 0.0).as("alpha"),
        (round(col("beta"), 4) + 0.0).as("beta")
      )
      .orderBy(desc("shrunken_rate"), col("part"))
      .limit(10)
  }

  /** q265: Wilcoxon signed-rank test — the PAIRED nonparametric test
    * (q150's Mann–Whitney compares two independent groups; when every
    * user provides their own pre AND post value, the paired design
    * removes between-user variance and signed-rank is the
    * distribution-free way to read it): rank |dᵤ| = |yᵤ − xᵤ| across
    * users, W⁺ = Σ ranks of positive diffs, z from the exact normal
    * moments with the standard tie correction; zero diffs drop per
    * the standard treatment.
    *
    * Determinism: |d| is an exact centi BIGINT; midranks post on the
    * 2R = 2·lt + t + 1 grid via the q150 TWO-LEVEL shard cumulation
    * over the |d| value frame (no corpus-sized global window);
    * 2W⁺ = Σ⁺ 2R is exact, the z numerator 2·(2W⁺) − n(n+1) and the
    * variance integers 2n(n+1)(2n+1) − Σ(t³−t) are exact DECIMAL(38),
    * one sqrt dag; the flag compares the RAW |z| to 1.96.
    *
    * Scale shape: one corpus pass → one user aggregate → the |d|
    * value frame with shard offsets → one global aggregate. One-row
    * output.
    */
  private def q265(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .table(s, dir, "events")
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100.0, 0).cast("long").as("vc")
      )
    val cut = ev.selectExpr("(min(us) + max(us)) div 2 as cut_us")
    val user = ev
      .crossJoin(broadcast(cut))
      .groupBy("user_id")
      .agg(
        (sum(when(col("us") >= col("cut_us"), col("vc")).otherwise(0L)) -
          sum(when(col("us") < col("cut_us"), col("vc")).otherwise(0L)))
          .as("d")
      )
      .filter(col("d") =!= 0L)
      .select(abs(col("d")).as("ad"), (col("d") > 0L).cast("long").as("pos"))
    val perVal = user
      .groupBy("ad")
      .agg(count(lit(1)).as("t"), sum("pos").as("tp"))
      .withColumn("shard", expr("(ad - pmod(ad, 4096)) div 4096"))
    val offsets = perVal
      .groupBy("shard")
      .agg(sum("t").as("st"))
      .withColumn(
        "off",
        coalesce(
          sum("st").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("shard", "off")
    val localEx = Window
      .partitionBy("shard")
      .orderBy("ad")
      .rowsBetween(Window.unboundedPreceding, -1)
    perVal
      .join(broadcast(offsets), "shard")
      .withColumn(
        "lt",
        col("off") + coalesce(sum("t").over(localEx), lit(0L))
      )
      .withColumn("r2", col("lt") * 2 + col("t") + 1)
      .agg(
        sum("t").as("n"),
        sum((col("tp") * col("r2")).cast("decimal(38,0)")).as("w2"),
        sum(
          (col("t").cast("decimal(12,0)") * col("t") * col("t") - col("t"))
            .cast("decimal(38,0)")
        ).as("tt")
      )
      .withColumn(
        "num_d",
        (lit(2L) * col("w2") -
          (col("n").cast("decimal(12,0)") * (col("n") + 1))
            .cast("decimal(38,0)")).cast("double")
      )
      .withColumn(
        "den_d",
        sqrt(
          ((lit(2L) * col("n").cast("decimal(12,0)") * (col("n") + 1) *
            (lit(2L) * col("n") + 1)).cast("decimal(38,0)") - col("tt"))
            .cast("double") / lit(3.0d)
        )
      )
      .withColumn("z_raw", col("num_d") / nullif(col("den_d"), lit(0.0d)))
      .select(
        col("n").as("n_nonzero"),
        (col("w2").cast("double") / 2.0d + 0.0).as("w_plus"),
        (round(col("z_raw"), 4) + 0.0).as("z"),
        (abs(col("z_raw")) > lit(1.96d)).as("significant")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q265_signed_rank" -> q265,
    "q262_cliffs_delta" -> q262,
    "q263_sprt" -> q263,
    "q264_eb_shrinkage" -> q264,
    "q243_did" -> q243,
    "q245_runs_test" -> q245,
    "q246_hodges_lehmann" -> q246,
    "q247_gpd_tail" -> q247,
    "q248_cem_att" -> q248,
    "q249_ridge_path" -> q249,
    "q251_mantel_haenszel" -> q251,
    "q253_pettitt" -> q253,
    "q256_overdispersion" -> q256,
    "q257_theil_atkinson" -> q257,
    "q259_price_elasticity" -> q259,
    "q239_cuped" -> q239,
    "q237_kruskal_wallis" -> q237,
    "q231_fisher_exact" -> q231,
    "q216_brown_forsythe" -> q216,
    "q217_nelson_aalen" -> q217,
    "q218_cochran_armitage" -> q218,
    "q214_mann_kendall" -> q214,
    "q215_wasserstein" -> q215,
    "q204_kendall_tau" -> q204,
    "q201_wilson_interval" -> q201,
    "q198_theil_sen" -> q198,
    "q194_rmst" -> q194,
    "q191_psi_drift" -> q191,
    "q186_cramers_v" -> q186,
    "q178_bh_fdr" -> q178,
    "q179_logrank" -> q179,
    "q185_welch_ttest" -> q185,
    "q174_kaplan_meier" -> q174,
    "q169_spearman" -> q169,
    "q153_weighted_quantiles" -> q153,
    "q161_winsorized_mean" -> q161,
    "q158_conformal_interval" -> q158,
    "q156_cusum_changepoint" -> q156,
    "q86_chi_square" -> q86,
    "q87_ab_test" -> q87,
    "q120_ols_probe" -> q120,
    "q145_ks_drift" -> q145,
    "q146_anova" -> q146,
    "q150_mann_whitney" -> q150,
    "q152_bootstrap_ci" -> q152
  )

  private val q120OracleSql: String =
    """WITH m AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) AS DOUBLE) AS rs1,
      |    CAST(sum(CAST(round(l_discount * 10000.0, 0) AS BIGINT)) AS DOUBLE) AS rs2,
      |    CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS DOUBLE) AS rsy,
      |    CAST(sum(CAST(round(l_quantity * 100.0, 0) AS BIGINT)
      |           * CAST(round(l_quantity * 100.0, 0) AS BIGINT)) AS DOUBLE) AS rs11,
      |    CAST(sum(CAST(round(l_quantity * 100.0, 0) AS BIGINT)
      |           * CAST(round(l_discount * 10000.0, 0) AS BIGINT)) AS DOUBLE) AS rs12,
      |    CAST(sum(CAST(round(l_discount * 10000.0, 0) AS BIGINT)
      |           * CAST(round(l_discount * 10000.0, 0) AS BIGINT)) AS DOUBLE) AS rs22,
      |    CAST(sum(CAST(round(l_quantity * 100.0, 0) AS BIGINT)
      |           * CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS DOUBLE) AS rs1y,
      |    CAST(sum(CAST(round(l_discount * 10000.0, 0) AS BIGINT)
      |           * CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS DOUBLE) AS rs2y,
      |    CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
      |           * CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS DOUBLE) AS rsyy
      |  FROM lineitem),
      |u AS (
      |  SELECT n,
      |    rs1 / 1e2 AS s1, rs2 / 1e4 AS s2, rsy / 1e2 AS sy,
      |    rs11 / 1e4 AS s11, rs12 / 1e6 AS s12, rs22 / 1e8 AS s22,
      |    rs1y / 1e4 AS s1y, rs2y / 1e6 AS s2y, rsyy / 1e4 AS syy
      |  FROM m),
      |c AS (
      |  SELECT n, s1, s2, sy,
      |    s11 - s1 * s1 / n AS c11,
      |    s12 - s1 * s2 / n AS c12,
      |    s22 - s2 * s2 / n AS c22,
      |    s1y - s1 * sy / n AS c1y,
      |    s2y - s2 * sy / n AS c2y,
      |    syy - sy * sy / n AS cyy
      |  FROM u),
      |d AS (SELECT *, c11 * c22 - c12 * c12 AS det FROM c),
      |b AS (
      |  SELECT *,
      |    (c1y * c22 - c2y * c12) / nullif(det, 0.0) AS b1,
      |    (c2y * c11 - c1y * c12) / nullif(det, 0.0) AS b2
      |  FROM d),
      |f AS (
      |  SELECT n, b1, b2, c1y, c2y, cyy,
      |    (sy - b1 * s1 - b2 * s2) / n AS b0
      |  FROM b)
      |SELECT CAST(n AS BIGINT) AS n_rows,
      |  round(b0, 6) + 0.0 AS beta0,
      |  round(b1, 6) + 0.0 AS beta1,
      |  round(b2, 6) + 0.0 AS beta2,
      |  round((b1 * c1y + b2 * c2y) / nullif(cyy, 0.0), 6) + 0.0 AS r2
      |FROM f""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // same epoch-µs midpoint cut, same exact per-user centi frame and
    // DECIMAL moments, same closed-form ρ² and literal-order dag
    // same per-user first differences and zero-drop, same 2-midrank
    // posting over the |d| value frame (naive single window — the
    // oracle may scan), same exact 2W+ and variance integers, same
    // raw-dag 1.96 compare
    "q265_signed_rank" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100, 0) AS BIGINT) AS vc
        |  FROM events),
        |cut AS (SELECT (min(us) + max(us)) // 2 AS cut_us FROM ev),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN us >= cut_us THEN vc ELSE 0 END)
        |         - sum(CASE WHEN us < cut_us THEN vc ELSE 0 END) AS BIGINT)
        |      AS d
        |  FROM ev CROSS JOIN cut GROUP BY user_id),
        |nz AS (
        |  SELECT abs(d) AS ad, CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos
        |  FROM u WHERE d <> 0),
        |pv AS (
        |  SELECT ad, CAST(count(*) AS BIGINT) AS t,
        |    CAST(sum(pos) AS BIGINT) AS tp
        |  FROM nz GROUP BY 1),
        |mr AS (
        |  SELECT ad, t, tp,
        |    2 * CAST(coalesce(sum(t) OVER (ORDER BY ad
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      + t + 1 AS r2
        |  FROM pv),
        |m AS (
        |  SELECT CAST(sum(t) AS BIGINT) AS n,
        |    sum(CAST(tp * r2 AS HUGEINT)) AS w2,
        |    sum(CAST(t AS HUGEINT) * t * t - t) AS tt
        |  FROM mr),
        |d AS (
        |  SELECT *,
        |    CAST(2 * w2 - CAST(n AS HUGEINT) * (n + 1) AS DOUBLE) AS num_d,
        |    sqrt(CAST(2 * CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1) - tt
        |              AS DOUBLE) / 3.0) AS den_d
        |  FROM m)
        |SELECT n AS n_nonzero,
        |  CAST(w2 AS DOUBLE) / 2.0 + 0.0 AS w_plus,
        |  round(num_d / nullif(den_d, 0.0), 4) + 0.0 AS z,
        |  abs(num_d / nullif(den_d, 0.0)) > 1.96 AS significant
        |FROM d""".stripMargin,
    // same q150 value-frame machinery (naive single window — the
    // oracle may scan), same exact u2a and single delta division,
    // same raw-dag Romano thresholds
    "q262_cliffs_delta" ->
      """WITH s AS (
        |  SELECT CAST(round(value * 100, 0) AS BIGINT) AS vc,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 < 50 THEN 1 ELSE 0 END AS a
        |  FROM events),
        |pv AS (
        |  SELECT vc, CAST(sum(a) AS BIGINT) AS ca,
        |    CAST(count(*) - sum(a) AS BIGINT) AS cb
        |  FROM s GROUP BY 1),
        |c AS (
        |  SELECT ca, cb,
        |    CAST(coalesce(sum(cb) OVER (ORDER BY vc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cb_lt
        |  FROM pv),
        |m AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
        |    sum(CAST(ca * (cb_lt * 2 + cb) AS HUGEINT)) AS u2a
        |  FROM c),
        |d AS (
        |  SELECT *, CAST(u2a - CAST(na AS HUGEINT) * nb AS DOUBLE)
        |    / CAST(CAST(na AS HUGEINT) * nb AS DOUBLE) AS delta_raw
        |  FROM m)
        |SELECT na AS n_a, nb AS n_b,
        |  round(delta_raw, 6) + 0.0 AS cliffs_delta,
        |  CASE WHEN abs(delta_raw) < 0.147 THEN 'negligible'
        |       WHEN abs(delta_raw) < 0.33 THEN 'small'
        |       WHEN abs(delta_raw) < 0.474 THEN 'medium'
        |       ELSE 'large' END AS magnitude
        |FROM d""".stripMargin,
    // same 1e-9-snapped per-observation LLR increments, same exact
    // BIGINT cumulative walk and snapped ln(19) boundaries
    "q263_sprt" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS sc,
        |    CAST(sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS fc
        |  FROM events GROUP BY 1),
        |k AS (
        |  SELECT CAST(floor(ln(0.21 / 0.19) * 1.0e9) AS BIGINT) AS l1,
        |    CAST(floor(ln(0.79 / 0.81) * 1.0e9) AS BIGINT) AS l2,
        |    CAST(floor(ln(19.0) * 1.0e9) AS BIGINT) AS bound),
        |walk AS (
        |  SELECT d, sc, fc,
        |    CAST(sum(sc * l1 + fc * l2) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS llr9,
        |    bound
        |  FROM daily CROSS JOIN k),
        |dec AS (
        |  SELECT *, CASE WHEN llr9 >= bound THEN 'accept_h1'
        |                 WHEN llr9 <= -bound THEN 'accept_h0'
        |                 ELSE 'continue' END AS decision
        |  FROM walk),
        |fx AS (
        |  SELECT min(CAST(d AS VARCHAR)) AS first_cross_day
        |  FROM dec WHERE decision <> 'continue'),
        |lastd AS (
        |  SELECT llr9, decision AS final_decision
        |  FROM dec ORDER BY d DESC LIMIT 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(sc) AS BIGINT) AS n_success,
        |    CAST(sum(fc) AS BIGINT) AS n_failure
        |  FROM daily)
        |SELECT n_days, n_success, n_failure, first_cross_day,
        |  round(CAST(llr9 AS DOUBLE) / 1.0e9, 4) + 0.0 AS final_llr,
        |  final_decision
        |FROM tot CROSS JOIN fx CROSS JOIN lastd""".stripMargin,
    // same per-million div rate grid, same exact prior moments and
    // MOM alpha/beta dag, same shrunken-rate ordering
    "q264_eb_shrinkage" ->
      """WITH p AS (
        |  SELECT l_partkey AS part,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT *, x * 1000000 // n AS r6 FROM p),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    sum(CAST(r6 AS HUGEINT)) AS sr,
        |    sum(CAST(r6 * r6 AS HUGEINT)) AS srr
        |  FROM r),
        |pr AS (
        |  SELECT
        |    CAST(sr AS DOUBLE) / (CAST(k AS DOUBLE) * 1.0e6) AS mm,
        |    CAST(k * srr - sr * sr AS DOUBLE)
        |      / (CAST(k * (k - 1) AS DOUBLE) * 1.0e12) AS v
        |  FROM m),
        |ab AS (
        |  SELECT mm * (1.0 - mm) / nullif(v, 0.0) - 1.0 AS ab0, mm FROM pr),
        |pri AS (
        |  SELECT mm * ab0 AS alpha, (1.0 - mm) * ab0 AS beta FROM ab)
        |SELECT part, x AS n_returns, n AS n_sales,
        |  round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS raw_rate,
        |  round((CAST(x AS DOUBLE) + alpha)
        |        / (CAST(n AS DOUBLE) + alpha + beta), 6) + 0.0
        |    AS shrunken_rate,
        |  round(alpha, 4) + 0.0 AS alpha,
        |  round(beta, 4) + 0.0 AS beta
        |FROM r CROSS JOIN pri
        |ORDER BY shrunken_rate DESC, part LIMIT 10""".stripMargin,
    // same exact D = (n·Σx² − (Σx)²)/Σx integer ratio, same sqrt
    // approximation dag, same raw-dag 1.645 compare
    "q256_overdispersion" ->
      """WITH u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx,
        |    sum(CAST(x * x AS HUGEINT)) AS sxx
        |  FROM u),
        |d AS (
        |  SELECT *, CAST(n * sxx - sx * sx AS DOUBLE) / CAST(sx AS DOUBLE)
        |    AS d_raw
        |  FROM m),
        |z AS (
        |  SELECT *, sqrt(2.0 * d_raw)
        |    - sqrt(2.0 * CAST(n - 1 AS DOUBLE) - 1.0) AS z_raw
        |  FROM d)
        |SELECT n AS n_users,
        |  round(d_raw / CAST(n - 1 AS DOUBLE), 6) + 0.0 AS dispersion_ratio,
        |  round(z_raw, 4) + 0.0 AS z,
        |  z_raw > 1.645 AS overdispersed
        |FROM z""".stripMargin,
    // same value frame, same 1e-9 floor grid on the exact v·n/S ln
    // arguments, same exact weighted sums and single T / A1 dags
    "q257_theil_atkinson" ->
      """WITH u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1),
        |vf AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(v * c) AS BIGINT) AS s
        |  FROM vf),
        |l AS (
        |  SELECT vf.*, tot.n, tot.s,
        |    CAST(floor(ln(CAST(v * n AS DOUBLE) / CAST(s AS DOUBLE)) * 1.0e9)
        |         AS BIGINT) AS l9
        |  FROM vf CROSS JOIN tot),
        |g AS (
        |  SELECT max(n) AS n, max(s) AS s,
        |    CAST(sum(CAST(c * v * l9 AS HUGEINT)) AS DOUBLE) AS t9s,
        |    CAST(sum(CAST(c * l9 AS HUGEINT)) AS DOUBLE) AS a9n
        |  FROM l)
        |SELECT n AS n_users,
        |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS mean_count,
        |  round(t9s / (CAST(s AS DOUBLE) * 1.0e9), 6) + 0.0 AS theil_t,
        |  round(1.0 - exp(a9n / (CAST(n AS DOUBLE) * 1.0e9)), 6) + 0.0
        |    AS atkinson_1
        |FROM g""".stripMargin,
    // same exact-integer-ratio ln arguments on the 1e-9 grid, same
    // five exact moments, same q120 slope/R2 dags
    "q259_price_elasticity" ->
      """WITH r AS (
        |  SELECT CAST(round(l_quantity * 100.0, 0) AS BIGINT) AS qc,
        |    CAST(round(l_extendedprice * 100.0, 0) AS BIGINT) AS pc
        |  FROM lineitem),
        |l AS (
        |  SELECT
        |    CAST(floor(ln(CAST(qc AS DOUBLE) / 100.0) * 1.0e9) AS BIGINT)
        |      AS lq9,
        |    CAST(floor(ln(CAST(pc AS DOUBLE) / CAST(qc AS DOUBLE)) * 1.0e9)
        |         AS BIGINT) AS lp9
        |  FROM r),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(lq9 AS HUGEINT)) AS sq,
        |    sum(CAST(lp9 AS HUGEINT)) AS sp,
        |    sum(CAST(lq9 AS HUGEINT) * lp9) AS sqp,
        |    sum(CAST(lp9 AS HUGEINT) * lp9) AS spp,
        |    sum(CAST(lq9 AS HUGEINT) * lq9) AS sqq
        |  FROM l),
        |d AS (
        |  SELECT *,
        |    CAST(n * sqp - sq * sp AS DOUBLE) AS cov_d,
        |    CAST(n * spp - sp * sp AS DOUBLE) AS varp_d,
        |    CAST(n * sqq - sq * sq AS DOUBLE) AS varq_d
        |  FROM m)
        |SELECT n AS n_rows,
        |  round(cov_d / nullif(varp_d, 0.0), 6) + 0.0 AS elasticity,
        |  round(cov_d * cov_d / nullif(varp_d * varq_d, 0.0), 6) + 0.0 AS r2,
        |  round(CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e9), 6) + 0.0
        |    AS mean_ln_price,
        |  round(CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e9), 6) + 0.0
        |    AS mean_ln_qty
        |FROM d""".stripMargin,
    // same exact 2-midrank posting over the distinct daily values,
    // same exact U_t = A_t - t(n+1) cumsum, same earliest-date argmax
    // and exp dag, same raw-dag 0.05 compare
    "q253_pettitt" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events GROUP BY 1),
        |vf AS (
        |  SELECT sv, CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY 1),
        |mr AS (
        |  SELECT sv, 2 * CAST(coalesce(sum(t) OVER (ORDER BY sv
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    + t + 1 AS r2
        |  FROM vf),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |acc AS (
        |  SELECT d,
        |    row_number() OVER (ORDER BY d) AS ti,
        |    CAST(sum(r2) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS a
        |  FROM daily JOIN mr USING (sv)),
        |u AS (
        |  SELECT d, a - ti * (n + 1) AS u, n
        |  FROM acc CROSS JOIN nt WHERE ti < n),
        |pk AS (SELECT * FROM u ORDER BY abs(u) DESC, d LIMIT 1),
        |pr AS (
        |  SELECT *, 2.0 * exp(-6.0 * CAST(u * u AS DOUBLE)
        |    / CAST(n * n * n + n * n AS DOUBLE)) AS p_raw
        |  FROM pk)
        |SELECT n AS n_days, abs(u) AS k_stat,
        |  CAST(d AS VARCHAR) AS tau_date,
        |  round(p_raw, 6) + 0.0 AS p_approx,
        |  p_raw < 0.05 AS significant
        |FROM pr""".stripMargin,
    // same exact quartile thresholds off the pre-count value frame,
    // same per-stratum exact cells, same 1e6-grid-snapped weighted
    // effect terms summed exactly, same single ATT division
    "q248_cem_att" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100, 0) AS BIGINT) AS vc
        |  FROM events),
        |cut AS (SELECT (min(us) + max(us)) // 2 AS cut_us FROM ev),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN us < cut_us THEN 1 ELSE 0 END) AS BIGINT) AS pc,
        |    CAST(sum(CASE WHEN us >= cut_us THEN vc ELSE 0 END) AS BIGINT) AS y
        |  FROM ev CROSS JOIN cut GROUP BY user_id),
        |ua AS (
        |  SELECT pc, y,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 < 50 THEN 1 ELSE 0 END AS ia
        |  FROM u),
        |vf AS (
        |  SELECT pc, CAST(count(*) AS BIGINT) AS c FROM ua GROUP BY 1),
        |cf AS (
        |  SELECT pc, CAST(sum(c) OVER (ORDER BY pc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM vf),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ua),
        |th AS (
        |  SELECT min(CASE WHEN cum >= (n + 3) // 4 THEN pc END) AS t1,
        |    min(CASE WHEN cum >= (2 * n + 3) // 4 THEN pc END) AS t2,
        |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN pc END) AS t3
        |  FROM cf CROSS JOIN nt),
        |st AS (
        |  SELECT 1 + CAST(pc > t1 AS INT) + CAST(pc > t2 AS INT)
        |       + CAST(pc > t3 AS INT) AS bin,
        |    CAST(sum(ia) AS BIGINT) AS nt2,
        |    CAST(sum(1 - ia) AS BIGINT) AS nc2,
        |    sum(CAST(y * ia AS HUGEINT)) AS syt,
        |    sum(CAST(y * (1 - ia) AS HUGEINT)) AS syc
        |  FROM ua CROSS JOIN th GROUP BY 1
        |  HAVING sum(ia) > 0 AND sum(1 - ia) > 0),
        |tm AS (
        |  SELECT bin, nt2, nc2,
        |    CAST(floor(CAST(nt2 AS DOUBLE)
        |      * (CAST(syt AS DOUBLE) / CAST(nt2 AS DOUBLE)
        |         - CAST(syc AS DOUBLE) / CAST(nc2 AS DOUBLE)) * 1.0e6)
        |      AS BIGINT) AS term6
        |  FROM st),
        |nv AS (
        |  SELECT CAST(sum(ia) AS BIGINT) AS nta,
        |    CAST(sum(1 - ia) AS BIGINT) AS nca,
        |    sum(CAST(y * ia AS HUGEINT)) AS syta,
        |    sum(CAST(y * (1 - ia) AS HUGEINT)) AS syca
        |  FROM ua)
        |SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |  CAST(sum(nt2) AS BIGINT) AS n_t,
        |  CAST(sum(nc2) AS BIGINT) AS n_c,
        |  round(CAST(sum(term6) AS DOUBLE)
        |        / (CAST(sum(nt2) AS DOUBLE) * 1.0e6) / 100.0, 4) + 0.0 AS att,
        |  round((CAST(max(syta) AS DOUBLE) / CAST(max(nta) AS DOUBLE)
        |         - CAST(max(syca) AS DOUBLE) / CAST(max(nca) AS DOUBLE))
        |        / 100.0, 4) + 0.0 AS naive_diff
        |FROM tm CROSS JOIN nv""".stripMargin,
    // same nine exact q120 moments, same fixed-power unscaling, same
    // centered Cramer solve with the lambda factors on the diagonal
    "q249_ridge_path" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(CAST(round(l_quantity * 100.0, 0) AS BIGINT)
        |      AS HUGEINT)) AS DOUBLE) / 1.0e2 AS s1,
        |    CAST(sum(CAST(CAST(round(l_discount * 10000.0, 0) AS BIGINT)
        |      AS HUGEINT)) AS DOUBLE) / 1.0e4 AS s2,
        |    CAST(sum(CAST(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
        |      AS HUGEINT)) AS DOUBLE) / 1.0e2 AS sy,
        |    CAST(sum(CAST(CAST(round(l_quantity * 100.0, 0) AS BIGINT)
        |      * CAST(round(l_quantity * 100.0, 0) AS BIGINT) AS HUGEINT))
        |      AS DOUBLE) / 1.0e4 AS s11,
        |    CAST(sum(CAST(CAST(round(l_quantity * 100.0, 0) AS BIGINT)
        |      * CAST(round(l_discount * 10000.0, 0) AS BIGINT) AS HUGEINT))
        |      AS DOUBLE) / 1.0e6 AS s12,
        |    CAST(sum(CAST(CAST(round(l_discount * 10000.0, 0) AS BIGINT)
        |      * CAST(round(l_discount * 10000.0, 0) AS BIGINT) AS HUGEINT))
        |      AS DOUBLE) / 1.0e8 AS s22,
        |    CAST(sum(CAST(CAST(round(l_quantity * 100.0, 0) AS BIGINT)
        |      * CAST(round(l_extendedprice * 100.0, 0) AS BIGINT) AS HUGEINT))
        |      AS DOUBLE) / 1.0e4 AS s1y,
        |    CAST(sum(CAST(CAST(round(l_discount * 10000.0, 0) AS BIGINT)
        |      * CAST(round(l_extendedprice * 100.0, 0) AS BIGINT) AS HUGEINT))
        |      AS DOUBLE) / 1.0e6 AS s2y
        |  FROM lineitem),
        |c AS (
        |  SELECT n, s11 - s1 * s1 / n AS c11, s12 - s1 * s2 / n AS c12,
        |    s22 - s2 * s2 / n AS c22, s1y - s1 * sy / n AS c1y,
        |    s2y - s2 * sy / n AS c2y
        |  FROM m),
        |l AS (
        |  SELECT c.*, lam.lambda_id, lam.f * (c11 + c22) AS lmb
        |  FROM c CROSS JOIN (VALUES ('l0_none', 0.0), ('l1_light', 0.05),
        |                            ('l2_heavy', 0.5)) AS lam(lambda_id, f)),
        |b AS (
        |  SELECT lambda_id, lmb,
        |    (c1y * (c22 + lmb) - c2y * c12)
        |      / nullif((c11 + lmb) * (c22 + lmb) - c12 * c12, 0.0) AS b1,
        |    (c2y * (c11 + lmb) - c1y * c12)
        |      / nullif((c11 + lmb) * (c22 + lmb) - c12 * c12, 0.0) AS b2
        |  FROM l)
        |SELECT lambda_id, round(lmb, 4) + 0.0 AS lambda,
        |  round(b1, 6) + 0.0 AS beta1, round(b2, 6) + 0.0 AS beta2,
        |  round(sqrt(b1 * b1 + b2 * b2), 6) + 0.0 AS l2_norm
        |FROM b ORDER BY lambda_id""".stripMargin,
    // same q248 strata and exact 2x2 cells, same 1e9-grid-snapped
    // ad/n, bc/n, a-E, V terms summed exactly, same OR and chi2
    // divisions, same raw-dag 3.84 compare
    "q251_mantel_haenszel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |cut AS (SELECT (min(us) + max(us)) // 2 AS cut_us FROM ev),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN us < cut_us THEN 1 ELSE 0 END) AS BIGINT) AS pc,
        |    CASE WHEN sum(CASE WHEN us >= cut_us AND event_type = 'purchase'
        |                  THEN 1 ELSE 0 END)
        |            > sum(CASE WHEN us < cut_us AND event_type = 'purchase'
        |                  THEN 1 ELSE 0 END)
        |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS o
        |  FROM ev CROSS JOIN cut GROUP BY user_id),
        |ua AS (
        |  SELECT pc, o,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 < 50 THEN 1 ELSE 0 END AS ia
        |  FROM u),
        |vf AS (SELECT pc, CAST(count(*) AS BIGINT) AS c FROM ua GROUP BY 1),
        |cf AS (
        |  SELECT pc, CAST(sum(c) OVER (ORDER BY pc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM vf),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ua),
        |th AS (
        |  SELECT min(CASE WHEN cum >= (n + 3) // 4 THEN pc END) AS t1,
        |    min(CASE WHEN cum >= (2 * n + 3) // 4 THEN pc END) AS t2,
        |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN pc END) AS t3
        |  FROM cf CROSS JOIN nt),
        |st AS (
        |  SELECT 1 + CAST(pc > t1 AS INT) + CAST(pc > t2 AS INT)
        |       + CAST(pc > t3 AS INT) AS bin,
        |    CAST(sum(ia * o) AS BIGINT) AS a,
        |    CAST(sum(ia * (1 - o)) AS BIGINT) AS b,
        |    CAST(sum((1 - ia) * o) AS BIGINT) AS cc,
        |    CAST(sum((1 - ia) * (1 - o)) AS BIGINT) AS d
        |  FROM ua CROSS JOIN th GROUP BY 1),
        |tm AS (
        |  SELECT a + b + cc + d AS nn,
        |    CAST(floor(CAST(a * d AS DOUBLE) / CAST(a + b + cc + d AS DOUBLE)
        |      * 1.0e9) AS BIGINT) AS ad9,
        |    CAST(floor(CAST(b * cc AS DOUBLE) / CAST(a + b + cc + d AS DOUBLE)
        |      * 1.0e9) AS BIGINT) AS bc9,
        |    CAST(floor((CAST(a AS DOUBLE)
        |      - CAST((a + b) * (a + cc) AS DOUBLE)
        |        / CAST(a + b + cc + d AS DOUBLE)) * 1.0e9) AS BIGINT) AS e9,
        |    CAST(floor(CAST((a + b) * (cc + d) AS DOUBLE)
        |      * CAST((a + cc) * (b + d) AS DOUBLE)
        |      / CAST((a + b + cc + d) * (a + b + cc + d) AS DOUBLE)
        |      / CAST(a + b + cc + d - 1 AS DOUBLE) * 1.0e9) AS BIGINT) AS v9
        |  FROM st),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(sum(ad9) AS BIGINT) AS sad9,
        |    CAST(sum(bc9) AS BIGINT) AS sbc9,
        |    CAST(sum(e9) AS BIGINT) AS se9,
        |    CAST(sum(v9) AS BIGINT) AS sv9
        |  FROM tm),
        |x AS (
        |  SELECT *, (CAST(se9 AS DOUBLE) / 1.0e9)
        |    * (CAST(se9 AS DOUBLE) / 1.0e9)
        |    / nullif(CAST(sv9 AS DOUBLE) / 1.0e9, 0.0) AS chi2_raw
        |  FROM g)
        |SELECT n_strata,
        |  round(CAST(sad9 AS DOUBLE) / nullif(CAST(sbc9 AS DOUBLE), 0.0), 4)
        |    + 0.0 AS or_mh,
        |  round(chi2_raw, 4) + 0.0 AS chi2_cmh,
        |  chi2_raw > 3.841458820694124 AS significant
        |FROM x""".stripMargin,
    // same exact order-statistic median, same tie-drop and lag() run
    // starts over the daily frame, same exact BIGINT moments in one z
    // dag, same raw-dag 1.96 compare
    "q245_runs_test" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events GROUP BY 1),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM daily),
        |med AS (
        |  SELECT sv AS med FROM (
        |    SELECT sv, row_number() OVER (ORDER BY sv, d) AS rn FROM daily)
        |  CROSS JOIN nt WHERE rn = (n_all + 1) // 2),
        |sg AS (
        |  SELECT d, CASE WHEN sv > med THEN 1 ELSE 0 END AS above,
        |    lag(CASE WHEN sv > med THEN 1 ELSE 0 END)
        |      OVER (ORDER BY d) AS prev
        |  FROM daily CROSS JOIN med WHERE sv <> med),
        |m AS (
        |  SELECT CAST(sum(above) AS BIGINT) AS n1,
        |    CAST(sum(1 - above) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN prev IS NULL OR prev <> above
        |             THEN 1 ELSE 0 END) AS BIGINT) AS r
        |  FROM sg),
        |z AS (
        |  SELECT *, n1 + n2 AS n,
        |    1.0 + CAST(2 * n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) AS mu,
        |    CAST(2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2)) AS DOUBLE)
        |      / CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE) AS va
        |  FROM m),
        |zz AS (
        |  SELECT *, (CAST(r AS DOUBLE) - mu) / nullif(sqrt(va), 0.0) AS z_raw
        |  FROM z)
        |SELECT n AS n_days, n1 AS n_above, n2 AS n_below, r AS n_runs,
        |  round(z_raw, 4) + 0.0 AS z,
        |  abs(z_raw) <= 1.96 AS looks_random
        |FROM zz""".stripMargin,
    // same distinct-count VALUE frame, same exact Walsh-sum weights on
    // the ×2 grid, same cumsum rank picks, same quarter-integer result
    "q246_hodges_lehmann" ->
      """WITH uc AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1),
        |vf AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM uc GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n_users,
        |    CAST(sum(c) * (sum(c) + 1) // 2 AS BIGINT) AS m_pairs,
        |    CAST(sum(v * c) AS BIGINT) AS sv
        |  FROM vf),
        |pw AS (
        |  SELECT a.v + b.v AS ws,
        |    CAST(sum(CASE WHEN a.v < b.v THEN a.c * b.c
        |             ELSE a.c * (a.c + 1) // 2 END) AS BIGINT) AS w
        |  FROM vf a JOIN vf b ON a.v <= b.v
        |  GROUP BY 1),
        |cw AS (
        |  SELECT ws, CAST(sum(w) OVER (ORDER BY ws
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM pw),
        |pk AS (
        |  SELECT min(CASE WHEN cum >= (m_pairs + 1) // 2 THEN ws END) AS ws1,
        |    min(CASE WHEN cum >= m_pairs // 2 + 1 THEN ws END) AS ws2,
        |    max(n_users) AS n_users, max(m_pairs) AS m_pairs, max(sv) AS sv
        |  FROM cw CROSS JOIN tot)
        |SELECT n_users, m_pairs,
        |  CAST(ws1 + ws2 AS DOUBLE) / 4.0 + 0.0 AS hl_pseudomedian,
        |  round(CAST(sv AS DOUBLE) / CAST(n_users AS DOUBLE), 6) + 0.0
        |    AS mean_count
        |FROM pk""".stripMargin,
    // same per-VALUE centi cumsum threshold pick, same exact
    // exceedance moments off the value frame, same MOM dag with the
    // power spelled exp(xi·ln(N·zeta))
    "q247_gpd_tail" ->
      """WITH vf AS (
        |  SELECT CAST(round(value * 100.0, 0) AS BIGINT) AS vc,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |cf AS (
        |  SELECT vc, c, CAST(sum(c) OVER (ORDER BY vc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM vf),
        |nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vf),
        |th AS (
        |  SELECT min(vc) AS u FROM cf CROSS JOIN nt
        |  WHERE cum >= (95 * n + 99) // 100),
        |mom AS (
        |  SELECT max(u) AS u, CAST(sum(c) AS BIGINT) AS ne,
        |    sum(CAST(c * (vc - u) AS HUGEINT)) AS se,
        |    sum(CAST(c * (vc - u) * (vc - u) AS HUGEINT)) AS see
        |  FROM vf CROSS JOIN th WHERE vc > u),
        |fit AS (
        |  SELECT *, CAST(se AS DOUBLE) / CAST(ne AS DOUBLE) AS m,
        |    CAST(ne * see - se * se AS DOUBLE)
        |      / CAST(ne * (ne - 1) AS DOUBLE) AS v
        |  FROM mom CROSS JOIN nt),
        |x AS (
        |  SELECT *, 0.5 * (1.0 - m * m / nullif(v, 0.0)) AS xi FROM fit),
        |sg AS (
        |  SELECT *, m * (1.0 - xi) AS sigma,
        |    CAST(ne AS DOUBLE) / CAST(n AS DOUBLE) AS zeta
        |  FROM x),
        |rl AS (
        |  SELECT *, CAST(u AS DOUBLE) + sigma / nullif(xi, 0.0)
        |    * (exp(xi * ln(100000.0 * zeta)) - 1.0) AS rl
        |  FROM sg)
        |SELECT CAST(u AS DOUBLE) / 100.0 + 0.0 AS threshold,
        |  ne AS n_exceed,
        |  round(xi, 6) + 0.0 AS xi,
        |  round(sigma / 100.0, 6) + 0.0 AS sigma,
        |  round(rl / 100.0, 4) + 0.0 AS return_level_100k
        |FROM rl""".stripMargin,
    // same per-user pre/post centi frame and md5 arms as q239, same
    // exact first-difference moments, same Welch dag on the exact
    // integers, same raw-dag 1.96 compare
    "q243_did" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100, 0) AS BIGINT) AS vc
        |  FROM events),
        |cut AS (SELECT (min(us) + max(us)) // 2 AS cut_us FROM ev),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN us < cut_us THEN vc ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN us >= cut_us THEN vc ELSE 0 END) AS BIGINT) AS y
        |  FROM ev CROSS JOIN cut GROUP BY user_id),
        |ua AS (
        |  SELECT x, y, y - x AS d,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 < 50 THEN 1 ELSE 0 END AS ia
        |  FROM u),
        |m AS (
        |  SELECT CAST(sum(ia) AS BIGINT) AS na,
        |    CAST(sum(1 - ia) AS BIGINT) AS nb,
        |    sum(CAST(x * ia AS HUGEINT)) AS sxa,
        |    sum(CAST(y * ia AS HUGEINT)) AS sya,
        |    sum(CAST(x * (1 - ia) AS HUGEINT)) AS sxb,
        |    sum(CAST(y * (1 - ia) AS HUGEINT)) AS syb,
        |    sum(CAST(d * ia AS HUGEINT)) AS sda,
        |    sum(CAST(d * (1 - ia) AS HUGEINT)) AS sdb,
        |    sum(CAST(d * d * ia AS HUGEINT)) AS sdda,
        |    sum(CAST(d * d * (1 - ia) AS HUGEINT)) AS sddb
        |  FROM ua),
        |v AS (
        |  SELECT *,
        |    CAST(na * sdda - sda * sda AS DOUBLE)
        |      / CAST(na * (na - 1) AS DOUBLE) AS va,
        |    CAST(nb * sddb - sdb * sdb AS DOUBLE)
        |      / CAST(nb * (nb - 1) AS DOUBLE) AS vb,
        |    CAST(sda AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(sdb AS DOUBLE) / CAST(nb AS DOUBLE) AS did_c
        |  FROM m),
        |t AS (
        |  SELECT *,
        |    sqrt(va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE)) AS se_c
        |  FROM v)
        |SELECT na AS n_a, nb AS n_b,
        |  round(CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0, 6) + 0.0
        |    AS pre_a,
        |  round(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) / 100.0, 6) + 0.0
        |    AS post_a,
        |  round(CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0, 6) + 0.0
        |    AS pre_b,
        |  round(CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0, 6) + 0.0
        |    AS post_b,
        |  round(did_c / 100.0, 6) + 0.0 AS did,
        |  round(se_c / 100.0, 6) + 0.0 AS se,
        |  round(did_c / nullif(se_c, 0.0), 4) + 0.0 AS t_stat,
        |  abs(did_c / nullif(se_c, 0.0)) > 1.96 AS significant
        |FROM t""".stripMargin,
    "q239_cuped" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100, 0) AS BIGINT) AS vc
        |  FROM events),
        |cut AS (SELECT (min(us) + max(us)) // 2 AS cut_us FROM ev),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN us < cut_us THEN vc ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN us >= cut_us THEN vc ELSE 0 END) AS BIGINT) AS y
        |  FROM ev CROSS JOIN cut GROUP BY user_id),
        |ua AS (
        |  SELECT x, y,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 < 50 THEN 1 ELSE 0 END AS ia
        |  FROM u),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x * y AS HUGEINT)) AS sxy,
        |    sum(CAST(x * x AS HUGEINT)) AS sxx,
        |    sum(CAST(y * y AS HUGEINT)) AS syy,
        |    CAST(sum(ia) AS BIGINT) AS na,
        |    sum(CAST(x * ia AS HUGEINT)) AS sxa,
        |    sum(CAST(y * ia AS HUGEINT)) AS sya
        |  FROM ua),
        |d AS (
        |  SELECT *, n - na AS nb, sx - sxa AS sxb, sy - sya AS syb,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS num_d,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS den_d,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS deny_d
        |  FROM m),
        |t AS (
        |  SELECT *, num_d / nullif(den_d, 0.0) AS theta_raw,
        |    CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE) AS diff_raw_c,
        |    CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE) AS dx_c
        |  FROM d)
        |SELECT n AS n_users, na AS n_a, nb AS n_b,
        |  round(theta_raw, 6) + 0.0 AS theta,
        |  round(diff_raw_c / 100.0, 6) + 0.0 AS diff_raw,
        |  round((diff_raw_c - theta_raw * dx_c) / 100.0, 6) + 0.0 AS diff_cuped,
        |  round(num_d * num_d / nullif(den_d * deny_d, 0.0), 6) + 0.0
        |    AS var_reduction
        |FROM t""".stripMargin,
    // same per-centivalue arm counts, same exact 2·midrank posting
    // (naive single window — the oracle may scan), same literal-order
    // IEEE dag from the exact integers, same raw-dag χ²₃ compare
    "q237_kruskal_wallis" ->
      """WITH s AS (
        |  SELECT CAST(round(value * 100, 0) AS BIGINT) AS vc,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |         AS BIGINT) % 100 AS b
        |  FROM events),
        |c AS (SELECT vc,
        |    CAST(sum(CASE WHEN b < 25 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN b >= 25 AND b < 50 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN b >= 50 AND b < 75 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |    CAST(sum(CASE WHEN b >= 75 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM s GROUP BY vc),
        |cum AS (SELECT c0, c1, c2, c3, t,
        |    2 * CAST(coalesce(sum(t) OVER (ORDER BY vc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      + t + 1 AS mr2
        |  FROM c),
        |r AS (SELECT CAST(sum(t) AS BIGINT) AS n,
        |    CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2, CAST(sum(c3) AS BIGINT) AS n3,
        |    sum(CAST(c0 * mr2 AS HUGEINT)) AS r2_0,
        |    sum(CAST(c1 * mr2 AS HUGEINT)) AS r2_1,
        |    sum(CAST(c2 * mr2 AS HUGEINT)) AS r2_2,
        |    sum(CAST(c3 * mr2 AS HUGEINT)) AS r2_3,
        |    sum(CAST(t AS HUGEINT) * t * t - t) AS t3t
        |  FROM cum),
        |h AS (SELECT *,
        |    CAST(n AS HUGEINT) * n * n - n AS n3n,
        |    3.0 * (CAST(r2_0 AS DOUBLE) * CAST(r2_0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |         + CAST(r2_1 AS DOUBLE) * CAST(r2_1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |         + CAST(r2_2 AS DOUBLE) * CAST(r2_2 AS DOUBLE) / CAST(n2 AS DOUBLE)
        |         + CAST(r2_3 AS DOUBLE) * CAST(r2_3 AS DOUBLE) / CAST(n3 AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
        |      - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h_raw
        |  FROM r),
        |ht AS (SELECT *,
        |    h_raw * CAST(n3n AS DOUBLE) / CAST(n3n - t3t AS DOUBLE) AS h_tied_raw
        |  FROM h)
        |SELECT n, n0, n1, n2, n3,
        |  CAST(r2_0 AS BIGINT) AS r2_0, CAST(r2_1 AS BIGINT) AS r2_1,
        |  CAST(r2_2 AS BIGINT) AS r2_2, CAST(r2_3 AS BIGINT) AS r2_3,
        |  round(h_raw, 4) + 0.0 AS h_stat,
        |  round(h_tied_raw, 4) + 0.0 AS h_tied,
        |  h_tied_raw > 7.814727903251179 AS significant
        |FROM ht""".stripMargin,
    // same cell frame, same 0..N gridded ln-factorial prefix sums
    // (naive single window — the oracle may scan), same BIGINT pmf
    // dags, same 1e-12 tail sum and exact significance compare
    "q231_fisher_exact" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 90.0
        |             THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY user_id),
        |ua AS (
        |  SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |                    AS BIGINT) % 100 < 50 THEN 1 ELSE 0 END AS ia, y
        |  FROM u),
        |cells AS (
        |  SELECT CAST(sum(ia * y) AS BIGINT) AS a,
        |         CAST(sum(ia * (1 - y)) AS BIGINT) AS b,
        |         CAST(sum((1 - ia) * y) AS BIGINT) AS c,
        |         CAST(sum((1 - ia) * (1 - y)) AS BIGINT) AS d
        |  FROM ua),
        |m AS (SELECT a, b, c, d, a + b AS na, c + d AS nb, a + c AS kk,
        |             b + d AS nk, a + b + c + d AS n
        |      FROM cells),
        |ints AS (
        |  SELECT j, CASE WHEN j <= 1 THEN 0
        |                 ELSE CAST(floor(ln(CAST(j AS DOUBLE)) * 1.0e9) AS BIGINT)
        |            END AS l9
        |  FROM (SELECT unnest(generate_series(0, (SELECT n FROM m))) AS j)),
        |lf AS (
        |  SELECT j, CAST(sum(l9) OVER (ORDER BY j ROWS UNBOUNDED PRECEDING)
        |                 AS BIGINT) AS lf9
        |  FROM ints),
        |c9 AS (
        |  SELECT m.a, m.b, m.c, m.d, m.na, m.nb, m.kk,
        |    l1.lf9 + l2.lf9 + l3.lf9 + l4.lf9 - l5.lf9 AS const9
        |  FROM m JOIN lf l1 ON l1.j = m.na JOIN lf l2 ON l2.j = m.nb
        |         JOIN lf l3 ON l3.j = m.kk JOIN lf l4 ON l4.j = m.nk
        |         JOIN lf l5 ON l5.j = m.n),
        |ks AS (
        |  SELECT a, b, c, d, na, nb, kk, const9,
        |    unnest(generate_series(greatest(0, kk - nb), least(na, kk))) AS k
        |  FROM c9),
        |ks2 AS (
        |  SELECT a, b, c, d, const9, k, na - k AS ak, kk - k AS kx,
        |         nb - kk + k AS bk
        |  FROM ks),
        |pmf AS (
        |  SELECT ks2.a, ks2.b, ks2.c, ks2.d, ks2.k,
        |    ks2.const9 - f1.lf9 - f2.lf9 - f3.lf9 - f4.lf9 AS lnp9
        |  FROM ks2 JOIN lf f1 ON f1.j = ks2.k JOIN lf f2 ON f2.j = ks2.ak
        |           JOIN lf f3 ON f3.j = ks2.kx JOIN lf f4 ON f4.j = ks2.bk),
        |e AS (
        |  SELECT a, b, c, d, k, lnp9,
        |    CAST(floor(exp(CAST(lnp9 AS DOUBLE) / 1.0e9) * 1.0e12) AS BIGINT)
        |      AS e12
        |  FROM pmf),
        |obs AS (SELECT lnp9 AS obs9 FROM e WHERE k = a),
        |p AS (
        |  SELECT a, b, c, d, CAST(sum(e12) AS BIGINT) AS p12
        |  FROM e, obs WHERE lnp9 <= obs9 GROUP BY 1, 2, 3, 4)
        |SELECT a AS n_a, b AS n_b, c AS n_c, d AS n_d,
        |  round(CAST(a * d AS DOUBLE) / nullif(CAST(b * c AS DOUBLE), 0.0), 6)
        |    + 0.0 AS odds_ratio,
        |  round(CAST(p12 AS DOUBLE) / 1.0e12, 6) + 0.0 AS p_two_sided,
        |  p12 * 20 < 1000000000000 AS significant
        |FROM p""".stripMargin,
    // same per-(arm, centivalue) frame, same positional lower-median,
    // exact HUGEINT z-moments cast once, same F dag and exact-literal
    // significance compare
    "q216_brown_forsythe" ->
      """WITH pv AS (
        |  SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |                    AS BIGINT) % 100 < 50 THEN 'A' ELSE 'B' END AS arm,
        |         CAST(round(value * 100.0, 0) AS BIGINT) AS vc,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT arm, vc, c,
        |    sum(c) OVER (PARTITION BY arm ORDER BY vc
        |                 ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(c) OVER (PARTITION BY arm) AS n
        |  FROM pv),
        |meds AS (
        |  SELECT arm, min(CASE WHEN cum * 2 >= n THEN vc END) AS med,
        |         max(n) AS n
        |  FROM cum GROUP BY arm),
        |z AS (
        |  SELECT pv.arm, max(meds.n) AS n, max(meds.med) AS med,
        |    CAST(sum(CAST(abs(pv.vc - meds.med) * pv.c AS HUGEINT)) AS DOUBLE) AS s,
        |    CAST(sum(CAST(abs(pv.vc - meds.med) * abs(pv.vc - meds.med) * pv.c
        |                  AS HUGEINT)) AS DOUBLE) AS q
        |  FROM pv JOIN meds USING (arm) GROUP BY pv.arm),
        |w AS (
        |  SELECT a.n AS na, b.n AS nb, a.med AS ma, b.med AS mb,
        |    a.s * a.s / CAST(a.n AS DOUBLE) + b.s * b.s / CAST(b.n AS DOUBLE)
        |      - (a.s + b.s) * (a.s + b.s) / CAST(a.n + b.n AS DOUBLE) AS ssb,
        |    a.q + b.q - (a.s * a.s / CAST(a.n AS DOUBLE)
        |                 + b.s * b.s / CAST(b.n AS DOUBLE)) AS ssw
        |  FROM (SELECT * FROM z WHERE arm = 'A') a,
        |       (SELECT * FROM z WHERE arm = 'B') b),
        |f AS (
        |  SELECT na, nb, ma, mb,
        |    CAST(na + nb - 2 AS DOUBLE) * ssb / nullif(ssw, 0.0) AS f_raw
        |  FROM w)
        |SELECT na, nb,
        |  CAST(ma AS DOUBLE) / 100.0 AS median_a,
        |  CAST(mb AS DOUBLE) / 100.0 AS median_b,
        |  CAST(floor(f_raw * 1.0e6) AS DOUBLE) / 1.0e6 + 0.0 AS f_stat,
        |  f_raw > 3.8415999999999997 AS spread_differs
        |FROM f""".stripMargin,
    // q174's duration frame verbatim; per-time d/n on the 1e-9 grid,
    // d(n−d)/n³ on the 1e-12 grid, exact BIGINT cumulations, one exp
    "q217_nelson_aalen" ->
      """WITH u AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS f,
        |    min(CASE WHEN event_type = 'error' THEN CAST(ts AS DATE) END) AS p,
        |    max(CAST(ts AS DATE)) AS l
        |  FROM events GROUP BY user_id),
        |dur AS (
        |  SELECT CASE WHEN p IS NOT NULL THEN date_diff('day', f, p)
        |              ELSE date_diff('day', f, l) END AS dur,
        |         CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS obs
        |  FROM u),
        |vc AS (
        |  SELECT dur, CAST(sum(obs) AS BIGINT) AS d_t,
        |         CAST(count(*) AS BIGINT) AS a_t
        |  FROM dur GROUP BY dur),
        |risk AS (
        |  SELECT dur, d_t,
        |    sum(a_t) OVER (ORDER BY dur
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_t
        |  FROM vc),
        |terms AS (
        |  SELECT dur, d_t, n_t,
        |    CAST(floor(CAST(d_t AS DOUBLE) / CAST(n_t AS DOUBLE) * 1.0e9)
        |         AS BIGINT) AS h9,
        |    CAST(floor(CAST(d_t * (n_t - d_t) AS DOUBLE)
        |               / CAST(n_t * n_t * n_t AS DOUBLE) * 1.0e12)
        |         AS BIGINT) AS v12
        |  FROM risk),
        |cum AS (
        |  SELECT dur, d_t, n_t,
        |    sum(h9) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS cum_h9,
        |    sum(v12) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS cum_v12
        |  FROM terms)
        |SELECT CAST(dur AS INT) AS t_days, n_t AS n_risk, d_t AS d_events,
        |  CAST(cum_h9 // 1000 AS DOUBLE) / 1.0e6 + 0.0 AS cum_hazard,
        |  CAST(cum_v12 // 1000 AS DOUBLE) / 1.0e9 + 0.0 AS hazard_var,
        |  CAST(floor(exp(-CAST(cum_h9 AS DOUBLE) / 1.0e9) * 1.0e6) AS DOUBLE)
        |    / 1.0e6 + 0.0 AS fh_survival
        |FROM cum WHERE d_t > 0 ORDER BY t_days""".stripMargin,
    // same ≤4-row score-bin frame, exact BIGINT moments and T, the
    // variance product on HUGEINT cast once, same z dag + exact-literal
    // trend call
    "q218_cochran_armitage" ->
      """WITH ub AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
        |    max(CASE WHEN event_type = 'purchase' AND value > 90.0
        |             THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY user_id),
        |bins AS (
        |  SELECT least(views // 5, 3) AS sc, CAST(count(*) AS BIGINT) AS n_i,
        |         CAST(sum(y) AS BIGINT) AS r_i
        |  FROM ub GROUP BY 1),
        |m AS (
        |  SELECT CAST(sum(n_i) AS BIGINT) AS nn, CAST(sum(r_i) AS BIGINT) AS rr,
        |    CAST(sum(sc * r_i) AS BIGINT) AS ssr,
        |    CAST(sum(sc * n_i) AS BIGINT) AS ssn,
        |    CAST(sum(sc * sc * n_i) AS BIGINT) AS ss2n
        |  FROM bins),
        |d AS (
        |  SELECT nn, rr, nn * ssr - rr * ssn AS t_num,
        |    CAST(CAST(rr AS HUGEINT) * (nn - rr)
        |         * (nn * ss2n - ssn * ssn) AS DOUBLE) AS var_num
        |  FROM m),
        |zd AS (
        |  SELECT nn, rr, t_num,
        |    CAST(t_num AS DOUBLE) * sqrt(CAST(nn AS DOUBLE))
        |      / nullif(sqrt(var_num), 0.0) AS z_raw
        |  FROM d)
        |SELECT nn AS n_users, rr AS n_converted, t_num AS trend_num,
        |  round(z_raw, 6) + 0.0 AS z,
        |  z_raw * z_raw > 3.8415999999999997 AS trend_detected
        |FROM zd""".stripMargin,
    // same daily frame, same exact pair-sign sum and ×18 tie-corrected
    // variance, same continuity-corrected z and 1.96 call
    "q214_mann_kendall" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |dx AS (SELECT date_diff('day', DATE '2024-01-01', d) AS x, sv FROM daily),
        |s AS (
        |  SELECT CAST(sum(CAST(sign(CAST(r.sv - l.sv AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_stat
        |  FROM dx l JOIN dx r ON l.x < r.x),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dx),
        |t AS (
        |  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tt
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM dx GROUP BY sv)),
        |f AS (
        |  SELECT s_stat, n, n * (n - 1) * (2 * n + 5) - tt AS vs18
        |  FROM s, n, t),
        |z AS (
        |  SELECT n, s_stat, vs18,
        |    CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
        |           / sqrt(nullif(CAST(vs18 AS DOUBLE) / 18.0, 0.0))
        |         WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
        |           / sqrt(nullif(CAST(vs18 AS DOUBLE) / 18.0, 0.0))
        |         ELSE 0.0 END AS z
        |  FROM f)
        |SELECT n AS n_days, s_stat, vs18 AS var_s_x18,
        |  round(z, 6) + 0.0 AS mk_z,
        |  CASE WHEN z > 1.96 THEN 'increasing'
        |       WHEN z < -1.96 THEN 'decreasing'
        |       ELSE 'none' END AS trend
        |FROM z""".stripMargin,
    // q145's cumulative frames + the next-value gaps; exact HUGEINT
    // cross-product terms, one final division
    "q215_wasserstein" ->
      """WITH pv AS (
        |  SELECT CAST(round(value * 100.0, 0) AS BIGINT) AS vc,
        |    CAST(sum(CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |                       AS BIGINT) % 100 < 50 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |                       AS BIGINT) % 100 < 50 THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM events GROUP BY 1),
        |cum AS (
        |  SELECT vc,
        |    sum(ca) OVER (ORDER BY vc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca_le,
        |    sum(cb) OVER (ORDER BY vc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb_le,
        |    coalesce(lead(vc) OVER (ORDER BY vc) - vc, 0) AS gap
        |  FROM pv),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |               CAST(sum(cb) AS BIGINT) AS nb FROM pv)
        |SELECT na, nb, CAST(count(*) AS BIGINT) AS n_values,
        |  round(CAST(sum(CAST(abs(ca_le * nb - cb_le * na) * gap AS HUGEINT))
        |             AS DOUBLE)
        |        / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) / 100.0, 6) + 0.0
        |    AS wasserstein_1
        |FROM cum, tot
        |GROUP BY na, nb""".stripMargin,
    // same joint value cells, same exact-integer concordance sums and
    // tie terms, same single √-and-divide dag
    "q204_kendall_tau" ->
      """WITH m AS (
        |  SELECT len(list_filter(string_split(text, ' '), x -> x <> '')) AS nw,
        |         len(list_distinct(list_filter(string_split(text, ' '),
        |                                       x -> x <> ''))) AS ndw
        |  FROM documents),
        |d AS (
        |  SELECT CAST(nw AS BIGINT) AS x,
        |         CAST((100 * ndw) // nw AS BIGINT) AS y
        |  FROM m WHERE nw > 0),
        |cells AS (
        |  SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
        |cd AS (
        |  SELECT
        |    sum(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END) AS nc,
        |    sum(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END) AS nd
        |  FROM cells a JOIN cells b ON a.x < b.x),
        |tots AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |tx AS (
        |  SELECT sum(t * (t - 1) // 2) AS n1
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM d GROUP BY x)),
        |ty AS (
        |  SELECT sum(t * (t - 1) // 2) AS n2
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM d GROUP BY y)),
        |f AS (
        |  SELECT n, nc, nd, n1, n2, n * (n - 1) // 2 AS n0
        |  FROM cd, tots, tx, ty)
        |SELECT n AS n_docs, nc AS concordant, nd AS discordant,
        |  n1 AS ties_x, n2 AS ties_y,
        |  CAST(floor(CAST(nc - nd AS DOUBLE)
        |             / nullif(sqrt(CAST(n0 - n1 AS DOUBLE)
        |                           * CAST(n0 - n2 AS DOUBLE)), 0.0)
        |             * 1.0e6) AS DOUBLE) / 1.0e6 + 0.0
        |    AS kendall_tau_b
        |FROM f""".stripMargin,
    "q120_ols_probe" -> q120OracleSql,
    // same duration-value frame, same reverse-cumulative risk set, same
    // ln 10⁻⁹ grid + exact cumsum + single exp; d = n forces 0 exactly
    "q174_kaplan_meier" ->
      """WITH u AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS f,
        |    min(CASE WHEN event_type = 'error'
        |             THEN CAST(ts AS DATE) END) AS p,
        |    max(CAST(ts AS DATE)) AS l
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT CASE WHEN p IS NOT NULL THEN p - f ELSE l - f END AS dur,
        |    CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS obs
        |  FROM u),
        |vc AS (
        |  SELECT dur, CAST(sum(obs) AS BIGINT) AS d_t,
        |    CAST(count(*) AS BIGINT) AS a_t
        |  FROM d GROUP BY 1),
        |r AS (
        |  SELECT dur, d_t,
        |    sum(a_t) OVER (ORDER BY dur
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_t
        |  FROM vc),
        |g AS (
        |  SELECT dur, d_t, n_t,
        |    CASE WHEN d_t = n_t THEN CAST(0 AS BIGINT)
        |         ELSE CAST(floor(ln(CAST(n_t - d_t AS DOUBLE)
        |                             / CAST(n_t AS DOUBLE)) * 1.0e9)
        |              AS BIGINT) END AS lf,
        |    CASE WHEN d_t = n_t THEN 1 ELSE 0 END AS zflag
        |  FROM r),
        |c AS (
        |  SELECT dur, d_t, n_t,
        |    sum(lf) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_lf,
        |    sum(zflag) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zcum
        |  FROM g)
        |SELECT CAST(dur AS INT) AS t_days,
        |  CAST(n_t AS BIGINT) AS n_risk,
        |  d_t AS d_events,
        |  CASE WHEN zcum > 0 THEN 0.0
        |       ELSE round(exp(CAST(cum_lf AS DOUBLE) / 1.0e9), 6) + 0.0 END
        |    AS survival
        |FROM c WHERE d_t > 0 ORDER BY t_days""".stripMargin,
    // same ×2-integer average ranks from value-count frames, exact
    // HUGEINT moments, same closed-form ρ / r dags
    "q169_spearman" ->
      """WITH d0 AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS nw,
        |    len(list_distinct(
        |      list_filter(string_split(text, ' '), t -> t <> ''))) AS ndw,
        |    list_sum(list_transform(string_split(text, ' '),
        |      t -> length(t))) AS x0
        |  FROM documents),
        |m AS (
        |  SELECT CAST(x0 AS BIGINT) AS x,
        |    CAST((100 * ndw) // nw AS BIGINT) AS y
        |  FROM d0 WHERE nw > 0),
        |vx AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM m GROUP BY x),
        |rmx AS (
        |  SELECT x,
        |    2 * coalesce(sum(cnt) OVER (ORDER BY x
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + cnt + 1 AS r2x
        |  FROM vx),
        |vy AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM m GROUP BY y),
        |rmy AS (
        |  SELECT y,
        |    2 * coalesce(sum(cnt) OVER (ORDER BY y
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + cnt + 1 AS r2y
        |  FROM vy),
        |r AS (
        |  SELECT m.x, m.y, rmx.r2x, rmy.r2y
        |  FROM m JOIN rmx USING (x) JOIN rmy USING (y)),
        |mo AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(r2x AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(r2y AS HUGEINT)) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(r2x AS HUGEINT) * CAST(r2x AS HUGEINT)) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(r2x AS HUGEINT) * CAST(r2y AS HUGEINT)) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(r2y AS HUGEINT) * CAST(r2y AS HUGEINT)) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS rx,
        |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS ry,
        |    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE) AS rxx,
        |    CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS rxy,
        |    CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS ryy
        |  FROM r)
        |SELECT CAST(n AS BIGINT) AS n_docs,
        |  round((n * sxy - sx * sy)
        |        / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0
        |    AS spearman_rho,
        |  round((n * rxy - rx * ry)
        |        / sqrt((n * rxx - rx * rx) * (n * ryy - ry * ry)), 6) + 0.0
        |    AS pearson_r
        |FROM mo""".stripMargin,
    // weighted quantiles from the definition: smallest value whose
    // cumulative weight reaches k·W/4 — all-integer comparison, same
    // centi snapping as the Spark side
    "q153_weighted_quantiles" ->
      """WITH pv AS (
        |  SELECT l_returnflag AS f,
        |    CAST(round(l_extendedprice * 100.0, 0) AS BIGINT) AS vc,
        |    CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT f, vc, w,
        |    CAST(sum(w) OVER (PARTITION BY f ORDER BY vc) AS BIGINT) AS cum_le,
        |    CAST(sum(w) OVER (PARTITION BY f) AS BIGINT) AS tot
        |  FROM pv)
        |SELECT f AS l_returnflag,
        |  CAST(max(tot) AS BIGINT) AS w_total,
        |  min(CASE WHEN cum_le * 4 >= tot THEN vc END) AS wp25_centi,
        |  min(CASE WHEN cum_le * 4 >= tot * 2 THEN vc END) AS wp50_centi,
        |  min(CASE WHEN cum_le * 4 >= tot * 3 THEN vc END) AS wp75_centi
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // winsorized mean: same definition-spelled order statistics, the
    // clamped sum on the count frame, all-integer outputs
    "q161_winsorized_mean" ->
      """WITH pv AS (
        |  SELECT event_type,
        |    CAST(round(value * 100.0, 0) AS BIGINT) AS vc,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, vc, c,
        |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY vc)
        |         AS BIGINT) AS cum_le,
        |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM pv),
        |cut AS (
        |  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |    min(CASE WHEN cum_le * 20 >= n THEN vc END) AS lo,
        |    min(CASE WHEN cum_le * 20 >= n * 19 THEN vc END) AS hi
        |  FROM cum GROUP BY 1)
        |SELECT pv.event_type, cut.n,
        |  CAST(cut.lo AS BIGINT) AS p5_centi,
        |  CAST(cut.hi AS BIGINT) AS p95_centi,
        |  CAST(sum(c * greatest(least(vc, hi), lo)) AS BIGINT) AS wsum_centi,
        |  CAST((sum(c * greatest(least(vc, hi), lo)) * 10000)
        |       // (cut.n * 100) AS BIGINT) AS wmean_micro
        |FROM pv JOIN cut USING (event_type)
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    // split-conformal: same md5 split, common-denominator integer
    // residuals, definition-spelled rank selection, integer coverage
    "q158_conformal_interval" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(round(value * 100.0, 0) AS BIGINT) AS vc,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
        |         AS BIGINT) % 100 AS b
        |  FROM events),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_tr,
        |    CAST(sum(vc) AS BIGINT) AS sv
        |  FROM e WHERE b < 34 GROUP BY 1),
        |rc AS (
        |  SELECT e.event_type, abs(vc * n_tr - sv) AS r,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM e JOIN m USING (event_type)
        |  WHERE b >= 34 AND b < 67 GROUP BY 1, 2),
        |nc AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_cal
        |       FROM rc GROUP BY 1),
        |cum AS (
        |  SELECT event_type, r,
        |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY r)
        |         AS BIGINT) AS cum_le
        |  FROM rc),
        |q AS (
        |  SELECT cum.event_type, nc.n_cal, m.n_tr, m.sv,
        |    min(CASE WHEN cum_le * 10 >= (n_cal + 1) * 9 THEN r END) AS qhat_num
        |  FROM cum JOIN nc USING (event_type) JOIN m USING (event_type)
        |  GROUP BY 1, 2, 3, 4)
        |SELECT e.event_type, q.n_tr, q.n_cal,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(max(q.qhat_num) AS BIGINT) AS qhat_num,
        |  CAST(max(q.qhat_num) // q.n_tr AS BIGINT) AS qhat_centi_floor,
        |  CAST(sum(CASE WHEN abs(vc * q.n_tr - q.sv) <= q.qhat_num
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  CAST((sum(CASE WHEN abs(vc * q.n_tr - q.sv) <= q.qhat_num
        |       THEN 1 ELSE 0 END) * 10000) // count(*) AS BIGINT) AS coverage_bp
        |FROM e JOIN q USING (event_type) WHERE b >= 67
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    // CUSUM over the day frame: identical exact-integer cross-multiplied
    // deviations, one double division at the end, earliest-peak tie-break
    "q156_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sv_centi
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_events) AS BIGINT) AS nn,
        |    CAST(sum(sv_centi) AS BIGINT) AS svv
        |  FROM daily),
        |cum AS (
        |  SELECT d, n_events, sv_centi, nn,
        |    CAST(sum(sv_centi * nn - n_events * svv)
        |         OVER (ORDER BY d) AS BIGINT) AS cusum
        |  FROM daily, tot),
        |pk AS (
        |  SELECT min(d) AS peak_d FROM cum
        |  WHERE abs(cusum) = (SELECT max(abs(cusum)) FROM cum))
        |SELECT d, n_events, sv_centi,
        |  cusum AS cusum_num,
        |  d = peak_d AS is_peak
        |FROM cum, pk ORDER BY d""".stripMargin,
    "q145_ks_drift" ->
      """WITH s AS (
        |  SELECT CAST(round(value * 100, 0) AS BIGINT) AS vc,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 < 50 THEN 1 ELSE 0 END AS a
        |  FROM events),
        |c AS (SELECT vc, CAST(sum(a) AS BIGINT) AS ca,
        |             CAST(count(*) - sum(a) AS BIGINT) AS cb
        |      FROM s GROUP BY vc),
        |cum AS (SELECT vc,
        |               sum(ca) OVER (ORDER BY vc) AS ca_le,
        |               sum(cb) OVER (ORDER BY vc) AS cb_le
        |        FROM c),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |             CAST(sum(cb) AS BIGINT) AS nb FROM c),
        |d AS (SELECT vc, CAST(abs(ca_le * nb - cb_le * na) AS BIGINT) AS d,
        |             na, nb
        |      FROM cum, t)
        |SELECT na, nb, d AS ks_num,
        |       round(CAST(d AS DOUBLE)
        |             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
        |         + 0.0 AS ks_d,
        |       vc AS ks_at_centi
        |FROM d ORDER BY d DESC, vc ASC LIMIT 1""".stripMargin,
    "q146_anova" ->
      """WITH g AS (
        |  SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n_g,
        |         CAST(CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT))
        |                   AS DECIMAL(38,0)) AS DOUBLE) AS s_g,
        |         CAST(CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)
        |                       * CAST(round(l_quantity * 100, 0) AS BIGINT))
        |                   AS DECIMAL(38,0)) AS DOUBLE) AS ss_g
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(n_g) AS BIGINT) AS n, sum(s_g) AS s,
        |             CAST(count(*) AS BIGINT) AS k FROM g)
        |SELECT flag, n_g, k AS k_groups, n AS n_rows,
        |       round(s_g / CAST(n_g AS DOUBLE) / 100.0, 6) + 0.0 AS mean_g,
        |       round(CAST(n_g AS DOUBLE)
        |             * (s_g / CAST(n_g AS DOUBLE) / 100.0
        |                - s / CAST(n AS DOUBLE) / 100.0)
        |             * (s_g / CAST(n_g AS DOUBLE) / 100.0
        |                - s / CAST(n AS DOUBLE) / 100.0), 4) + 0.0 AS ssb_part,
        |       round((ss_g - s_g * s_g / CAST(n_g AS DOUBLE)) / 10000.0, 4)
        |         + 0.0 AS ssw_part
        |FROM g, t ORDER BY flag""".stripMargin,
    "q152_bootstrap_ci" ->
      """WITH base AS (
        |  SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS vc
        |  FROM events),
        |rep AS (
        |  SELECT h.hj * 3 + s.s AS b, vc,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
        |           || CAST(h.hj AS VARCHAR)), 1 + 10 * s.s, 10)
        |         AS BIGINT) % 1000000 AS u
        |  FROM base, generate_series(0, 10) AS h(hj),
        |       generate_series(0, 2) AS s(s)
        |  WHERE h.hj * 3 + s.s <= 31),
        |mm AS (
        |  SELECT b, vc,
        |    CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
        |         WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
        |         WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5
        |         ELSE 6 END AS m
        |  FROM rep),
        |means AS (
        |  SELECT b, CAST(sum(m * vc) AS DOUBLE) / CAST(sum(m) AS DOUBLE)
        |            / 100.0 AS mean_b
        |  FROM mm GROUP BY b),
        |ranked AS (SELECT b, mean_b,
        |             row_number() OVER (ORDER BY mean_b, b) AS rk
        |           FROM means),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(vc) AS BIGINT) AS sv FROM base)
        |SELECT n,
        |  round(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) + 0.0
        |    AS mean_value,
        |  round((SELECT mean_b FROM ranked WHERE rk = 2), 6) + 0.0 AS ci_lo,
        |  round((SELECT mean_b FROM ranked WHERE rk = 31), 6) + 0.0 AS ci_hi
        |FROM tot""".stripMargin,
    // Independent spelling: the rank-sum identity 2·U_A = 2·R_A − na·(na+1)
    // with midrank posting 2·R_A = Σ ca·(2·lt_all + t + 1) — the Spark side
    // derives 2·U_A from pairwise B-below counts instead, so a derivation
    // bug on either side cannot self-confirm.
    "q150_mann_whitney" ->
      """WITH s AS (
        |  SELECT CAST(round(value * 100, 0) AS BIGINT) AS vc,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 < 50 THEN 1 ELSE 0 END AS a
        |  FROM events),
        |c AS (SELECT vc, CAST(sum(a) AS BIGINT) AS ca,
        |             CAST(count(*) - sum(a) AS BIGINT) AS cb
        |      FROM s GROUP BY vc),
        |cum AS (SELECT vc, ca, cb, ca + cb AS t,
        |        CAST(coalesce(sum(ca + cb) OVER (ORDER BY vc
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS lt_all
        |        FROM c),
        |r AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |             CAST(sum(cb) AS BIGINT) AS nb,
        |             CAST(sum(ca * (2 * lt_all + t + 1)) AS BIGINT) AS r2a,
        |             CAST(sum(t * t * t - t) AS BIGINT) AS t3t,
        |             CAST(sum(t) AS BIGINT) AS n
        |      FROM cum),
        |u AS (SELECT na, nb, n, t3t, r2a - na * (na + 1) AS u2a FROM r)
        |SELECT na, nb, CAST(u2a AS BIGINT) AS u2_a,
        |  round(CAST(u2a AS DOUBLE)
        |        / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) - 1.0, 6) + 0.0
        |    AS rank_biserial,
        |  round(round(
        |    (CAST(u2a AS DOUBLE) - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
        |    / (2.0 * sqrt((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
        |        * CAST(CAST(n AS HUGEINT) * n * n - n - t3t AS DOUBLE))
        |        / (12.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))),
        |    6), 4) + 0.0 AS z_stat
        |FROM u""".stripMargin,
    "q86_chi_square" ->
      """WITH obs AS (
        |  SELECT event_type, user_id % 3 AS tier, count(*) AS obs
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, sum(obs) AS row_n FROM obs GROUP BY 1),
        |ct AS (SELECT tier, sum(obs) AS col_n FROM obs GROUP BY 1),
        |g AS (SELECT sum(obs) AS n FROM obs)
        |SELECT o.event_type, o.tier, o.obs,
        |       round(CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
        |             / CAST(n AS DOUBLE), 4) + 0.0 AS expected,
        |       round((o.obs - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
        |                      / CAST(n AS DOUBLE))
        |             * (o.obs - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
        |                        / CAST(n AS DOUBLE))
        |             / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
        |                / CAST(n AS DOUBLE)), 6) + 0.0 AS chi2_cell
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
        |g AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(conv) AS BIGINT) AS k
        |      FROM u GROUP BY variant),
        |a AS (SELECT n AS na, k AS ka FROM g WHERE variant = 'A'),
        |b AS (SELECT n AS nb, k AS kb FROM g WHERE variant = 'B'),
        |p AS (SELECT na, ka, nb, kb,
        |             CAST(ka AS DOUBLE) / CAST(na AS DOUBLE) AS pa,
        |             CAST(kb AS DOUBLE) / CAST(nb AS DOUBLE) AS pb,
        |             CAST(ka + kb AS DOUBLE) / CAST(na + nb AS DOUBLE) AS pp
        |      FROM a, b)
        |SELECT na, ka, round(pa, 6) + 0.0 AS rate_a,
        |       nb, kb, round(pb, 6) + 0.0 AS rate_b,
        |       round(round((pa - pb) /
        |             sqrt(pp * (CAST(1 AS DOUBLE) - pp)
        |                  * (CAST(1 AS DOUBLE) / CAST(na AS DOUBLE)
        |                     + CAST(1 AS DOUBLE) / CAST(nb AS DOUBLE))), 6),
        |             4) + 0.0 AS z_stat
        |FROM p""".stripMargin,
    // same exact (n, k) counts, same Wilson dag on identical operands
    "q201_wilson_interval" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT event_type, n, k,
        |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |    3.8415999999999997 / CAST(n AS DOUBLE) AS zz_n
        |  FROM g),
        |h AS (
        |  SELECT event_type, n, k, p, zz_n,
        |    1.96 * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
        |      + 3.8415999999999997
        |        / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |      / (1.0 + zz_n) AS half,
        |    (p + zz_n / 2.0) / (1.0 + zz_n) AS center
        |  FROM w)
        |SELECT event_type, n, k,
        |  round(p, 6) + 0.0 AS rate,
        |  round(center - half, 6) + 0.0 AS wilson_lo,
        |  round(center + half, 6) + 0.0 AS wilson_hi
        |FROM h ORDER BY event_type""".stripMargin,
    // same exact daily centi frame, identical pairwise-slope and
    // positional-median spellings
    "q198_theil_sen" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |dd AS (SELECT (d - DATE '2024-01-01') AS x, sv FROM daily),
        |p AS (
        |  SELECT l.x AS x1, r.x AS x2,
        |    CAST(r.sv - l.sv AS DOUBLE) / CAST(r.x - l.x AS DOUBLE) AS slope
        |  FROM dd l JOIN dd r ON l.x < r.x),
        |rk AS (
        |  SELECT slope, row_number() OVER (ORDER BY slope, x1, x2) AS rn,
        |    (SELECT CAST(count(*) AS BIGINT) FROM p) AS np
        |  FROM p),
        |med AS (
        |  SELECT CAST(sum(CAST(floor(slope * 1.0e9) AS BIGINT)) AS DOUBLE)
        |    / CAST(count(*) * 1000000000 AS DOUBLE) AS ts_slope_raw
        |  FROM rk WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM dd),
        |np2 AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM p),
        |rs AS (
        |  SELECT CAST(sv AS DOUBLE) - ts_slope_raw * CAST(x AS DOUBLE) AS res
        |  FROM dd CROSS JOIN med),
        |rr AS (
        |  SELECT res, row_number() OVER (ORDER BY res) AS rn,
        |    (SELECT CAST(count(*) AS BIGINT) FROM rs) AS nr
        |  FROM rs),
        |mr AS (
        |  SELECT CAST(sum(CAST(floor(res * 1.0e9) AS BIGINT)) AS DOUBLE)
        |    / CAST(count(*) * 1000000000 AS DOUBLE) AS icept_raw
        |  FROM rr WHERE rn = (nr + 1) // 2 OR rn = (nr + 2) // 2)
        |SELECT n_days, n_pairs,
        |  round(ts_slope_raw / 100.0, 6) + 0.0 AS ts_slope,
        |  round(icept_raw / 100.0, 4) + 0.0 AS ts_intercept
        |FROM nd CROSS JOIN np2 CROSS JOIN med CROSS JOIN mr""".stripMargin,
    // q174's KM chain + the rectangle integral on the same 1e-9 grid
    "q194_rmst" ->
      """WITH u AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS f,
        |    min(CASE WHEN event_type = 'error'
        |             THEN CAST(ts AS DATE) END) AS p,
        |    max(CAST(ts AS DATE)) AS l
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT CASE WHEN p IS NOT NULL THEN p - f ELSE l - f END AS dur,
        |    CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS obs
        |  FROM u),
        |vc AS (
        |  SELECT dur, CAST(sum(obs) AS BIGINT) AS d_t,
        |    CAST(count(*) AS BIGINT) AS a_t
        |  FROM d GROUP BY 1),
        |r AS (
        |  SELECT dur, d_t,
        |    sum(a_t) OVER (ORDER BY dur
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_t
        |  FROM vc),
        |g AS (
        |  SELECT dur, d_t, n_t,
        |    CASE WHEN d_t = n_t THEN CAST(0 AS BIGINT)
        |         ELSE CAST(floor(ln(CAST(n_t - d_t AS DOUBLE)
        |                             / CAST(n_t AS DOUBLE)) * 1.0e9)
        |              AS BIGINT) END AS lf,
        |    CASE WHEN d_t = n_t THEN 1 ELSE 0 END AS zflag
        |  FROM r),
        |c AS (
        |  SELECT dur, d_t,
        |    sum(lf) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_lf,
        |    sum(zflag) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zcum
        |  FROM g),
        |steps AS (
        |  SELECT dur,
        |    CASE WHEN zcum > 0 THEN 0.0
        |         ELSE exp(CAST(cum_lf AS DOUBLE) / 1.0e9) END AS surv
        |  FROM c WHERE d_t > 0),
        |rect AS (
        |  SELECT dur, surv, lead(dur) OVER (ORDER BY dur) AS next_t
        |  FROM steps),
        |a AS (
        |  SELECT CAST(floor(surv
        |    * (least(coalesce(next_t, 30), 30) - dur) * 1.0e9) AS BIGINT) AS a9
        |  FROM rect WHERE dur < 30),
        |h AS (SELECT CAST(least(min(dur), 30) AS BIGINT) * 1000000000 AS head9
        |      FROM steps),
        |t AS (SELECT CAST(sum(a9) AS BIGINT) AS tail9,
        |             CAST(count(*) AS BIGINT) AS n_steps
        |      FROM a)
        |SELECT 30 AS tau_days, n_steps,
        |  round(CAST(head9 + coalesce(tail9, 0) AS DOUBLE) / 1.0e9, 4) + 0.0
        |    AS rmst_days
        |FROM t CROSS JOIN h""".stripMargin,
    // same exact-centi bin edges, Laplace shares, per-bin 1e-9 grid
    // contributions summed exactly
    "q191_psi_drift" ->
      """WITH b AS (
        |  SELECT CASE WHEN cv < 500 THEN 0 WHEN cv < 1000 THEN 1
        |              WHEN cv < 2000 THEN 2 WHEN cv < 3500 THEN 3
        |              WHEN cv < 5500 THEN 4 WHEN cv < 8500 THEN 5
        |              WHEN cv < 13000 THEN 6 WHEN cv < 20000 THEN 7
        |              WHEN cv < 30000 THEN 8 ELSE 9 END AS bin,
        |    variant
        |  FROM (SELECT CAST(round(value * 100.0, 0) AS BIGINT) AS cv,
        |          CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |                    AS BIGINT) % 100 < 50 THEN 'A' ELSE 'B' END AS variant
        |        FROM events)),
        |c AS (
        |  SELECT bin,
        |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |             CAST(sum(cb) AS BIGINT) AS nb,
        |             CAST(count(*) AS BIGINT) AS nbins
        |      FROM c),
        |terms AS (
        |  SELECT bin, ca, cb,
        |    CAST(ca + 1 AS DOUBLE) / CAST(na + nbins AS DOUBLE) AS pa,
        |    CAST(cb + 1 AS DOUBLE) / CAST(nb + nbins AS DOUBLE) AS pb
        |  FROM c CROSS JOIN t),
        |g AS (
        |  SELECT bin, ca, cb, pa, pb,
        |    CAST(floor((pa - pb) * ln(pa / pb) * 1.0e9) AS BIGINT) AS c9
        |  FROM terms),
        |p AS (SELECT CAST(sum(c9) AS BIGINT) AS psi9 FROM g)
        |SELECT bin, ca, cb,
        |  round(pa, 6) + 0.0 AS share_a,
        |  round(pb, 6) + 0.0 AS share_b,
        |  round(CAST(c9 AS DOUBLE) / 1.0e9, 9) + 0.0 AS contrib,
        |  round(CAST(psi9 AS DOUBLE) / 1.0e9, 6) + 0.0 AS psi_total
        |FROM g CROSS JOIN p ORDER BY bin""".stripMargin,
    // same contingency + margins, cells on the same 1e-6 grid summed
    // exactly, identical V dag
    "q186_cramers_v" ->
      """WITH obs AS (
        |  SELECT event_type, user_id % 3 AS tier,
        |    CAST(count(*) AS BIGINT) AS obs
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS row_n
        |       FROM obs GROUP BY 1),
        |ct AS (SELECT tier, CAST(sum(obs) AS BIGINT) AS col_n
        |       FROM obs GROUP BY 1),
        |g AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
        |             CAST(count(DISTINCT event_type) AS BIGINT) AS r_levels,
        |             CAST(count(DISTINCT tier) AS BIGINT) AS c_levels
        |      FROM obs),
        |cells AS (
        |  SELECT n, r_levels, c_levels,
        |    CAST(round(round((obs - e) * (obs - e) / e, 6) * 1.0e6, 0) AS BIGINT)
        |      AS cell6
        |  FROM (SELECT o.obs,
        |          CAST(rt.row_n AS DOUBLE) * CAST(ct.col_n AS DOUBLE)
        |            / CAST(g.n AS DOUBLE) AS e,
        |          g.n, g.r_levels, g.c_levels
        |        FROM obs o JOIN rt USING (event_type)
        |        JOIN ct USING (tier) CROSS JOIN g)),
        |s AS (SELECT n, r_levels, c_levels,
        |             CAST(sum(cell6) AS BIGINT) AS chi2_6
        |      FROM cells GROUP BY 1, 2, 3)
        |SELECT n, r_levels, c_levels,
        |  round(CAST(chi2_6 AS DOUBLE) / 1.0e6, 6) + 0.0 AS chi2,
        |  round(sqrt(CAST(chi2_6 AS DOUBLE) / 1.0e6
        |        / CAST(n * (least(r_levels, c_levels) - 1) AS DOUBLE)), 6) + 0.0
        |    AS cramers_v
        |FROM s""".stripMargin,
    // same gridded z per event type, same snapped-exp A&S tail, and
    // the BH step-up decided on exact integers (20·m·p9 vs rank·1e9)
    "q178_bh_fdr" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 < 50 THEN 'A' ELSE 'B' END AS variant,
        |    CASE WHEN value > 150 THEN 1 ELSE 0 END AS hv
        |  FROM events),
        |g AS (SELECT event_type, variant, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(hv) AS BIGINT) AS k
        |      FROM e GROUP BY 1, 2),
        |zt AS (
        |  SELECT a.event_type,
        |    round(round((CAST(a.k AS DOUBLE) / CAST(a.n AS DOUBLE)
        |                 - CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE)) /
        |      nullif(sqrt((CAST(a.k + b.k AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))
        |        * (CAST(1 AS DOUBLE)
        |           - CAST(a.k + b.k AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))
        |        * (CAST(1 AS DOUBLE) / CAST(a.n AS DOUBLE)
        |           + CAST(1 AS DOUBLE) / CAST(b.n AS DOUBLE))), 0.0), 6), 4) AS z
        |  FROM g a JOIN g b USING (event_type)
        |  WHERE a.variant = 'A' AND b.variant = 'B'),
        |pt AS (
        |  SELECT event_type, z, 1.0 / (1.0 + 0.2316419 * abs(z)) AS t,
        |    round(exp(abs(z) * abs(z) * (-0.5)), 9) / 2.5066282746310002 AS pdf
        |  FROM zt WHERE z IS NOT NULL),
        |p AS (
        |  SELECT event_type, z,
        |    CAST(round(least(2.0 * (pdf * (t * (0.319381530 + t * (-0.356563782
        |      + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))))), 1.0)
        |      * 1.0e9, 0) AS BIGINT) AS p9
        |  FROM pt),
        |ranked AS (
        |  SELECT event_type, z, p9,
        |    row_number() OVER (ORDER BY p9, event_type) AS p_rank,
        |    (SELECT CAST(count(*) AS BIGINT) FROM p) AS m
        |  FROM p),
        |ks AS (SELECT max(CASE WHEN p9 * 20 * m <= p_rank * 1000000000
        |                       THEN p_rank END) AS kstar
        |       FROM ranked)
        |SELECT event_type, z + 0.0 AS z_stat,
        |  round(CAST(p9 AS DOUBLE) / 1.0e9, 9) + 0.0 AS p_value,
        |  p_rank, m AS m_tests,
        |  p_rank <= coalesce(kstar, 0) AS reject
        |FROM ranked CROSS JOIN ks ORDER BY event_type""".stripMargin,
    // q174's duration frame split by the q43 arm hash; per-time E/V on
    // the same nano grid, exact BIGINT sums, one final IEEE dag
    "q179_logrank" ->
      """WITH u AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS f,
        |    min(CASE WHEN event_type = 'error'
        |             THEN CAST(ts AS DATE) END) AS p,
        |    max(CAST(ts AS DATE)) AS l
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT CASE WHEN p IS NOT NULL THEN p - f ELSE l - f END AS dur,
        |    CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS obs,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 < 50 THEN 'A' ELSE 'B' END AS grp
        |  FROM u),
        |vc AS (
        |  SELECT dur,
        |    CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS a_a,
        |    CAST(sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS a_b,
        |    CAST(sum(CASE WHEN grp = 'A' THEN obs ELSE 0 END) AS BIGINT) AS d_a,
        |    CAST(sum(CASE WHEN grp = 'B' THEN obs ELSE 0 END) AS BIGINT) AS d_b
        |  FROM d GROUP BY 1),
        |r AS (
        |  SELECT dur, d_a, d_b,
        |    sum(a_a) OVER (ORDER BY dur
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_a,
        |    sum(a_b) OVER (ORDER BY dur
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_b
        |  FROM vc),
        |t AS (
        |  SELECT d_a, n_a + n_b AS n_t, d_a + d_b AS d_t, n_a, n_b
        |  FROM r WHERE d_a + d_b > 0),
        |g AS (
        |  SELECT d_a,
        |    CAST(round(CAST(d_t AS DOUBLE) * CAST(n_a AS DOUBLE)
        |      / CAST(n_t AS DOUBLE) * 1.0e9, 0) AS BIGINT) AS e9,
        |    CASE WHEN n_t > 1 THEN
        |      CAST(round(CAST(d_t AS DOUBLE)
        |        * (CAST(n_a AS DOUBLE) / CAST(n_t AS DOUBLE))
        |        * (CAST(n_b AS DOUBLE) / CAST(n_t AS DOUBLE))
        |        * (CAST(n_t - d_t AS DOUBLE) / CAST(n_t - 1 AS DOUBLE))
        |        * 1.0e9, 0) AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS v9
        |  FROM t),
        |s AS (
        |  SELECT CAST(sum(d_a) AS BIGINT) AS o_a,
        |    CAST(sum(e9) AS BIGINT) AS se9, CAST(sum(v9) AS BIGINT) AS sv9
        |  FROM g)
        |SELECT o_a,
        |  round(CAST(se9 AS DOUBLE) / 1.0e9, 6) + 0.0 AS e_a,
        |  round(CAST(sv9 AS DOUBLE) / 1.0e9, 6) + 0.0 AS var_a,
        |  round(round((CAST(o_a AS DOUBLE) - CAST(se9 AS DOUBLE) / 1.0e9) /
        |    nullif(sqrt(CAST(sv9 AS DOUBLE) / 1.0e9), 0.0), 6), 4) + 0.0 AS z_stat
        |FROM s""".stripMargin,
    // same exact centi per-user totals, DECIMAL-exact moments cast to
    // double once, identical Welch/Satterthwaite/Cohen dags
    "q185_welch_ttest" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS su
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |v AS (
        |  SELECT su,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 < 50 THEN 'A' ELSE 'B' END AS variant
        |  FROM u),
        |g AS (
        |  SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(su) AS DOUBLE) AS s,
        |    CAST(sum(su * su) AS DOUBLE) AS ss
        |  FROM v GROUP BY 1),
        |m AS (
        |  SELECT variant, n, s / CAST(n AS DOUBLE) AS mean,
        |    (ss - s * s / CAST(n AS DOUBLE))
        |      / CAST(nullif(n - 1, 0) AS DOUBLE) AS var
        |  FROM g),
        |ab AS (
        |  SELECT a.n AS na, a.mean AS ma, a.var AS va,
        |         b.n AS nb, b.mean AS mb, b.var AS vb,
        |         a.var / CAST(a.n AS DOUBLE) AS sea,
        |         b.var / CAST(b.n AS DOUBLE) AS seb
        |  FROM (SELECT * FROM m WHERE variant = 'A') a,
        |       (SELECT * FROM m WHERE variant = 'B') b)
        |SELECT na, nb,
        |  round(ma / 100.0, 4) + 0.0 AS mean_a,
        |  round(mb / 100.0, 4) + 0.0 AS mean_b,
        |  round(round((ma - mb) / nullif(sqrt(sea + seb), 0.0), 6), 4) + 0.0
        |    AS t_stat,
        |  round((sea + seb) * (sea + seb) /
        |    nullif(sea * sea / CAST(nullif(na - 1, 0) AS DOUBLE)
        |           + seb * seb / CAST(nullif(nb - 1, 0) AS DOUBLE), 0.0), 4) + 0.0
        |    AS welch_df,
        |  round(round((ma - mb) /
        |    nullif(sqrt((CAST(na - 1 AS DOUBLE) * va + CAST(nb - 1 AS DOUBLE) * vb)
        |                / CAST(nullif(na + nb - 2, 0) AS DOUBLE)), 0.0), 6), 4) + 0.0
        |    AS cohen_d
        |FROM ab""".stripMargin
  )
}
