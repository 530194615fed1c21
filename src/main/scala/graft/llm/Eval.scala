package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Tables

/** Model-evaluation operators over the q63 quality-classifier scores —
  * the metrics a curation pipeline computes before TRUSTING a filter
  * model with 100 TB of keep/drop decisions: ranking quality (ROC AUC),
  * probability calibration (reliability bins / ECE inputs), and
  * chance-corrected agreement (Cohen's κ), plus a corpus-concentration
  * diagnostic (per-source Gini) for the mixing stage. Ground truth
  * throughout is the target-language label (lang = 'en'), the same
  * stand-in target q64's DSIR weighting uses.
  *
  * Reference scope: none (no model-eval surface in the reference);
  * LLM-pipeline extension per the build brief. Every metric is computed
  * from EXACT integer aggregates (counts, scaled sums, rank sums) with
  * one closed-form float step at the end, spelled identically in the
  * DuckDB oracle — the q86/q87 statistics convention.
  */
object Eval {

  private def scoredWithLabel(s: SparkSession, dir: String): DataFrame =
    Curation
      .classifierScoreFrame(s, dir)
      .join(
        Tables
          .table(s, dir, "documents")
          .select(col("doc_id"), (col("lang") === "en").cast("int").as("pos")),
        "doc_id"
      )

  /** q111: exact tie-corrected ROC AUC of score_int against the
    * target-language label, via the rank-sum identity
    *   AUC = Σ_s p_s · (neg_below(s) + n_s/2) / (P·N)
    * over the DISTINCT-score frame — kept exact by scaling ×2
    * (auc_num = Σ p_s·(2·neg_below + n_s), a BIGINT; BIGINT holds it up
    * to P·N ~ 4·10^18 — beyond that the sum moves to DECIMAL(38)).
    *
    * Scale shape: one hash aggregate corpus → per-score counts, then the
    * q46b TWO-LEVEL cumulation for neg_below — a global window ONLY over
    * shard subtotals (≤ score-range/256 rows, allowlisted) and a
    * partitioned within-shard window — never a single-task scan of the
    * distinct-score frame. The final metric is one scalar aggregate.
    */
  private def q111(s: SparkSession, dir: String): DataFrame = {
    val perScore = scoredWithLabel(s, dir)
      .groupBy(col("score_int").as("sc"))
      .agg(
        sum("pos").cast("long").as("p"),
        (count(lit(1)) - sum("pos")).cast("long").as("neg")
      )
      // structural floor division (q59b lesson): sc spans negatives, and
      // Spark `div` truncates toward zero while the shard must stay
      // monotone in sc — (sc − pmod(sc,256)) div 256 floors on any sign
      .withColumn("shard", expr("(sc - pmod(sc, 256)) div 256"))
    val offsets = perScore
      .groupBy("shard")
      .agg(sum("neg").as("sn"))
      .withColumn(
        "shard_off",
        coalesce(
          sum("sn").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("shard", "shard_off")
    val local = Window
      .partitionBy("shard")
      .orderBy("sc")
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .join(broadcast(offsets), "shard")
      .withColumn(
        "neg_lt",
        col("shard_off") + coalesce(sum("neg").over(local), lit(0L))
      )
      .agg(
        sum("p").as("n_pos"),
        sum("neg").as("n_neg"),
        sum(col("p") * (col("neg_lt") * 2 + col("neg"))).as("auc_num")
      )
      .select(
        col("n_pos"),
        col("n_neg"),
        col("auc_num"),
        round(
          col("auc_num").cast("double")
            / (lit(2.0) * col("n_pos") * col("n_neg")),
          6
        ).as("auc")
      )
  }

  /** q111b: reliability (calibration) table — ten equal-width bins over
    * the q63 predicted probability, each with its mean prediction vs the
    * empirical positive rate and the |gap| an ECE weights. The round-4
    * probability is snapped to an exact 0..10000 integer FIRST (the
    * centi-unit convention), so every per-bin mean is a ratio of exact
    * integers and the float step is one closed-form division per bin.
    * One corpus aggregate; the bin frame is ≤ 10 rows by construction.
    */
  private def q111b(s: SparkSession, dir: String): DataFrame =
    scoredWithLabel(s, dir)
      .withColumn(
        "p10k",
        round(
          round(
            lit(1.0) / (lit(1.0) + exp(-col("score_int") / (col("n_tokens") * lit(1000.0)))),
            4
          ) * 10000
        ).cast("long")
      )
      // p10k ≥ 0 (sigmoid > 0), so truncating div == floor div here
      .withColumn("bin", least(expr("p10k div 1000"), lit(9L)))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        sum("pos").cast("long").as("n_pos"),
        sum("p10k").as("sp")
      )
      .select(
        col("bin"),
        col("n"),
        col("n_pos"),
        round(col("sp").cast("double") / (col("n") * lit(10000.0)), 6)
          .as("mean_pred"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("frac_pos"),
        round(
          abs(
            col("sp").cast("double") / (col("n") * lit(10000.0))
              - col("n_pos").cast("double") / col("n").cast("double")
          ),
          6
        ).as("gap")
      )
      .orderBy("bin")

  /** q112: Cohen's κ between the classifier's keep decision
    * (score_int > 0) and target-language membership — the
    * chance-corrected agreement a labeling pipeline reports instead of
    * raw accuracy when classes are imbalanced. One corpus aggregate into
    * the 2×2 contingency counts; κ = (p_o − p_e)/(1 − p_e) closed-form
    * from exact integers, nullif-guarded (degenerate all-one-cell
    * inputs yield NULL on both engines, not an engine-specific inf).
    */
  private def q112(s: SparkSession, dir: String): DataFrame =
    scoredWithLabel(s, dir)
      .withColumn("a", (col("score_int") > 0).cast("int"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("a") * col("pos")).cast("long").as("n11"),
        sum(col("a") * (lit(1) - col("pos"))).cast("long").as("n10"),
        sum((lit(1) - col("a")) * col("pos")).cast("long").as("n01"),
        sum((lit(1) - col("a")) * (lit(1) - col("pos"))).cast("long").as("n00")
      )
      .withColumn(
        "po",
        (col("n11") + col("n00")).cast("double") / col("n").cast("double")
      )
      .withColumn(
        "pe",
        (col("n11") + col("n10")).cast("double") / col("n").cast("double")
          * ((col("n11") + col("n01")).cast("double") / col("n").cast("double"))
          + (col("n01") + col("n00")).cast("double") / col("n").cast("double")
          * ((col("n10") + col("n00")).cast("double") / col("n").cast("double"))
      )
      .select(
        col("n"),
        col("n11"),
        col("n10"),
        col("n01"),
        col("n00"),
        (round(col("po"), 6) + 0.0).as("p_observed"),
        (round(
          (col("po") - col("pe")) / nullif(lit(1.0) - col("pe"), lit(0.0)),
          6
        ) + 0.0).as("kappa")
      )

  /** q114: per-source Gini coefficient of document lengths — the
    * concentration diagnostic a mixing stage (q56) reads to see whether
    * a source's token budget is spread across its documents or owned by
    * a few giants. Rank formula G = (2·Σ rank·x − (n+1)·Σx)/(n·Σx)
    * under the deterministic (n_chars, doc_id) total order: the rank
    * window is PARTITIONED by source, Σ rank·x is an exact BIGINT, and
    * the one float step is the closed-form ratio. G = 0 ⇔ all equal;
    * the formula is exact-integer until the final division, so no
    * negative-zero or ulp drift is possible.
    */
  private def q114(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    Tables
      .table(s, dir, "documents")
      .select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum(col("n_chars") * col("rk")).as("rx")
      )
      .select(
        col("source"),
        col("n_docs"),
        col("total_chars"),
        round(
          (lit(2.0) * col("rx") - (col("n_docs") + 1).cast("double") * col("total_chars"))
            / nullif(col("n_docs").cast("double") * col("total_chars"), lit(0.0)),
          6
        ).as("gini")
      )
      .orderBy("source")
  }

  /** q123: Weight-of-Evidence / Information-Value binning — the
    * scorecard-modeling diagnostic that ranks a feature's predictive
    * power before it enters a filter model (the supervised complement
    * of q46's unsupervised histograms): document length in fixed
    * 500-char bins (capped at 10, the q111b shape) against the
    * target-language label; per bin
    * WOE = ln((pos_rate)/(neg_rate)) and IV contribution
    * (pos_rate − neg_rate)·WOE, both Laplace-adjusted (+0.5 per bin,
    * +5.0 = 0.5·bins on the totals) so empty-side bins stay finite.
    *
    * Exactness: counts are integers from ONE corpus hash aggregate;
    * totals broadcast (1-row frame); ln is the one libm call under the
    * round-6 grid; WOE can go negative → the +0.0 signed-zero guard.
    * IV contributions are ≥ 0 by construction ((a−b)·ln(a/b) — same
    * sign both factors).
    */
  private def q123(s: SparkSession, dir: String): DataFrame = {
    val binned = Tables
      .table(s, dir, "documents")
      .select(
        least(expr("n_chars div 500"), lit(9L)).as("bin"),
        (col("lang") === "en").cast("int").as("pos")
      )
      .groupBy("bin")
      .agg(
        sum("pos").cast("long").as("n_pos"),
        (count(lit(1)) - sum("pos")).cast("long").as("n_neg")
      )
    val totals = binned.agg(
      sum("n_pos").as("g"),
      sum("n_neg").as("b")
    )
    binned
      .crossJoin(broadcast(totals))
      .withColumn(
        "pr",
        (col("n_pos").cast("double") + lit(0.5))
          / (col("g").cast("double") + lit(5.0))
      )
      .withColumn(
        "nr",
        (col("n_neg").cast("double") + lit(0.5))
          / (col("b").cast("double") + lit(5.0))
      )
      .withColumn("woe_raw", log(col("pr") / col("nr")))
      .select(
        col("bin"),
        col("n_pos"),
        col("n_neg"),
        (round(col("woe_raw"), 6) + 0.0).as("woe"),
        (round((col("pr") - col("nr")) * col("woe_raw"), 6) + 0.0)
          .as("iv_contrib")
      )
      .orderBy("bin")
  }

  /** pass@k cutoffs reported by q175 (the standard eval-harness pair). */
  private val PassKs = Seq(1, 5)

  /** q175: unbiased pass@k (Codex-paper estimator) — the eval-harness
    * number for sampled-generation benchmarks: given n attempts per
    * problem with c successes, pass@k = 1 − C(n−c, k)/C(n, k),
    * the probability a random size-k subset of the attempts contains a
    * success. The naive "fraction of problems solved in the FIRST k
    * attempts" is biased by attempt ordering; this estimator is
    * exchangeable. Spelled as the stable product form
    * 1 − Π_{j=0..k−1} (n−c−j)/(n−j) — k literal factors, no
    * factorials to overflow. Problems stand in as users, attempts as
    * their events, successes as 'purchase' events (the corpus's binary
    * outcome); cohorts by user_id % 4 exercise the grouped rollup.
    *
    * Determinism: each factor is one IEEE division of exact BIGINTs,
    * the k-literal product is a fixed dag, the per-problem estimate
    * snaps to the floor×10⁶ grid BEFORE the corpus mean (q165
    * discipline) — cohort stats are exact-integer arithmetic. n < k
    * problems count pass@k = pass@n (every attempt inspected —
    * the harness convention); c = 0 gives exactly 0, c ≥ n−k+1 gives
    * exactly 1 through the zero factor.
    *
    * Scale shape: ONE corpus hash aggregate to per-problem (n, c), a
    * map-side estimate projection, one 4-group rollup. No joins, no
    * windows.
    */
  private def q175(s: SparkSession, dir: String): DataFrame = {
    val perProblem = Tables
      .table(s, dir, "events")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c")
      )
    def passK(k: Int): org.apache.spark.sql.Column = {
      // Π_{j=0..k−1} (n−c−j)/(n−j), factors clamped at j < n (n < k ⇒
      // shorter product = pass@n); a j with n−c−j ≤ 0 zeroes the product
      val prod = (0 until k)
        .map { j =>
          when(
            lit(j) < col("n"),
            greatest(col("n") - col("c") - lit(j), lit(0L)).cast("double") /
              (col("n") - lit(j)).cast("double")
          ).otherwise(lit(1.0))
        }
        .reduce(_ * _)
      floor((lit(1.0) - prod) * 1000000.0).cast("long")
    }
    perProblem
      .select(
        (col("user_id") % 4).as("cohort"),
        passK(PassKs.head).as("p1"),
        passK(PassKs(1)).as("p5")
      )
      .groupBy("cohort")
      .agg(
        count(lit(1)).as("n_problems"),
        (round(
          sum(col("p1")).cast("double") / count(lit(1)).cast("double") / 1.0e6,
          4
        ) + 0.0).as("pass_at_1"),
        (round(
          sum(col("p5")).cast("double") / count(lit(1)).cast("double") / 1.0e6,
          4
        ) + 0.0).as("pass_at_5")
      )
      .orderBy("cohort")
  }

  // ----------------------- q187: Fleiss' kappa (multi-rater agreement)

  /** q187: Fleiss' κ — chance-corrected agreement for MORE than two
    * raters (q112's Cohen κ stops at two; a labeling pipeline that
    * ensembles three heuristic annotators needs the n-rater form
    * before trusting majority votes): three deterministic quality
    * "raters" each bin every document into {0,1,2} — length terciles,
    * lexical-diversity (distinct/total words), alphabetic-character
    * ratio — with every bin decided by EXACT-INTEGER cross-
    * multiplication (dw·100 < 40·w, not a float ratio compare), so
    * category assignment can never split engines. κ = (P̄−P̄e)/(1−P̄e)
    * with P_i = (Σ_j n_ij² − n)/(n(n−1)): all sums exact BIGINTs, the
    * final κ one IEEE dag on six exact integers.
    *
    * Scale shape: one map-side projection assigns all three ratings
    * per document, one 1-row aggregate collects Σ n_ij² and the three
    * column marginals — no joins, no windows, corpus touched once.
    */
  private def q187(s: SparkSession, dir: String): DataFrame = {
    val rated = Tables
      .table(s, dir, "documents")
      .select(
        length(col("text")).as("nc"),
        size(filter(split(col("text"), " "), x => x =!= "")).as("w"),
        size(array_distinct(filter(split(col("text"), " "), x => x =!= "")))
          .as("dw"),
        length(regexp_replace(col("text"), "[^a-z]", "")).as("al")
      )
      .select(
        when(col("nc") < 216, 0).when(col("nc") < 380, 1).otherwise(2).as("r1"),
        // BIGINT cross-multiplies: length()/size() are IntegerType, so
        // al*10000 wraps (or throws under ANSI) past ~215k chars while
        // the DuckDB oracle computes the compare in BIGINT — promote
        // before multiplying so the two engines share one arithmetic.
        when(col("dw").cast("long") * 100L < col("w").cast("long") * 40L, 0)
          .when(col("dw").cast("long") * 100L < col("w").cast("long") * 56L, 1)
          .otherwise(2)
          .as("r2"),
        when(col("al").cast("long") * 10000L < col("nc").cast("long") * 8192L, 0)
          .when(col("al").cast("long") * 10000L < col("nc").cast("long") * 8243L, 1)
          .otherwise(2)
          .as("r3")
      )
      // n_ij per subject: how many of the 3 raters chose category j
      .select(
        (Seq(0, 1, 2).map(j =>
          ((col("r1") === j).cast("long") + (col("r2") === j).cast("long") +
            (col("r3") === j).cast("long")).as(s"n$j")
        )): _*
      )
    rated
      .agg(
        count(lit(1)).as("n_subjects"),
        sum(col("n0") * col("n0") + col("n1") * col("n1") + col("n2") * col("n2"))
          .as("sq"),
        sum(col("n0")).as("c0"),
        sum(col("n1")).as("c1"),
        sum(col("n2")).as("c2")
      )
      .withColumn(
        "p_bar",
        (col("sq") - lit(3L) * col("n_subjects")).cast("double") /
          (col("n_subjects") * 6L).cast("double")
      )
      // marginals squared in DOUBLE (c_j ~ 3N overflows BIGINT squared
      // at 10^10 subjects; the double product is identical IEEE on both
      // engines since each c_j is an exactly-representable integer)
      .withColumn(
        "p_e",
        (col("c0").cast("double") * col("c0").cast("double") +
          col("c1").cast("double") * col("c1").cast("double") +
          col("c2").cast("double") * col("c2").cast("double")) /
          ((col("n_subjects") * 3L).cast("double") *
            (col("n_subjects") * 3L).cast("double"))
      )
      .select(
        col("n_subjects"),
        col("c0"),
        col("c1"),
        col("c2"),
        (round(col("p_bar"), 6) + 0.0).as("p_observed"),
        (round(col("p_e"), 6) + 0.0).as("p_expected"),
        (round(
          (col("p_bar") - col("p_e")) / nullif(lit(1.0d) - col("p_e"), lit(0.0d)),
          6
        ) + 0.0).as("fleiss_kappa")
      )
  }

  // ------------- q195: Brier score + Murphy decomposition

  /** q195: Brier score with the Murphy decomposition — REL − RES + UNC,
    * the diagnostic SPLIT of a probabilistic classifier's error that
    * q111b's reliability table plots but never totals (reliability =
    * how miscalibrated, resolution = how much the bins separate
    * outcomes, uncertainty = the irreducible base-rate term; a sharp
    * model can have a worse Brier than a blunt one ONLY via
    * reliability — this says which knob to turn): over the q63
    * classifier's q111b-convention p10k probabilities and bins.
    *
    * Determinism: the Brier numerator Σ(p10k − y·10⁴)² is an EXACT
    * BIGINT; per-bin REL/RES terms are IEEE dags on exact integers
    * floor-snapped to the 1e-9 grid and summed exactly; UNC is one
    * dag on two integers.
    *
    * Scale shape: one corpus aggregate to the ≤10-row bin frame;
    * totals broadcast back; everything else bin-frame-sized.
    */
  private def q195(s: SparkSession, dir: String): DataFrame = {
    val bins = scoredWithLabel(s, dir)
      .withColumn(
        "p10k",
        round(
          round(
            lit(1.0) / (lit(1.0) + exp(-col("score_int") / (col("n_tokens") * lit(1000.0)))),
            4
          ) * 10000
        ).cast("long")
      )
      .withColumn("bin", least(expr("p10k div 1000"), lit(9L)))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("nk"),
        sum("pos").cast("long").as("pk"),
        sum("p10k").as("spk"),
        sum(expr("(p10k - pos * 10000) * (p10k - pos * 10000)")).as("sq8")
      )
    val tot = bins.agg(
      sum("nk").as("n"),
      sum("pk").as("npos"),
      sum("sq8").as("sq8all")
    )
    val terms = bins
      .crossJoin(broadcast(tot))
      .withColumn(
        "rel9",
        expr(
          "CAST(floor(CAST(nk AS DOUBLE) " +
            "* pow(CAST(spk AS DOUBLE) / (CAST(nk AS DOUBLE) * 10000.0) " +
            "      - CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE), 2) * 1.0e9) AS BIGINT)"
        )
      )
      .withColumn(
        "res9",
        expr(
          "CAST(floor(CAST(nk AS DOUBLE) " +
            "* pow(CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE) " +
            "      - CAST(npos AS DOUBLE) / CAST(n AS DOUBLE), 2) * 1.0e9) AS BIGINT)"
        )
      )
    terms
      .groupBy("n", "npos", "sq8all")
      .agg(sum(col("rel9")).as("srel9"), sum(col("res9")).as("sres9"))
      .select(
        col("n"),
        col("npos"),
        (round(
          col("sq8all").cast("double") / (col("n").cast("double") * 1.0e8),
          6
        ) + 0.0).as("brier"),
        (round(
          col("srel9").cast("double") / (col("n").cast("double") * 1.0e9),
          6
        ) + 0.0).as("reliability"),
        (round(
          col("sres9").cast("double") / (col("n").cast("double") * 1.0e9),
          6
        ) + 0.0).as("resolution"),
        (round(
          (col("npos").cast("double") / col("n").cast("double")) *
            (lit(1.0d) - col("npos").cast("double") / col("n").cast("double")),
          6
        ) + 0.0).as("uncertainty")
      )
  }

  /** q225: precision–recall AUC (average precision) of the q63
    * classifier — the imbalance-honest companion of q111's ROC AUC
    * (with a 5% positive class a ranker can post ROC 0.95 while its
    * top-k is mostly false positives; the PR curve conditions on the
    * predicted-positive set, so AP is the number that actually tracks
    * "how clean is the kept corpus" for a curation filter):
    * AP = Σ_s (R_s − R_{s−1})·P_s over DISTINCT score thresholds in
    * descending order (the threshold-stepped definition — each
    * distinct score is one operating point; ties advance recall and
    * precision together rather than pretending a within-tie order).
    *
    * Determinism: TP/FP at each threshold are exact integers from the
    * SAME two-level shard cumulation as q111 (pos_lt beside neg_lt —
    * one extra cumulated column, no new shuffle); per-threshold
    * precision snaps to the 1e-9 grid (the q184 convention) and AP's
    * numerator Σ p_s·prec9 is an exact BIGINT; one final division.
    *
    * Scale shape: q111's exactly — one corpus hash aggregate, shard-
    * offset windows over the distinct-score frame, a 1-row reduce.
    */
  private def q225(s: SparkSession, dir: String): DataFrame = {
    val perScore = scoredWithLabel(s, dir)
      .groupBy(col("score_int").as("sc"))
      .agg(
        sum("pos").cast("long").as("p"),
        (count(lit(1)) - sum("pos")).cast("long").as("neg")
      )
      .withColumn("shard", expr("(sc - pmod(sc, 256)) div 256"))
    val wOff =
      Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perScore
      .groupBy("shard")
      .agg(sum("neg").as("sn"), sum("p").as("sp"))
      .withColumn("off_n", coalesce(sum("sn").over(wOff), lit(0L)))
      .withColumn("off_p", coalesce(sum("sp").over(wOff), lit(0L)))
      .select("shard", "off_n", "off_p")
    val local = Window
      .partitionBy("shard")
      .orderBy("sc")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = perScore
      .join(broadcast(offsets), "shard")
      .withColumn(
        "neg_lt",
        col("off_n") + coalesce(sum("neg").over(local), lit(0L))
      )
      .withColumn(
        "pos_lt",
        col("off_p") + coalesce(sum("p").over(local), lit(0L))
      )
    val tot = cum.agg(sum("p").as("np"), sum("neg").as("nn"))
    cum
      .crossJoin(broadcast(tot))
      .withColumn("tp", col("np") - col("pos_lt"))
      .withColumn("fp", col("nn") - col("neg_lt"))
      .withColumn(
        "prec9",
        round(
          col("tp").cast("double") / (col("tp") + col("fp")).cast("double")
            * 1.0e9,
          0
        ).cast("long")
      )
      .agg(
        max("np").as("n_pos"),
        max("nn").as("n_neg"),
        sum(col("p") * col("prec9")).as("ap_num9")
      )
      .select(
        col("n_pos"),
        col("n_neg"),
        col("ap_num9"),
        (round(
          col("ap_num9").cast("double") /
            (col("n_pos").cast("double") * 1.0e9),
          6
        ) + 0.0).as("pr_auc")
      )
  }

  /** q240: Kendall's W (coefficient of concordance) — "do the raters
    * even agree on the ORDERING" across the whole corpus, the
    * rank-level companion of q187's Fleiss κ (κ measures categorical
    * agreement after binning; W asks whether m raters' full rankings
    * of n items are concordant — the number a labeling pipeline reads
    * before averaging rater scores into one quality signal): three
    * lexical raters score every document (chars, per-myriad lexical
    * diversity, per-myriad alpha ratio — the q187 rater family kept
    * CONTINUOUS), each rater midranks all n docs, and
    * W = (12ΣS²ᵢ − 3m²n(n+1)²)/(m²(n³−n) − mΣT) with the standard tie
    * terms T = Σ(t³−t) per rater.
    *
    * Determinism (the q150/q237 discipline, per rater): scores are
    * exact integers (the ratios via BIGINT `div` on a 10⁴ grid);
    * midranks never float — per (rater, score) with count t and
    * strict-below count lt, 2·midrank = 2·lt + t + 1 is exact, so
    * per-doc rank sums S2ᵢ = Σⱼ 2·Rᵢⱼ and ΣS2²ᵢ stay exact integers
    * (DECIMAL(38)); with 2R ranks the numerator is 3·ΣS2² −
    * 27·n(n+1)² and the denominator 9(n³−n) − 3ΣT, both exact, cast
    * to double ONCE for the single division; χ²ᵣ = m(n−1)W rides the
    * same dag.
    *
    * Scale shape: one corpus projection → the 3n-row (rater, score)
    * stream; per-rater cumulation windows partition by rater over
    * DISTINCT scores (value-frame bounded, the q33b argument); the
    * rank join is score-frame-keyed; one per-doc aggregate; one-row
    * output.
    */
  private def q240(s: SparkSession, dir: String): DataFrame = {
    val base = Tables
      .table(s, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("nc"),
        size(filter(split(col("text"), " "), x => x =!= ""))
          .cast("long")
          .as("w"),
        size(array_distinct(filter(split(col("text"), " "), x => x =!= "")))
          .cast("long")
          .as("dw"),
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("long").as("al")
      )
      .select(
        col("doc_id"),
        col("nc").as("s1"),
        expr("dw * 10000 div greatest(w, 1)").as("s2"),
        expr("al * 10000 div greatest(nc, 1)").as("s3")
      )
    val scored = base
      .select(
        col("doc_id"),
        explode(
          array(
            struct(lit(1).as("rater"), col("s1").as("score")),
            struct(lit(2).as("rater"), col("s2").as("score")),
            struct(lit(3).as("rater"), col("s3").as("score"))
          )
        ).as("rs")
      )
      .select(col("doc_id"), col("rs.rater").as("rater"), col("rs.score").as("score"))
    val perVal = scored.groupBy("rater", "score").agg(count(lit(1)).as("t"))
    val wEx = Window
      .partitionBy("rater")
      .orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val mr = perVal.withColumn(
      "mr2",
      coalesce(sum("t").over(wEx), lit(0L)) * 2 + col("t") + 1
    )
    val perDoc = scored
      .join(mr, Seq("rater", "score"))
      .groupBy("doc_id")
      .agg(sum("mr2").as("s2i"))
    val ties = perVal.agg(
      sum(
        (col("t").cast("decimal(12,0)") * col("t") * col("t") - col("t"))
          .cast("decimal(38,0)")
      ).as("tt")
    )
    perDoc
      .agg(
        count(lit(1)).as("n"),
        sum((col("s2i") * col("s2i")).cast("decimal(38,0)")).as("ss2")
      )
      .crossJoin(broadcast(ties))
      .withColumn(
        "num_d",
        (lit(3L) * col("ss2") -
          lit(27L) * (col("n").cast("decimal(12,0)") * (col("n") + 1) *
            (col("n") + 1)).cast("decimal(38,0)")).cast("double")
      )
      .withColumn(
        "den_d",
        (lit(9L) * (col("n").cast("decimal(12,0)") * col("n") * col("n") -
          col("n")).cast("decimal(38,0)") - lit(3L) * col("tt"))
          .cast("double")
      )
      .withColumn("w_raw", col("num_d") / nullif(col("den_d"), lit(0.0d)))
      .select(
        col("n").as("n_items"),
        lit(3L).as("n_raters"),
        col("ss2").cast("long").as("sum_s2_sq"),
        col("tt").cast("long").as("t_ties"),
        (round(col("w_raw"), 6) + 0.0).as("w"),
        (round(lit(3.0d) * (col("n").cast("double") - 1.0d) * col("w_raw"), 4)
          + 0.0).as("chi2_r")
      )
  }

  /** q233: cumulative gains / lift table — the decile chart every
    * targeting deployment of a scoring model reads before the fancy
    * metrics (q111's AUC is one number; the gains table answers the
    * operational question "if we can only afford to process the top
    * k%, what fraction of the positives do we capture, and at what
    * multiple of random?"): for each decile cut ⌈k·N/10⌉ over the
    * score-descending ranking, the captured positives, the gain
    * (capture rate) and the lift vs random.
    *
    * Determinism: ties share a distinct-score block, so the cut lands
    * on the FIRST block boundary at or past the positional cut
    * (block semantics — no within-tie order is ever invented); block
    * boundaries come from the q111/q225 two-level shard cumulation;
    * the boundary pick is min_by over the UNIQUE n_ge key; gain/lift
    * are single round-6 divisions of exact integers.
    *
    * Scale shape: q225's cumulation frames + a 10-row literal decile
    * frame range-joined against the distinct-score frame (10×|scores|,
    * domain-bounded), one min_by aggregate per decile.
    */
  private def q233(s: SparkSession, dir: String): DataFrame = {
    val perScore = scoredWithLabel(s, dir)
      .groupBy(col("score_int").as("sc"))
      .agg(
        sum("pos").cast("long").as("p"),
        (count(lit(1)) - sum("pos")).cast("long").as("neg")
      )
      .withColumn("shard", expr("(sc - pmod(sc, 256)) div 256"))
    val wOff =
      Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perScore
      .groupBy("shard")
      .agg(sum("neg").as("sn"), sum("p").as("sp"))
      .withColumn("off_n", coalesce(sum("sn").over(wOff), lit(0L)))
      .withColumn("off_p", coalesce(sum("sp").over(wOff), lit(0L)))
      .select("shard", "off_n", "off_p")
    val local = Window
      .partitionBy("shard")
      .orderBy("sc")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = perScore
      .join(broadcast(offsets), "shard")
      .withColumn("pos_le", col("off_p") + sum("p").over(local))
      .withColumn("neg_le", col("off_n") + sum("neg").over(local))
    val tot = cum.agg(sum("p").as("np"), sum("neg").as("nn"))
    val blocks = cum
      .crossJoin(broadcast(tot))
      .select(
        col("np"),
        col("nn"),
        (col("np") + col("nn") - col("pos_le") - col("neg_le") + col("p") +
          col("neg")).as("n_ge"),
        (col("np") - col("pos_le") + col("p")).as("tp")
      )
    val deciles = tot.select(
      col("np"),
      col("nn"),
      explode(array((1 to 10).map(lit): _*)).as("decile")
    )
    deciles
      .withColumn("cut", expr("((np + nn) * decile + 9) div 10"))
      .join(
        blocks.select(col("n_ge"), col("tp")),
        col("n_ge") >= col("cut")
      )
      .groupBy("decile", "cut", "np", "nn")
      .agg(
        min("n_ge").as("n_cut"),
        expr("min_by(tp, n_ge)").as("captured")
      )
      .select(
        col("decile"),
        col("cut"),
        col("n_cut"),
        col("captured"),
        round(col("captured").cast("double") / col("np").cast("double"), 6)
          .as("gain"),
        round(
          (col("captured") * (col("np") + col("nn"))).cast("double") /
            (col("np") * col("n_cut")).cast("double"),
          6
        ).as("lift")
      )
      .orderBy("decile")
  }

  /** floor(ln 2 · 10⁹) — the exact-integer grid value of the binomial
    * ½^n log term, embedded as a LITERAL on both engines.
    */
  private val Ln2Grid9 = 693147180L

  /** q234: McNemar's exact test — "do two classifiers DISAGREE in a
    * biased direction" on the SAME documents (q112's Cohen κ measures
    * agreement strength; McNemar tests whether rater A passes
    * documents rater B fails significantly more often than the
    * reverse — the paired test that decides which of two quality
    * filters is stricter, where an unpaired proportion z is simply
    * wrong): the q187 lexical raters binarized (A = distinct-word
    * ratio clears 40%, B = alpha ratio clears 0.8192), exact binomial
    * two-sided p = min(1, 2·Σ_{k≤min(b,c)} C(n,k)/2ⁿ) over the n = b+c
    * discordant pairs.
    *
    * Determinism: cells are exact integers via the q187 BIGINT
    * cross-multiplications; ln C(n,k) comes from the q231 gridded
    * ln-factorial prefix sums over 0..n (two-level shard cumulation);
    * the ½ⁿ term is the exact n·floor(ln 2·10⁹) literal; the tail
    * sums floor(exp·10¹²) as exact BIGINTs, capped at 10¹² with
    * least(); significance is the exact compare p12·20 < 10¹².
    *
    * Scale shape: one corpus projection + 1-row cell aggregate; the
    * integer frame is n = b+c rows (discordant pairs only); the
    * support frame is ≤ min(b,c)+1 rows with three lf9 equi-joins.
    */
  private def q234(s: SparkSession, dir: String): DataFrame = {
    val flags = Tables
      .table(s, dir, "documents")
      .select(
        size(filter(split(col("text"), " "), x => x =!= "")).as("w"),
        size(array_distinct(filter(split(col("text"), " "), x => x =!= "")))
          .as("dw"),
        length(col("text")).as("nc"),
        length(regexp_replace(col("text"), "[^a-z]", "")).as("al")
      )
      .select(
        (col("dw").cast("long") * 100L >= col("w").cast("long") * 40L).as("ra"),
        (col("al").cast("long") * 10000L >= col("nc").cast("long") * 8192L)
          .as("rb")
      )
    val cells = flags.agg(
      sum(when(col("ra") && !col("rb"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("ra") && col("rb"), 1L).otherwise(0L)).as("c"),
      sum(when(col("ra") && col("rb"), 1L).otherwise(0L)).as("both_pass"),
      sum(when(!col("ra") && !col("rb"), 1L).otherwise(0L)).as("both_fail")
    )
    val m = cells
      .withColumn("n", col("b") + col("c"))
      .withColumn("mn", least(col("b"), col("c")))
    val ints = m
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
    val ks = lfOf(m, "n", "l_n")
      .select(
        col("b"), col("c"), col("both_pass"), col("both_fail"),
        col("n"), col("l_n"),
        explode(sequence(lit(0L), col("mn"))).as("k")
      )
      .withColumn("nk", col("n") - col("k"))
    lfOf(lfOf(ks, "k", "l_k"), "nk", "l_nk")
      .withColumn(
        "lnp9",
        col("l_n") - col("l_k") - col("l_nk") - col("n") * lit(Ln2Grid9)
      )
      .withColumn(
        "e12",
        floor(exp(col("lnp9").cast("double") / 1.0e9) * 1.0e12).cast("long")
      )
      .groupBy("b", "c", "both_pass", "both_fail", "n")
      .agg(sum("e12").as("tail12"))
      .select(
        col("both_pass"),
        col("both_fail"),
        col("b").as("a_only"),
        col("c").as("b_only"),
        col("n").as("n_discordant"),
        (round(
          least(col("tail12") * 2, lit(1000000000000L)).cast("double") / 1.0e12,
          6
        ) + 0.0).as("p_two_sided"),
        (least(col("tail12") * 2, lit(1000000000000L)) * 20 <
          lit(1000000000000L)).as("significant")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q240_kendalls_w" -> q240,
    "q233_gains_lift" -> q233,
    "q234_mcnemar" -> q234,
    "q225_pr_auc" -> q225,
    "q195_brier_decomposition" -> q195,
    "q187_fleiss_kappa" -> q187,
    "q111_roc_auc" -> q111,
    "q111b_calibration" -> q111b,
    "q112_cohens_kappa" -> q112,
    "q114_gini_concentration" -> q114,
    "q123_woe_iv" -> q123,
    "q175_pass_at_k" -> q175
  )

  private def labeledCte: String =
    s"""${Curation.classifierScoreCte},
       |lab AS (
       |  SELECT a.doc_id, a.n_tokens, a.score_int,
       |         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
       |  FROM agg a JOIN documents d USING (doc_id))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // same distinct-score block cumulation, same positional decile
    // cuts with block semantics (min_by on the unique n_ge key), same
    // single-division gain/lift
    // same continuous q187-family raters on the 10⁴ integer `div`
    // grid, same per-rater exact 2·midrank posting, same exact
    // numerator/denominator integers cast once, same W / χ²ᵣ dag
    "q240_kendalls_w" ->
      """WITH f AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS nc,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS w,
        |    CAST(len(list_distinct(list_filter(string_split(text, ' '),
        |        x -> x <> ''))) AS BIGINT) AS dw,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS al
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, 1 AS rater, nc AS score FROM f
        |  UNION ALL SELECT doc_id, 2, dw * 10000 // greatest(w, 1) FROM f
        |  UNION ALL SELECT doc_id, 3, al * 10000 // greatest(nc, 1) FROM f),
        |pv AS (SELECT rater, score, CAST(count(*) AS BIGINT) AS t
        |       FROM sc GROUP BY 1, 2),
        |mr AS (SELECT rater, score, t,
        |    2 * CAST(coalesce(sum(t) OVER (PARTITION BY rater ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      + t + 1 AS mr2
        |  FROM pv),
        |pd AS (SELECT doc_id, CAST(sum(mr2) AS BIGINT) AS s2i
        |       FROM sc JOIN mr USING (rater, score) GROUP BY doc_id),
        |tt AS (SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS tt FROM pv),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              sum(CAST(s2i * s2i AS HUGEINT)) AS ss2 FROM pd),
        |d AS (SELECT n, ss2, tt,
        |    CAST(3 * ss2 - 27 * (CAST(n AS HUGEINT) * (n + 1) * (n + 1))
        |      AS DOUBLE) AS num_d,
        |    CAST(9 * (CAST(n AS HUGEINT) * n * n - n) - 3 * tt AS DOUBLE)
        |      AS den_d
        |  FROM ag CROSS JOIN tt)
        |SELECT n AS n_items, CAST(3 AS BIGINT) AS n_raters,
        |  CAST(ss2 AS BIGINT) AS sum_s2_sq, CAST(tt AS BIGINT) AS t_ties,
        |  round(num_d / nullif(den_d, 0.0), 6) + 0.0 AS w,
        |  round(3.0 * (CAST(n AS DOUBLE) - 1.0) * (num_d / nullif(den_d, 0.0)),
        |        4) + 0.0 AS chi2_r
        |FROM d""".stripMargin,
    "q233_gains_lift" ->
      s"""$labeledCte,
         |ps AS (
         |  SELECT score_int AS sc, CAST(sum(pos) AS BIGINT) AS p,
         |         CAST(count(*) - sum(pos) AS BIGINT) AS neg
         |  FROM lab GROUP BY 1),
         |cum AS (
         |  SELECT p, neg,
         |    sum(p) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) AS pos_le,
         |    sum(neg) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) AS neg_le
         |  FROM ps),
         |t AS (SELECT CAST(sum(p) AS BIGINT) AS np,
         |             CAST(sum(neg) AS BIGINT) AS nn FROM cum),
         |blocks AS (
         |  SELECT t.np, t.nn,
         |    t.np + t.nn - c.pos_le - c.neg_le + c.p + c.neg AS n_ge,
         |    t.np - c.pos_le + c.p AS tp
         |  FROM cum c, t),
         |dec AS (
         |  SELECT t.np, t.nn,
         |    unnest(generate_series(1, 10)) AS decile
         |  FROM t),
         |j AS (
         |  SELECT d.decile, ((d.np + d.nn) * d.decile + 9) // 10 AS cut,
         |    d.np, d.nn, b.n_ge, b.tp
         |  FROM dec d JOIN blocks b
         |    ON b.n_ge >= ((d.np + d.nn) * d.decile + 9) // 10)
         |SELECT CAST(decile AS INT) AS decile, CAST(cut AS BIGINT) AS cut,
         |  CAST(min(n_ge) AS BIGINT) AS n_cut,
         |  CAST(min_by(tp, n_ge) AS BIGINT) AS captured,
         |  round(CAST(min_by(tp, n_ge) AS DOUBLE) / CAST(max(np) AS DOUBLE), 6)
         |    AS gain,
         |  round(CAST(min_by(tp, n_ge) * (max(np) + max(nn)) AS DOUBLE)
         |        / CAST(max(np) * min(n_ge) AS DOUBLE), 6) AS lift
         |FROM j GROUP BY decile, cut ORDER BY decile""".stripMargin,
    // same q187-rater binarization, same 0..n gridded ln-factorials,
    // same n·ln2 literal, 1e-12 tail with least() cap, exact compares
    "q234_mcnemar" ->
      s"""WITH f AS (
         |  SELECT len(list_filter(string_split(text, ' '), x -> x <> '')) AS w,
         |    len(list_distinct(list_filter(string_split(text, ' '),
         |        x -> x <> ''))) AS dw,
         |    length(text) AS nc,
         |    length(regexp_replace(text, '[^a-z]', '', 'g')) AS al
         |  FROM documents),
         |fl AS (
         |  SELECT dw * 100 >= w * 40 AS ra, al * 10000 >= nc * 8192 AS rb
         |  FROM f),
         |cells AS (
         |  SELECT
         |    CAST(sum(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS c,
         |    CAST(sum(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS both_pass,
         |    CAST(sum(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS both_fail
         |  FROM fl),
         |m AS (SELECT b, c, both_pass, both_fail, b + c AS n, least(b, c) AS mn
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
         |ks AS (
         |  SELECT m.b, m.c, m.both_pass, m.both_fail, m.n, ln_.lf9 AS l_n,
         |    unnest(generate_series(0, m.mn)) AS k
         |  FROM m JOIN lf ln_ ON ln_.j = m.n),
         |ks2 AS (SELECT b, c, both_pass, both_fail, n, l_n, k, n - k AS nk
         |        FROM ks),
         |pm AS (
         |  SELECT ks2.b, ks2.c, ks2.both_pass, ks2.both_fail, ks2.n,
         |    ks2.l_n - f1.lf9 - f2.lf9 - ks2.n * $Ln2Grid9 AS lnp9
         |  FROM ks2 JOIN lf f1 ON f1.j = ks2.k JOIN lf f2 ON f2.j = ks2.nk),
         |e AS (
         |  SELECT b, c, both_pass, both_fail, n,
         |    CAST(floor(exp(CAST(lnp9 AS DOUBLE) / 1.0e9) * 1.0e12) AS BIGINT)
         |      AS e12
         |  FROM pm),
         |p AS (
         |  SELECT b, c, both_pass, both_fail, n, CAST(sum(e12) AS BIGINT)
         |    AS tail12
         |  FROM e GROUP BY 1, 2, 3, 4, 5)
         |SELECT both_pass, both_fail, b AS a_only, c AS b_only,
         |  n AS n_discordant,
         |  round(CAST(least(tail12 * 2, 1000000000000) AS DOUBLE) / 1.0e12, 6)
         |    + 0.0 AS p_two_sided,
         |  least(tail12 * 2, 1000000000000) * 20 < 1000000000000 AS significant
         |FROM p""".stripMargin,
    // q111's distinct-score frame with pos_lt beside neg_lt, same
    // threshold-stepped AP on the 1e-9 precision grid
    "q225_pr_auc" ->
      s"""$labeledCte,
         |ps AS (
         |  SELECT score_int AS sc, CAST(sum(pos) AS BIGINT) AS p,
         |         CAST(count(*) - sum(pos) AS BIGINT) AS neg
         |  FROM lab GROUP BY 1),
         |c AS (
         |  SELECT p, neg,
         |    coalesce(sum(neg) OVER (ORDER BY sc
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_lt,
         |    coalesce(sum(p) OVER (ORDER BY sc
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos_lt
         |  FROM ps),
         |t AS (SELECT CAST(sum(p) AS BIGINT) AS np,
         |             CAST(sum(neg) AS BIGINT) AS nn FROM c),
         |x AS (
         |  SELECT c.p, t.np, t.nn,
         |    t.np - c.pos_lt AS tp, t.nn - c.neg_lt AS fp
         |  FROM c, t),
         |pr AS (
         |  SELECT p, np, nn,
         |    CAST(round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) * 1.0e9, 0)
         |         AS BIGINT) AS prec9
         |  FROM x)
         |SELECT max(np) AS n_pos, max(nn) AS n_neg,
         |  CAST(sum(p * prec9) AS BIGINT) AS ap_num9,
         |  round(CAST(sum(p * prec9) AS DOUBLE)
         |        / (CAST(max(np) AS DOUBLE) * 1.0e9), 6) + 0.0 AS pr_auc
         |FROM pr""".stripMargin,
    // same exact-integer category bins, same six-integer κ dag
    "q187_fleiss_kappa" ->
      """WITH f AS (
        |  SELECT length(text) AS nc,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS w,
        |    len(list_distinct(list_filter(string_split(text, ' '),
        |        x -> x <> ''))) AS dw,
        |    length(regexp_replace(text, '[^a-z]', '', 'g')) AS al
        |  FROM documents),
        |r AS (
        |  SELECT
        |    CASE WHEN nc < 216 THEN 0 WHEN nc < 380 THEN 1 ELSE 2 END AS r1,
        |    CASE WHEN dw * 100 < w * 40 THEN 0
        |         WHEN dw * 100 < w * 56 THEN 1 ELSE 2 END AS r2,
        |    CASE WHEN al * 10000 < nc * 8192 THEN 0
        |         WHEN al * 10000 < nc * 8243 THEN 1 ELSE 2 END AS r3
        |  FROM f),
        |nij AS (
        |  SELECT
        |    CAST((CASE WHEN r1 = 0 THEN 1 ELSE 0 END)
        |       + (CASE WHEN r2 = 0 THEN 1 ELSE 0 END)
        |       + (CASE WHEN r3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST((CASE WHEN r1 = 1 THEN 1 ELSE 0 END)
        |       + (CASE WHEN r2 = 1 THEN 1 ELSE 0 END)
        |       + (CASE WHEN r3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST((CASE WHEN r1 = 2 THEN 1 ELSE 0 END)
        |       + (CASE WHEN r2 = 2 THEN 1 ELSE 0 END)
        |       + (CASE WHEN r3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM r),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_subjects,
        |    CAST(sum(n0 * n0 + n1 * n1 + n2 * n2) AS BIGINT) AS sq,
        |    CAST(sum(n0) AS BIGINT) AS c0,
        |    CAST(sum(n1) AS BIGINT) AS c1,
        |    CAST(sum(n2) AS BIGINT) AS c2
        |  FROM nij),
        |p AS (
        |  SELECT n_subjects, c0, c1, c2,
        |    CAST(sq - 3 * n_subjects AS DOUBLE)
        |      / CAST(n_subjects * 6 AS DOUBLE) AS p_bar,
        |    (CAST(c0 AS DOUBLE) * CAST(c0 AS DOUBLE)
        |     + CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE)
        |     + CAST(c2 AS DOUBLE) * CAST(c2 AS DOUBLE))
        |      / (CAST(n_subjects * 3 AS DOUBLE)
        |         * CAST(n_subjects * 3 AS DOUBLE)) AS p_e
        |  FROM a)
        |SELECT n_subjects, c0, c1, c2,
        |  round(p_bar, 6) + 0.0 AS p_observed,
        |  round(p_e, 6) + 0.0 AS p_expected,
        |  round((p_bar - p_e) / nullif(1.0 - p_e, 0.0), 6) + 0.0 AS fleiss_kappa
        |FROM p""".stripMargin,
    // same k-literal product factors, same clamped/zero conventions,
    // same floor×10⁶ per-problem snap before the exact cohort mean
    "q175_pass_at_k" -> {
      def factor(j: Int): String =
        s"""CASE WHEN $j < n
           |     THEN CAST(greatest(n - c - $j, 0) AS DOUBLE)
           |          / CAST(n - $j AS DOUBLE)
           |     ELSE 1.0 END""".stripMargin
      def passK(k: Int): String =
        s"CAST(floor((1.0 - ${(0 until k).map(factor).mkString(" * ")}) " +
          "* 1000000.0) AS BIGINT)"
      s"""WITH pp AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN event_type = 'purchase'
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |est AS (
         |  SELECT user_id % 4 AS cohort,
         |    ${passK(1)} AS p1,
         |    ${passK(5)} AS p5
         |  FROM pp)
         |SELECT cohort, CAST(count(*) AS BIGINT) AS n_problems,
         |  round(CAST(sum(p1) AS DOUBLE)
         |        / CAST(count(*) AS DOUBLE) / 1.0e6, 4) + 0.0 AS pass_at_1,
         |  round(CAST(sum(p5) AS DOUBLE)
         |        / CAST(count(*) AS DOUBLE) / 1.0e6, 4) + 0.0 AS pass_at_5
         |FROM est GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // naive single-window cumulation — the oracle may scan; Spark may not
    "q111_roc_auc" ->
      s"""$labeledCte,
         |ps AS (
         |  SELECT score_int AS sc, CAST(sum(pos) AS BIGINT) AS p,
         |         CAST(count(*) - sum(pos) AS BIGINT) AS neg
         |  FROM lab GROUP BY 1),
         |c AS (
         |  SELECT p, neg,
         |    coalesce(sum(neg) OVER (ORDER BY sc
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_lt
         |  FROM ps)
         |SELECT CAST(sum(p) AS BIGINT) AS n_pos,
         |       CAST(sum(neg) AS BIGINT) AS n_neg,
         |       CAST(sum(p * (neg_lt * 2 + neg)) AS BIGINT) AS auc_num,
         |       round(CAST(sum(p * (neg_lt * 2 + neg)) AS DOUBLE)
         |             / (2.0 * CAST(sum(p) AS BIGINT) * CAST(sum(neg) AS BIGINT)),
         |             6) AS auc
         |FROM c""".stripMargin,
    "q111b_calibration" ->
      s"""$labeledCte,
         |pp AS (
         |  SELECT pos,
         |    CAST(round(round(1.0 / (1.0 + exp(-score_int / (n_tokens * 1000.0))), 4)
         |               * 10000) AS BIGINT) AS p10k
         |  FROM lab),
         |b AS (
         |  SELECT least(p10k // 1000, 9) AS bin, count(*) AS n,
         |         CAST(sum(pos) AS BIGINT) AS n_pos,
         |         CAST(sum(p10k) AS BIGINT) AS sp
         |  FROM pp GROUP BY 1)
         |SELECT bin, n, n_pos,
         |  round(CAST(sp AS DOUBLE) / (n * 10000.0), 6) AS mean_pred,
         |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos,
         |  round(abs(CAST(sp AS DOUBLE) / (n * 10000.0)
         |            - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS gap
         |FROM b ORDER BY bin""".stripMargin,
    "q195_brier_decomposition" ->
      s"""$labeledCte,
         |pp AS (
         |  SELECT pos,
         |    CAST(round(round(1.0 / (1.0 + exp(-score_int / (n_tokens * 1000.0))), 4)
         |               * 10000) AS BIGINT) AS p10k
         |  FROM lab),
         |b AS (
         |  SELECT least(p10k // 1000, 9) AS bin,
         |    CAST(count(*) AS BIGINT) AS nk,
         |    CAST(sum(pos) AS BIGINT) AS pk,
         |    CAST(sum(p10k) AS BIGINT) AS spk,
         |    CAST(sum((p10k - pos * 10000) * (p10k - pos * 10000)) AS BIGINT)
         |      AS sq8
         |  FROM pp GROUP BY 1),
         |t AS (SELECT CAST(sum(nk) AS BIGINT) AS n,
         |             CAST(sum(pk) AS BIGINT) AS npos,
         |             CAST(sum(sq8) AS BIGINT) AS sq8all
         |      FROM b),
         |g AS (
         |  SELECT b.nk, t.n, t.npos, t.sq8all,
         |    CAST(floor(CAST(nk AS DOUBLE)
         |      * pow(CAST(spk AS DOUBLE) / (CAST(nk AS DOUBLE) * 10000.0)
         |            - CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE), 2) * 1.0e9)
         |      AS BIGINT) AS rel9,
         |    CAST(floor(CAST(nk AS DOUBLE)
         |      * pow(CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE)
         |            - CAST(npos AS DOUBLE) / CAST(n AS DOUBLE), 2) * 1.0e9)
         |      AS BIGINT) AS res9
         |  FROM b CROSS JOIN t)
         |SELECT n, npos,
         |  round(CAST(sq8all AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e8), 6) + 0.0
         |    AS brier,
         |  round(CAST(sum(rel9) AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e9), 6) + 0.0
         |    AS reliability,
         |  round(CAST(sum(res9) AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e9), 6) + 0.0
         |    AS resolution,
         |  round((CAST(npos AS DOUBLE) / CAST(n AS DOUBLE))
         |        * (1.0 - CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)), 6) + 0.0
         |    AS uncertainty
         |FROM g GROUP BY n, npos, sq8all""".stripMargin,
    "q112_cohens_kappa" ->
      s"""$labeledCte,
         |ct AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN score_int > 0 AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |    CAST(sum(CASE WHEN score_int > 0 AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         |    CAST(sum(CASE WHEN score_int <= 0 AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         |    CAST(sum(CASE WHEN score_int <= 0 AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
         |  FROM lab),
         |k AS (
         |  SELECT n, n11, n10, n01, n00,
         |    CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
         |    CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)
         |      * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
         |    + CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
         |      * (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) AS pe
         |  FROM ct)
         |SELECT n, n11, n10, n01, n00,
         |  round(po, 6) + 0.0 AS p_observed,
         |  round((po - pe) / nullif(1.0 - pe, 0.0), 6) + 0.0 AS kappa
         |FROM k""".stripMargin,
    "q123_woe_iv" ->
      """WITH binned AS (
        |  SELECT least(n_chars // 500, 9) AS bin,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(count(*) - sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS g,
        |             CAST(sum(n_neg) AS BIGINT) AS b FROM binned),
        |r AS (
        |  SELECT bin, n_pos, n_neg,
        |    (CAST(n_pos AS DOUBLE) + 0.5) / (CAST(g AS DOUBLE) + 5.0) AS pr,
        |    (CAST(n_neg AS DOUBLE) + 0.5) / (CAST(b AS DOUBLE) + 5.0) AS nr
        |  FROM binned, t)
        |SELECT bin, n_pos, n_neg,
        |  round(ln(pr / nr), 6) + 0.0 AS woe,
        |  round((pr - nr) * ln(pr / nr), 6) + 0.0 AS iv_contrib
        |FROM r ORDER BY bin""".stripMargin,
    "q114_gini_concentration" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS rk
        |  FROM documents),
        |g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |         CAST(sum(n_chars * rk) AS BIGINT) AS rx
        |  FROM r GROUP BY source)
        |SELECT source, n_docs, total_chars,
        |  round((2.0 * rx - CAST(n_docs + 1 AS DOUBLE) * total_chars)
        |        / nullif(CAST(n_docs AS DOUBLE) * total_chars, 0.0), 6) AS gini
        |FROM g ORDER BY source""".stripMargin
  )
}
