package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational query inventory (SURVEY.md §2.4, Q1-Q23): the operator
  * surface the reference exposes through its Athena table, re-expressed as
  * Spark DataFrame plans. Each testdata query has a DuckDB oracle twin in
  * [[oracleSql]]; the flowlog queries (q01-q04) run on the table produced
  * by our own ETL from the deterministic FlowLogCorpus — their oracles
  * recompute the expected rows closed-form from `generate_series`
  * (FlowLogCorpus.oracleCte), so the whole parse→write→read path is
  * value-checked without the oracle ever seeing the converted directory.
  *
  * Conventions for oracle parity:
  *  - every output column aliased identically on both sides;
  *  - deterministic ORDER BY on a full key;
  *  - DOUBLE aggregates wrapped in round(x, 2) (4 for cosines);
  *  - DuckDB integer SUMs cast to BIGINT (DuckDB widens to HUGEINT);
  *  - no division that can hit zero without a nullif guard (ANSI-safe);
  *  - any rounded metric that can go NEGATIVE adds `+ 0.0` after the
  *    round ON BOTH ENGINES: DuckDB's round preserves the sign bit
  *    (round(-2e-5, 4) = -0.0) while Spark's BigDecimal round returns
  *    +0.0 — numerically equal, hash-different. IEEE -0.0 + 0.0 = +0.0
  *    normalizes both (r7's q20d failure; NegativeZeroSpec guards it).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def r2(c: Column): Column = round(c, 2)

  /** Signed-zero-normalizing round for metrics that can go negative. */
  private def rz(c: Column, scale: Int): Column = round(c, scale) + lit(0d)

  // ---------------------------------------------------------------- q01-q04
  // Flow queries over our own converted table (SURVEY §2.4 Q1-Q4).

  private def q01(s: SparkSession, dir: String): DataFrame =
    Tables
      .flowlogs(s)
      .filter(col("action") === "ACCEPT")
      .select(col("srcaddr"), col("dstaddr"), col("bytes"))
      .orderBy("srcaddr", "dstaddr", "bytes")

  private def q02(s: SparkSession, dir: String): DataFrame =
    Tables
      .flowlogs(s)
      .groupBy(col("srcaddr"))
      .agg(
        sum(col("bytes")).as("sum_bytes"),
        sum(col("packets")).as("sum_packets"),
        count(lit(1)).as("cnt")
      )
      .orderBy("srcaddr")

  private def q03(s: SparkSession, dir: String): DataFrame =
    Tables
      .flowlogs(s)
      .groupBy(col("dstaddr"))
      .agg(sum(col("bytes")).as("sum_bytes"))
      .orderBy(desc("sum_bytes"), col("dstaddr"))
      .limit(10)

  private def q04(s: SparkSession, dir: String): DataFrame =
    Tables
      .flowlogs(s)
      .groupBy(col("dt"), col("account"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("dt", "account")

  /** q230: per-source anomaly screen — the reference domain's security
    * triage over the converted flow table: for each source, its
    * traffic profile (flow count, destination fan-out, bytes, REJECT
    * count) and how far its reject RATIO sits above the corpus
    * baseline — a source bouncing off security groups far more than
    * the fleet average is the scanner/misconfiguration signature that
    * byte top-talkers (q02) miss because scans are small-packet.
    * Top-20 by (excess reject ratio, srcaddr), NODATA excluded.
    * (On this synthetic corpus the address map is a closed-form
    * bijection, so the fan-out column is structurally 1 — it is
    * carried as profile surface; the reject excess is the live
    * ordering signal.)
    *
    * Determinism: all counts exact integers from one hash aggregate
    * (count(DISTINCT dstaddr) is a two-phase exact distinct, not a
    * sketch); ratio and excess are single round-6 renders of the
    * identical IEEE dag on both engines (excess can go negative →
    * the +0.0 sign normalization).
    *
    * Scale shape: one groupBy(srcaddr) over the flow table (map-side
    * partials; the distinct expands to the address-pair space q02's
    * shape already shuffles), a broadcast 1-row corpus total, top-20
    * via TakeOrdered. At 100 TB the exact distinct swaps for
    * approx_count_distinct the same way q12b documents.
    */
  private def q230(s: SparkSession, dir: String): DataFrame = {
    val base = Tables
      .flowlogs(s)
      .filter(col("srcaddr") =!= "-")
      .groupBy(col("srcaddr"))
      .agg(
        countDistinct(col("dstaddr")).as("n_dsts"),
        count(lit(1)).as("n_flows"),
        sum(col("bytes")).as("sum_bytes"),
        sum(when(col("action") === "REJECT", 1L).otherwise(0L)).as("n_rejects")
      )
    val tot = base.agg(sum("n_flows").as("tf"), sum("n_rejects").as("tr"))
    base
      .crossJoin(broadcast(tot))
      .withColumn(
        "reject_ratio",
        round(col("n_rejects").cast("double") / col("n_flows").cast("double"), 6)
      )
      .withColumn(
        "reject_excess",
        round(
          col("n_rejects").cast("double") / col("n_flows").cast("double") -
            col("tr").cast("double") / col("tf").cast("double"),
          6
        ) + 0.0
      )
      .orderBy(desc("reject_excess"), col("srcaddr"))
      .limit(20)
      .select(
        col("srcaddr"),
        col("n_dsts"),
        col("n_flows"),
        col("sum_bytes"),
        col("n_rejects"),
        col("reject_ratio"),
        col("reject_excess")
      )
  }

  /** CIDR enrichment — the reference domain's classic lookup: map each
    * flow's srcaddr to its owning /24 block (aggregated to /20 "net"
    * owners) via a BROADCAST RANGE JOIN against a 256-row block dim.
    * The dim is broadcast (a CIDR table is always small relative to the
    * flow volume); each flow probes the in-memory ranges, so the flow
    * side streams through once with no shuffle before the final
    * aggregate. NODATA rows (srcaddr `-`) are excluded before the join.
    */
  private def q44(s: SparkSession, dir: String): DataFrame = {
    val base = 10L << 24 // 10.0.0.0
    val oct = split(col("srcaddr"), "\\.")
    val ip = Tables
      .flowlogs(s)
      .filter(col("srcaddr") =!= "-")
      .select(
        (lit(base) + element_at(oct, 3).cast("long") * 256L +
          element_at(oct, 4).cast("long")).as("ip_int"),
        col("bytes")
      )
    val dim = s
      .range(256)
      .select(
        (lit(base) + col("id") * 256L).as("lo"),
        (lit(base) + col("id") * 256L + 255L).as("hi"),
        concat(lit("net-"), expr("id div 16")).as("owner")
      )
    ip.join(broadcast(dim), col("ip_int") >= col("lo") && col("ip_int") <= col("hi"))
      .groupBy(col("owner"))
      .agg(count(lit(1)).as("cnt"), sum(col("bytes")).as("sum_bytes"))
      .orderBy("owner")
  }

  /** Fixed-width histogram of flow sizes — the binning pattern behind
    * every traffic-distribution dashboard. A closed-form bucket id keeps
    * it one hash aggregation: 20 buckets of 5 kB over bytes ∈ [0, 100k).
    */
  private def q46(s: SparkSession, dir: String): DataFrame =
    Tables
      .flowlogs(s)
      .select(expr("bytes div 5000").as("bucket"), col("bytes"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"), r2(avg(col("bytes"))).as("avg_bytes"))
      .orderBy("bucket")

  /** Equi-DEPTH histogram (deciles of events.value): bucket edges come
    * from the DATA, computed with the q33b integer-rank pattern —
    * per-cent-value counts, a cumulative sum over that frame (distinct
    * cents, not the corpus), bucket = (10·cum_lt) div total — instead of
    * a global `ntile(10)` window, which would sort the whole corpus in
    * ONE task. Pure integer arithmetic ⇒ cross-engine exact;
    * heavily-tied values land whole in one bucket (correct equi-depth
    * semantics: a tie cannot straddle an edge).
    *
    * The cumulative sum itself is the Packing.scala two-pass scan, not a
    * single `Window.orderBy`: distinct ROUNDED DOUBLES are bounded only
    * by the data's value range, so on a wide-range metric the
    * unpartitioned frame becomes one straggler task. Sharding by
    * `floor(v / 16)` (order-preserving, data-derived ⇒ deterministic
    * under any physical partitioning) caps per-task window state at
    * 1600 cent-values per shard; the shards-sized offset frame is the
    * only unpartitioned window left, bounded by range/16 rows. NULL
    * values are filtered EXPLICITLY on both engines (Spark windows sort
    * NULL first, DuckDB last — edges must not depend on that): deciles
    * are of the observed values.
    */
  private def q46b(s: SparkSession, dir: String): DataFrame = {
    val pv = t(s, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(r2(col("value")).as("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("shard", floor(col("v") / 16).cast("long"))
    val offsets = pv
      .groupBy("shard")
      .agg(sum("c").as("shard_c"))
      .withColumn(
        "shard_offset",
        coalesce(
          sum("shard_c").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("shard", "shard_offset")
    val local = Window
      .partitionBy("shard")
      .orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = t(s, dir, "events")
      .filter(col("value").isNotNull)
      .agg(count(lit(1)).as("total"))
    pv.join(broadcast(offsets), "shard")
      .withColumn(
        "cum_lt",
        col("shard_offset") + coalesce(sum("c").over(local), lit(0L))
      )
      .crossJoin(broadcast(total)) // 1-row count: bounded by construction
      .withColumn("bucket", expr("(cum_lt * 10) div total"))
      .groupBy("bucket")
      .agg(
        sum(col("c")).as("n"),
        min(col("v")).as("lo"),
        max(col("v")).as("hi")
      )
      .orderBy("bucket")
  }

  /** Conditional / null functions as a first-class checked query (they
    * appear throughout the inventory, but the COVERAGE row deserves its
    * own oracle): multi-branch CASE, IN-list predicate, NULLIF/COALESCE
    * defaulting, GREATEST floor.
    */
  private def q45(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", "finished")
          .when(col("o_orderstatus") === "O", "open")
          .otherwise("other")
          .as("status_label"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("is_urgent"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING"))
          .as("status_or_default"),
        r2(greatest(col("o_totalprice"), lit(1000.0))).as("price_floor")
      )
      .orderBy("o_orderkey")

  // ---------------------------------------------------------------- q05-q10
  // Joins.

  /** Inner equi join orders ⋈ customer, grouped by market segment. */
  private def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("order_cnt"),
        r2(sum(col("o_totalprice"))).as("revenue")
      )
      .orderBy("c_mktsegment")

  /** Small-dimension broadcast join lineitem ⋈ part (2k rows → broadcast),
    * aggregated by brand. The explicit broadcast() hint pins the plan the
    * optimizer should pick at any scale: part stays far below the
    * broadcast threshold while lineitem grows with SF.
    */
  private def q06(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(
        broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey")
      )
      .groupBy(col("p_brand"))
      .agg(
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"),
        count(lit(1)).as("cnt")
      )
      .orderBy("p_brand")

  /** Multi-way join, TPC-H Q5 shape: lineitem ⋈ orders ⋈ customer ⋈
    * supplier ⋈ nation ⋈ region with a region filter and a date range.
    * nation/region are broadcast; the fact-side joins shuffle on their keys.
    */
  private def q07(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(
        t(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey")
      )
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(
        col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")
      )
      .groupBy(col("n_name"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))

  /** Left outer join + null-tolerant COUNT(column). */
  private def q08(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(
        t(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"),
        "left_outer"
      )
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("order_cnt"))
      .orderBy("c_custkey")

  /** Right outer join + null-tolerant COUNT(column) — the mirror of q08
    * with the fact side on the left, exercising RightOuter semantics.
    */
  private def q08b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(
        t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"),
        "right_outer"
      )
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("order_cnt"))
      .orderBy("c_custkey")

  /** Full outer join: reconciliation of the positive-balance customer
    * list against the recent-order ledger (orders since 1998-06-01).
    * Both null sides occur — customers whose orders all predate the
    * window (order side null) and non-positive-balance customers with
    * recent orders (customer side null) — the shape a real FULL OUTER
    * reconciliation query produces.
    */
  private def q08c(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .filter(col("c_acctbal") > 0)
      .select(col("c_custkey"))
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1998-06-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("order_cnt"),
        r2(sum(col("o_totalprice"))).as("spend")
      )
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        when(col("c_custkey").isNull, "order_only")
          .when(col("o_custkey").isNull, "customer_only")
          .otherwise("both")
          .as("side"),
        col("order_cnt"),
        col("spend")
      )
      .orderBy("custkey")
  }

  /** Left semi / left anti (EXISTS / NOT EXISTS). */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val withOrders = c
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("op", lit("with_orders"))
    val withoutOrders = c
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("op", lit("without_orders"))
    withOrders.union(withoutOrders).select("op", "cnt").orderBy("op")
  }

  /** Non-equi (range) self join on events, keys bounded by user_id: pairs
    * of events of the same user within 1 hour and a ±5.0 value band. The
    * equi part (user_id) keeps this a shuffled equi-join with the range
    * residual as join condition — no cartesian product at any scale.
    */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val a = e.select(
      col("user_id"),
      col("event_id").as("a_id"),
      col("ts").as("a_ts"),
      col("value").as("a_value")
    )
    val b = e.select(
      col("user_id"),
      col("event_id").as("b_id"),
      col("ts").as("b_ts"),
      col("value").as("b_value")
    )
    a.join(
      b,
      Seq("user_id")
    ).filter(
      col("a_id") < col("b_id") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR") &&
        abs(col("a_value") - col("b_value")) < lit(5.0)
    ).groupBy(col("user_id"))
      .agg(count(lit(1)).as("pair_cnt"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- q11-q16
  // Aggregation shapes + set ops.

  /** TPC-H Q1 shape: wide aggregate + HAVING. */
  private def q11(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r2(sum(col("l_extendedprice"))).as("sum_base_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sum_disc_price"),
        r2(
          sum(
            col("l_extendedprice") * (lit(1) - col("l_discount")) *
              (lit(1) + col("l_tax"))
          )
        ).as("sum_charge"),
        r2(avg(col("l_quantity"))).as("avg_qty"),
        r2(avg(col("l_extendedprice"))).as("avg_price"),
        r2(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .filter(col("count_order") > 100)
      .orderBy("l_returnflag", "l_linestatus")

  /** Exact distinct aggregation (the approx variant is q12b, no oracle). */
  private def q12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy("event_type")

  /** approx_count_distinct (HLL++) — the sketch value itself has no
    * DuckDB twin, so the gate emits the EXACT twin (computed in the
    * same plan) plus an in-query 5%-rtol boolean over the estimate (r12
    * verdict ask #9): the driver hash now covers both the exact count
    * AND the assertion that the sketch landed inside tolerance — a
    * fully-checked gate instead of a rows-only exemption. QueriesSpec
    * still pins the raw estimates separately.
    */
  private def q12b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("users_exact"),
        approx_count_distinct(col("user_id")).as("ap")
      )
      .select(
        col("event_type"),
        col("users_exact"),
        (abs(col("ap") - col("users_exact")).cast("double") /
          col("users_exact").cast("double") <= 0.05).as("approx_within_5pct")
      )
      .orderBy("event_type")

  /** Mergeable-sketch rollup: per-day HLL sketches of distinct users,
    * union-merged to weekly estimates — the no-rescan distinct-count
    * pattern at 100 TB (store a sketch per partition like
    * IncrementalAgg's algebraic partials; answer any coarser grain by
    * merging registers, never re-reading data). HLL register merge is
    * lossless and order-independent, so the merged weekly estimate is
    * BIT-EQUAL to a direct sketch of the week's rows — QueriesSpec
    * asserts that equality exactly. DuckDB has no sketch twin, so the
    * gate emits the exact weekly distinct twin + an in-plan 5% bound
    * boolean instead of the raw estimate (the q12b convention) — fully
    * hash-checked, not rows-only.
    */
  private def q12c(s: SparkSession, dir: String): DataFrame = {
    val merged = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(to_date(date_trunc("week", col("d"))).as("wk"))
      .agg(
        count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users")
      )
    // the exact weekly twin IN THE SAME PLAN (r12 ask #9): the driver
    // hash covers the exact counts and the estimate's 5% bound; the
    // merged-vs-direct BIT-equality stays pinned in QueriesSpec
    val exact = t(s, dir, "events")
      .groupBy(to_date(date_trunc("week", col("ts"))).as("wk"))
      .agg(countDistinct(col("user_id")).as("users_exact"))
    merged
      .join(exact, "wk")
      .select(
        col("wk"),
        col("n_days"),
        col("users_exact"),
        (abs(col("est_users") - col("users_exact")).cast("double") /
          col("users_exact").cast("double") <= 0.05).as("est_within_5pct")
      )
      .orderBy("wk")
  }

  /** q154: sketch-based set-OVERLAP audit — estimate |A∩B| between two
    * user populations (viewers vs purchasers) by inclusion–exclusion
    * over HLL sketches: est(A∩B) = est(A) + est(B) − est(A∪B), with the
    * union sketch a lossless REGISTER merge (hll_union), never a
    * re-scan. This is how train/test membership leakage is audited at
    * 100 TB: each side contributes one sketch from its own single pass
    * (here both fold into ONE conditional-aggregate pass), and the
    * overlap answer needs no join — the exact twin's semi-join is the
    * thing this operator exists to avoid. Gate emits the exact twins
    * (computed in the same plan) + the in-query error bound boolean,
    * the q12b convention, so the driver hash checks everything
    * deterministic.
    */
  private def q154(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
    val sk = e.agg(
      hll_sketch_agg(when(col("event_type") === "view", col("user_id"))).as("ska"),
      hll_sketch_agg(when(col("event_type") === "purchase", col("user_id"))).as("skb"),
      countDistinct(when(col("event_type") === "view", col("user_id")))
        .as("n_view_exact"),
      countDistinct(when(col("event_type") === "purchase", col("user_id")))
        .as("n_purchase_exact")
    )
    val both = e
      .groupBy("user_id")
      .agg(countDistinct("event_type").as("k"))
      .filter(col("k") === 2)
      .agg(count(lit(1)).as("n_overlap_exact"))
    sk.crossJoin(broadcast(both))
      .select(
        col("n_view_exact"),
        col("n_purchase_exact"),
        col("n_overlap_exact"),
        {
          // inclusion–exclusion estimate |A| + |B| − |A∪B|
          val est = hll_sketch_estimate(col("ska")) +
            hll_sketch_estimate(col("skb")) -
            hll_sketch_estimate(hll_union(col("ska"), col("skb")))
          val absErr = abs(est - col("n_overlap_exact")).cast("double")
          // a legitimately disjoint corpus has n_overlap_exact = 0 and a
          // relative bound would divide by zero (NULL ≠ the oracle's
          // TRUE); fall back to an absolute slack sized to the sketch's
          // standard error on the union (lgConfigK=12 ⇒ ~1.6% per
          // sketch; 5% of the summed cardinalities + 16 is generous
          // margin without being vacuous)
          when(
            col("n_overlap_exact") > 0,
            absErr / col("n_overlap_exact").cast("double") <= 0.15
          ).otherwise(
            absErr <= (col("n_view_exact") + col("n_purchase_exact"))
              .cast("double") * 0.05 + 16.0
          ).as("est_within_15pct")
        }
      )
  }

  /** ROLLUP over region → nation (Expand operator). */
  private def q13(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(
        broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey")
      )
      .join(
        broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey")
      )
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("cnt"), r2(sum(col("c_acctbal"))).as("bal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  /** CUBE over (orderstatus, orderpriority) — all 2ⁿ grouping sets via
    * the Expand operator (the grouping-sets family beyond q13's ROLLUP).
    */
  private def q13b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), r2(sum(col("o_totalprice"))).as("total"))
      .orderBy(
        asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority")
      )

  /** ROLLUP with grouping_id + per-column grouping flag — distinguishes
    * a subtotal row's NULL from a data NULL (the reason GROUPING exists).
    * Spark's grouping_id() bit order (first grouping col = most
    * significant bit) matches DuckDB's GROUPING(a, b).
    */
  private def q13c(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(
        broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey")
      )
      .join(
        broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey")
      )
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("cnt"),
        r2(sum(col("c_acctbal"))).as("bal")
      )
      .select(col("r_name"), col("n_name"), col("gid"), col("cnt"), col("bal"))
      .orderBy(
        col("gid"),
        asc_nulls_first("r_name"),
        asc_nulls_first("n_name")
      )

  /** Arbitrary GROUPING SETS — the mixed grain rollup/cube cannot
    * express ((type, day), (type), ()); one aggregation over an Expand
    * of the chosen sets, not three unioned jobs over the base table.
    */
  private def q13d(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("graft_events")
    s.sql("""
      WITH e AS (SELECT event_type, to_date(ts) AS d FROM graft_events)
      SELECT event_type, d, grouping_id(event_type, d) AS gid, count(*) AS cnt
      FROM e
      GROUP BY GROUPING SETS ((event_type, d), (event_type), ())
      ORDER BY gid, event_type ASC NULLS FIRST, d ASC NULLS FIRST
    """)
  }

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** PIVOT: event_type values to columns, one row per day. The pivot
    * value list is explicit — an implicit pivot would scan the column for
    * distinct values first (an extra job, and nondeterministic column
    * order at scale). Cells with no rows are coalesced to 0 (Spark yields
    * NULL, COUNT semantics say 0).
    */
  private def q42(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(to_date(col("ts")).as("d"), col("event_type"))
      .groupBy("d")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .select(
        col("d") +: EventTypes.map(tp => coalesce(col(tp), lit(0L)).as(tp)): _*
      )
      .orderBy("d")

  /** UNPIVOT (melt): the q42 wide frame back to long (d, event_type,
    * cnt) — the roundtrip yields the dense per-(day, type) counts
    * including explicit zeros.
    */
  private def q42b(s: SparkSession, dir: String): DataFrame =
    q42(s, dir)
      .unpivot(
        Array(col("d")),
        EventTypes.map(col).toArray,
        "event_type",
        "cnt"
      )
      .orderBy("d", "event_type")

  /** Bag-semantics set ops: intersectAll / exceptAll (q16 covers the
    * distinct-semantics family).
    */
  private def q16b(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    def users(tp: String): DataFrame =
      e.filter(col("event_type") === tp).select(col("user_id"))
    val clicks = users("click")
    val purchases = users("purchase")
    def counted(df: DataFrame, op: String): DataFrame =
      df.agg(count(lit(1)).as("cnt")).withColumn("op", lit(op))
    counted(clicks.intersectAll(purchases), "intersect_all")
      .union(counted(clicks.exceptAll(purchases), "except_all"))
      .select("op", "cnt")
      .orderBy("op")
  }

  /** Ranking window: latest order per customer via row_number()=1. */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(desc("o_orderdate"), desc("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_orderdate"),
        r2(col("o_totalprice")).as("price")
      )
      .orderBy("o_custkey")
  }

  /** The full ranking-function family (SURVEY §2.2: row_number, rank,
    * dense_rank, ntile + distribution and first/last value) over each
    * customer's order history. Restricted to o_custkey < 50 to keep the
    * per-row output bounded.
    */
  private def q14b(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_custkey") < 50)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cdist"),
        first(col("o_orderkey")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).as("first_order"),
        last(col("o_orderkey")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).as("last_order")
      )
      .orderBy("o_custkey", "rn")
  }

  /** IGNORE NULLS navigation functions: first/last/nth non-null over a
    * sparse column (nulls synthesized deterministically from value<5 so
    * both engines null the same rows) — how gaps are skipped when
    * reading the "latest known" measurement per key.
    */
  private def q14c(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "events")
      .filter(col("user_id") < 50)
      .withColumn("sv", when(col("value") >= 5, r2(col("value"))))
      .select(
        col("event_id"),
        col("user_id"),
        col("sv"),
        first(col("sv"), ignoreNulls = true).over(w).as("first_nn"),
        last(col("sv"), ignoreNulls = true).over(w).as("last_nn"),
        nth_value(col("sv"), 2, ignoreNulls = true).over(w).as("second_nn")
      )
      .orderBy("event_id")
  }

  /** Analytic window + frame: lag and a 4-row running sum per user. */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(
        col("event_id"),
        col("user_id"),
        r2(col("value")).as("value"),
        r2(lag(col("value"), 1).over(w)).as("prev_value"),
        r2(sum(col("value")).over(w.rowsBetween(-3, 0))).as("run_sum")
      )
      .orderBy("event_id")
  }

  /** Time-RANGE window frame: per-user trailing-hour count/sum over event
    * TIME (RANGE BETWEEN 3600 PRECEDING on epoch seconds, not row
    * counts) — however many events fall in the trailing hour, all enter
    * the frame. Epoch seconds via floor on both engines (Spark's
    * timestamp→long cast truncates; the oracle floors explicitly).
    */
  private def q15b(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("sec"))
      .rangeBetween(-3600, Window.currentRow)
    t(s, dir, "events")
      .withColumn("sec", col("ts").cast("long"))
      .select(
        col("event_id"),
        col("user_id"),
        count(lit(1)).over(w).as("n_trailing_hour"),
        r2(sum(col("value")).over(w)).as("sum_trailing_hour")
      )
      .orderBy("event_id")
  }

  /** Gap-fill + LOCF resample: per-user hourly grid from first to last
    * active hour (`sequence` + `explode` — generated DISTRIBUTED, one
    * span row per user, never a driver loop), left-joined against the
    * real per-hour aggregate; empty buckets get count 0 and carry the
    * last observed sum forward (`last(_, ignoreNulls)` over the
    * per-user time window). Bounded to users < 50 to keep the gate-SF
    * grid small; at scale the grid size is (active span / granularity)
    * per key, independent of event count.
    */
  private def q59(s: SparkSession, dir: String): DataFrame = {
    val hourly = t(s, dir, "events")
      .filter(col("user_id") < 50)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sv"))
    val grid = hourly
      .groupBy("user_id")
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(
        col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hr")
      )
    val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
    grid
      .join(hourly, Seq("user_id", "hr"), "left")
      .select(
        col("user_id"),
        col("hr"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        r2(last(col("sv"), ignoreNulls = true).over(w)).as("locf_sum")
      )
      .orderBy("user_id", "hr")
  }

  /** Set ops: UNION / INTERSECT / EXCEPT between event-type user sets. */
  private def q16(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    def users(tp: String): DataFrame =
      e.filter(col("event_type") === tp).select(col("user_id")).distinct()
    val clicks = users("click")
    val purchases = users("purchase")
    def counted(df: DataFrame, op: String): DataFrame =
      df.agg(count(lit(1)).as("cnt")).withColumn("op", lit(op))
    counted(clicks.union(purchases).distinct(), "union")
      .union(counted(clicks.intersect(purchases), "intersect"))
      .union(counted(clicks.except(purchases), "except"))
      .select("op", "cnt")
      .orderBy("op")
  }

  // ---------------------------------------------------------------- q17-q23
  // Scalar-function surface + windows in time.

  /** String functions over part. */
  private def q17(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        upper(col("p_brand")).as("brand_uc"),
        substring(col("p_type"), 1, 4).as("type_pfx"),
        concat_ws("#", col("p_brand"), col("p_type")).as("tag"),
        length(col("p_name")).as("name_len"),
        col("p_type").like("%BRASS").as("is_brass")
      )
      .orderBy("p_partkey")

  /** String distance + regex extraction surface: `levenshtein` (the
    * edit-distance primitive fuzzy dedup reaches for), `regexp_extract_all`
    * (all matches, not just the first — q17 covers the single-match form),
    * and `split_part`. Self-join on adjacent part keys keeps the pair
    * count linear — levenshtein is O(m·n) per pair, so the scale shape is
    * "distance on candidate pairs", never all-pairs (same discipline as
    * q27/q31). Inputs truncated to 20 chars: a bounded-cost guard a real
    * fuzzy-match pass would also apply.
    */
  private def q17b(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val a = p.select(col("p_partkey"), col("p_name").as("na"), col("p_brand").as("ba"))
    val b = p.select((col("p_partkey") - 1).as("p_partkey"), col("p_name").as("nb"))
    a.join(b, Seq("p_partkey"))
      .select(
        col("p_partkey"),
        levenshtein(substring(col("na"), 1, 20), substring(col("nb"), 1, 20)).as("lev"),
        size(regexp_extract_all(col("na"), lit("[a-z]+"), lit(0))).as("n_words"),
        split_part(col("ba"), lit("#"), lit(2)).as("brand_num")
      )
      .orderBy("p_partkey")
  }

  /** Date functions: weekly buckets of events. */
  private def q18(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(to_date(date_trunc("week", col("ts"))).as("wk"))
      .agg(count(lit(1)).as("cnt"), r2(sum(col("value"))).as("sum_value"))
      .orderBy("wk")

  /** JSON: from_json over events.props. */
  private def q19(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn(
        "k",
        from_json(
          col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")
        ).getItem("k")
      )
      .groupBy(col("event_type"))
      .agg(
        r2(avg(col("k"))).as("avg_k"),
        max(col("k")).as("max_k"),
        count(col("k")).as("n")
      )
      .orderBy("event_type")

  /** Map + ad-hoc JSON surface (SURVEY §2.2 "Map/JSON" row beyond q19's
    * schema-ful from_json): `get_json_object` path extraction over
    * events.props, map construction, `map_keys`/`map_values`, and
    * `element_at` lookup. Pure per-row projection — no shuffle, the sort
    * exists only for oracle determinism.
    */
  private def q19b(s: SparkSession, dir: String): DataFrame = {
    val mp = map(
      lit("etype"),
      col("event_type"),
      lit("k"),
      get_json_object(col("props"), "$.k")
    )
    t(s, dir, "events")
      .withColumn("mp", mp)
      .select(
        col("event_id"),
        // try_* forms: this file's ANSI-safety invariant (Sessions.scala)
        // — a malformed props value must yield null, not a runtime error,
        // under spark.sql.ansi.enabled=true as well
        try_element_at(col("mp"), lit("k"))
          .try_cast(org.apache.spark.sql.types.IntegerType)
          .as("k"),
        array_join(map_keys(col("mp")), ",").as("keys"),
        array_join(map_values(col("mp")), ",").as("vals"),
        try_element_at(col("mp"), lit("etype")).as("etype")
      )
      .orderBy("event_id")
  }

  /** JSON generator/serialization surface: `json_tuple` (a Generator —
    * plans through Generate, not a scalar projection), `to_json` over a
    * struct, and `str_to_map`. Complements q19 (schema-ful from_json)
    * and q19b (path extraction + map inspection). floor→int for the
    * serialized value: double JSON rendering ("6.0" vs "6") is the one
    * place Spark and DuckDB formatters could drift.
    */
  private def q19c(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        expr("json_tuple(props, 'k')").as("jk"),
        // null fields never reach the serializer: Spark's to_json OMITS
        // null struct fields while DuckDB renders "v":null, so a null
        // value (or a failed try_cast) would silently diverge from the
        // oracle — coalesce both fields to sentinels on BOTH sides
        to_json(
          struct(
            coalesce(col("event_type"), lit("")).as("t"),
            coalesce(
              floor(col("value")).try_cast(org.apache.spark.sql.types.IntegerType),
              lit(-1)
            ).as("v")
          )
        ).as("js"),
        try_element_at(
          str_to_map(concat(lit("t:"), col("event_type")), lit(","), lit(":")),
          lit("t")
        ).as("smt")
      )
      .orderBy("event_id")

  /** Array set-algebra surface: `array_distinct`, `array_union`,
    * `array_intersect`, `array_except`, `array_position`, `sequence` —
    * the de-dup/overlap vocabulary an ad-hoc analyst reaches for.
    * Distinct output is sorted before joining to a string: Spark
    * preserves first-occurrence order, DuckDB's list_distinct is
    * unordered — sorting makes the comparison order-free. Set sizes
    * (not contents) for the binary ops for the same reason.
    */
  private def q20c(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("words", split(col("text"), " "))
      .withColumn("w1", slice(col("words"), 1, 5))
      .withColumn("w2", slice(col("words"), 6, 5))
      .select(
        col("doc_id"),
        array_join(sort_array(array_distinct(col("words"))), ",").as("nd"),
        size(array_union(col("w1"), col("w2"))).cast("bigint").as("n_union"),
        size(array_intersect(col("w1"), col("w2"))).cast("bigint").as("n_inter"),
        size(array_except(col("w1"), col("w2"))).cast("bigint").as("n_except"),
        array_position(col("words"), "the").cast("bigint").as("pos_the"),
        size(sequence(lit(1), (col("doc_id") % 5).cast("int") + 1))
          .cast("bigint")
          .as("n_seq")
      )
      .orderBy("doc_id")

  /** Array-function surface (SURVEY §2.2 "Array" row beyond the HOF/
    * kernel forms): `slice`, `sort_array` (both directions),
    * `array_contains`, positional `element_at`, plus HOF transform/filter
    * for the integer projection. floor(x*1000), not a bare cast: Spark
    * casts double→int by truncation toward zero while DuckDB rounds to
    * nearest — floor agrees bit-for-bit on both engines.
    */
  private def q20b(s: SparkSession, dir: String): DataFrame = {
    // try_cast / try_element_at per the ANSI-safety invariant: an
    // out-of-int-range float or a <3-element array must yield null under
    // ANSI mode, not a runtime error (values here never trip either; the
    // guards cost nothing)
    val ints = transform(
      slice(col("embedding"), 1, 8),
      x => floor(x.cast("double") * 1000)
        .try_cast(org.apache.spark.sql.types.IntegerType)
    )
    t(s, dir, "embeddings")
      .withColumn("ints", ints)
      .select(
        col("vec_id"),
        array_join(transform(sort_array(col("ints")), _.cast("string")), ",")
          .as("sorted_str"),
        array_contains(col("ints"), 0).as("has_zero"),
        try_element_at(sort_array(col("ints"), asc = false), lit(3))
          .as("third_desc"),
        size(filter(col("ints"), _ > 0)).cast("bigint").as("n_pos")
      )
      .orderBy("vec_id")
  }

  /** Vector cosine between deterministic embedding pairs (vb = va + 17)
    * via the codegen'd FloatVectorCosine kernel. The kernel is null on
    * zero norm — identical semantics to the guarded HOF form
    * (VectorOps.cosineHof), asserted bit-equal in VectorExpressionsSpec;
    * the HOF swap in round 3 was a 7× regression for no semantic gain
    * (the HOF *surface* — zip_with/aggregate/transform — stays exercised
    * by q54's posexplode pipeline and the spec's equality harness).
    */
  private def q20(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    a.join(b, col("vb") === col("va") + 17)
      .select(
        col("va"),
        col("vb"),
        rz(graft.llm.VectorOps.cosine(col("ea"), col("eb")), 4).as("cos_sim")
      )
      .orderBy("va")
  }

  /** The injected-SQL-function path of the cosine kernel
    * (GraftExtensions.functions → SparkSessionExtensions.injectFunction):
    * the same codegen'd FloatVectorCosine as q20, reached entirely
    * through `spark.sql` — the surface notebook/JDBC/SQL-file users see.
    * Pair offset differs from q20 (+9 vs +17) so the two queries aren't
    * byte-identical results; semantics and oracle arithmetic match.
    */
  private def q20d(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "embeddings").createOrReplaceTempView("graft_embeddings")
    s.sql("""
      SELECT a.vec_id AS va, b.vec_id AS vb,
             round(float_vector_cosine(a.embedding, b.embedding), 4) + 0.0 AS cos_sim
      FROM graft_embeddings a JOIN graft_embeddings b ON b.vec_id = a.vec_id + 9
      ORDER BY va""")
  }

  /** Correlated scalar subquery (Catalyst decorrelation): orders 25% above
    * their customer's average. Uses SQL to exercise the subquery path.
    */
  private def q21(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_orders")
    s.sql("""
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
      FROM graft_orders o
      WHERE o_totalprice > (SELECT 1.25 * avg(o_totalprice)
                            FROM graft_orders o2
                            WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey
    """)
  }

  /** Correlated LATERAL subquery with per-row ORDER BY + LIMIT: each
    * nation's top-2 customers by balance. Catalyst decorrelates the
    * lateral into row_number over (nationkey) with WindowGroupLimit
    * (partial map-side + final — per-group state bounded at k, no
    * per-nation re-execution) feeding a broadcast hash join; one pass
    * over customer (plan-pinned in PlanShapeSpec). The DuckDB oracle
    * runs the same LATERAL spelling.
    */
  private def q21b(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("graft_nation")
    t(s, dir, "customer").createOrReplaceTempView("graft_customer")
    s.sql("""
      SELECT n.n_name, l.c_name, round(l.c_acctbal, 2) AS acctbal
      FROM graft_nation n, LATERAL (
        SELECT c_name, c_acctbal FROM graft_customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2) l
      ORDER BY n.n_name, acctbal DESC, l.c_name
    """)
  }

  /** Sliding event-time window (10-minute length, 5-minute slide): each
    * event lands in two overlapping windows via the Expand operator.
    */
  private def q22b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("cnt"))
      .orderBy("win_start")

  /** Tumbling event-time window (batch window()). */
  private def q22(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"), r2(sum(col("value"))).as("sum_value"))
      .select(col("window.start").as("win_start"), col("cnt"), col("sum_value"))
      .orderBy("win_start")

  /** Session window (30-minute gap) per user. */
  private def q23(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("cnt")
      )
      .orderBy("user_id", "session_start")

  /** As-of join (SURVEY.md §2.2): for each purchase, the latest view of
    * the same user within the preceding hour. Spark has no native as-of
    * operator; the documented recipe is a bounded range join (equi on
    * user_id keeps it a hash/merge join, never cartesian) + row_number=1.
    * At scale the range bound ("within 1 hour") is what keeps per-key
    * match lists small; without it an SMJ degenerates on hot users.
    */
  private def q37(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    // both sides derive from the same scan: rename the shared key on
    // each side instead of spelling purchases("user_id") ===
    // views("user_id") — that form trips the analyzer's "trivially true
    // equals predicate" WARN and leans on version-fragile dataset-id
    // disambiguation; distinct names need no magic
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_uid"),
        col("event_id").as("p_id"),
        col("ts").as("p_ts")
      )
    val views = e
      .filter(col("event_type") === "view")
      .select(
        col("user_id").as("v_uid"),
        col("event_id").as("v_id"),
        col("ts").as("v_ts")
      )
    val w = Window
      .partitionBy(col("p_id"))
      .orderBy(desc("v_ts"), desc("v_id"))
    purchases
      .join(
        views,
        col("p_uid") === col("v_uid") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
        "left_outer"
      )
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("p_id"),
        col("p_uid").as("user_id"),
        col("v_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("lag_us")
      )
      .orderBy("p_id")
  }

  /** Statistical aggregates: stddev/variance, correlation/covariance,
    * argmin/argmax (min_by/max_by).
    */
  private def q38(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        r2(stddev_samp(col("l_quantity"))).as("sd_qty"),
        r2(var_samp(col("l_quantity"))).as("var_qty"),
        rz(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        rz(covar_samp(col("l_quantity"), col("l_discount")), 2).as("covar_qty_disc"),
        // extreme prices are unique per group at every SF (checked), so
        // plain max_by/min_by are deterministic here; with ties both
        // engines would need a composite ordering value
        max_by(col("l_orderkey"), col("l_extendedprice")).as("priciest_order"),
        min_by(col("l_orderkey"), col("l_extendedprice")).as("cheapest_order")
      )
      .orderBy("l_returnflag")

  /** Higher-moment aggregates + deterministic mode: Spark's `skewness` /
    * `kurtosis` built-ins (population central moments: g1 = m3/m2^1.5,
    * excess g2 = m4/m2² − 3 — DuckDB's same-named functions are
    * SAMPLE-adjusted, so the oracle recomputes Spark's definition from
    * raw moments) and the modal quantity per group with a deterministic
    * tie-break (most frequent, ties → smallest value — Spark's own
    * `mode()` is tie-nondeterministic, so the composite max_by spelling
    * is the cross-engine-safe form). Two hash aggregations, map-side
    * partial both times; the per-(group, value) count frame is bounded
    * by the value domain, never the row count.
    */
  private def q38b(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val moments = li
      .groupBy(col("l_returnflag"))
      .agg(
        rz(skewness(col("l_quantity")), 4).as("skew_qty"),
        rz(kurtosis(col("l_quantity")), 4).as("kurt_qty")
      )
    val mode = li
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("l_returnflag"))
      .agg(
        max_by(col("l_quantity"), struct(col("cnt"), col("l_quantity") * -1))
          .as("mode_qty")
      )
    moments.join(mode, "l_returnflag").orderBy("l_returnflag")
  }

  /** Exact interpolated percentiles (the continuous-quantile family). */
  private def q39(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        r2(expr("percentile(o_totalprice, 0.25)")).as("p25"),
        r2(expr("percentile(o_totalprice, 0.5)")).as("p50"),
        r2(expr("percentile(o_totalprice, 0.75)")).as("p75"),
        r2(expr("percentile(o_totalprice, 0.99)")).as("p99")
      )
      .orderBy("o_orderstatus")

  /** approx_percentile (t-digest-style sketch) — the estimate has no
    * DuckDB twin, so the gate emits the EXACT interpolated percentiles
    * (same plan) plus in-query 5%-rtol booleans over the estimates (the
    * q12b convention, r12 ask #9): hash-checked end to end; QueriesSpec
    * still pins the raw estimates against q39.
    */
  private def q39b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50x"),
        expr("percentile(o_totalprice, 0.99)").as("p99x"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("ap50"),
        expr("approx_percentile(o_totalprice, 0.99, 10000)").as("ap99")
      )
      .select(
        col("o_orderstatus"),
        r2(col("p50x")).as("p50"),
        r2(col("p99x")).as("p99"),
        (abs(col("ap50") - col("p50x")) / col("p50x") <= 0.05).as("ap50_within_5pct"),
        (abs(col("ap99") - col("p99x")) / col("p99x") <= 0.05).as("ap99_within_5pct")
      )
      .orderBy("o_orderstatus")

  /** Math-function surface: floor/ceil/abs/sqrt/exp/log10/power/
    * greatest/least (names and semantics shared with the oracle engine;
    * natural log is spelled differently — log vs ln — and exercised via
    * log10 instead).
    */
  private def q40(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        floor(col("p_retailprice")).as("fl"),
        ceil(col("p_retailprice")).as("cl"),
        abs(col("p_size") - 25).as("size_dist"),
        round(sqrt(col("p_retailprice")), 4).as("sq"),
        round(log10(col("p_retailprice") + 1), 4).as("l10"),
        round(pow(col("p_size"), 2).cast("double"), 2).as("size_sq"),
        greatest(col("p_size"), lit(10)).as("gmax"),
        least(col("p_size"), lit(10)).as("lmin")
      )
      .orderBy("p_partkey")

  /** Conditional + boolean + bitwise aggregate surface: `count_if`,
    * `bool_or`/`bool_and`, `bit_and`/`bit_or`/`bit_xor` — all hash
    * aggregates with map-side partial merge (each buffer is one
    * long/bool/int), so the shuffle carries #groups rows regardless of
    * corpus size.
    */
  private def q40b(s: SparkSession, dir: String): DataFrame = {
    val k = (col("event_id") % 256).cast("int")
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count_if(col("value") > 5).as("n_big"),
        bool_or(col("value") > 20).as("any_huge"),
        bool_and(col("value") >= 0).as("all_nonneg"),
        bit_and(k).as("band"),
        bit_or(k).as("bor"),
        bit_xor(k).as("bxor")
      )
      .orderBy("event_type")
  }

  /** Datetime-function surface: component extraction + day difference
    * from a fixed epoch date.
    */
  private def q41(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 2000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        hour(col("o_orderdate")).as("h"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since")
      )
      .orderBy("o_orderkey")

  /** Date-arithmetic surface beyond q18/q41's trunc/extract/diff:
    * `add_months` (end-of-month clamping — Jan 31 + 1 month = Feb 28/29,
    * identical in DuckDB's `+ INTERVAL`), `last_day`, `make_date`,
    * `quarter`, `weekofyear` (ISO weeks both engines), `date_add`.
    * Pure projection; the sort is for oracle determinism only.
    */
  private def q41b(s: SparkSession, dir: String): DataFrame = {
    val d = to_date(col("o_orderdate"))
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        add_months(d, 3).as("plus3m"),
        last_day(d).as("eom"),
        make_date(year(d), month(d), lit(1)).as("som"),
        quarter(d).as("q"),
        weekofyear(d).as("wk"),
        date_add(d, 30).as("plus30d")
      )
      .orderBy("o_orderkey")
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * MATCH each other, unlike `=`. Derived nullable keys: negative-balance
    * customers and region-0 nations both map to NULL, so the null bucket
    * joins across — which is also the scale hazard this query documents:
    * a null-safe join concentrates every NULL row into ONE key group
    * (here a deliberate mini cross product), so at 100 TB you salt or
    * pre-filter the null bucket exactly like any other hot key.
    * EqualNullSafe is a legal equi-join key for Catalyst (hash/merge
    * join, never a nested loop).
    */
  private def q49(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(
      col("c_custkey"),
      when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_nationkey")).as("ck")
    )
    val n = t(s, dir, "nation").select(
      when(col("n_regionkey") === 0, lit(null)).otherwise(col("n_nationkey")).as("nk"),
      col("n_name")
    )
    c.join(n, col("ck") <=> col("nk"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("n_name")
  }

  /** IN-list predicates incl. the three-valued NOT IN with a NULL
    * element (never TRUE: either a match makes it FALSE or the NULL
    * comparison makes it NULL) — the classic SQL footgun, pinned here
    * against the oracle's identical semantics.
    */
  private def q49b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        col("p_brand").isin("Brand#11", "Brand#22", "Brand#33").as("brand_pick"),
        (!col("p_type").isin("ECONOMY", "PROMO")).as("full_price"),
        expr("p_size NOT IN (5, 10, NULL)").as("nin_with_null")
      )
      .orderBy("p_partkey")

  /** Correlated EXISTS / NOT EXISTS — decorrelated by Catalyst into a
    * left-semi + left-anti join pair on c_custkey (asserted in
    * PlanShapeSpec; no per-row subquery execution survives planning).
    */
  private def q49c(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_customer")
    t(s, dir, "orders").createOrReplaceTempView("graft_orders")
    s.sql("""
      SELECT c_custkey, round(c_acctbal, 2) AS acctbal
      FROM graft_customer c
      WHERE EXISTS (SELECT 1 FROM graft_orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
        AND NOT EXISTS (SELECT 1 FROM graft_orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')
      ORDER BY c_custkey
    """)
  }

  /** q13e: top-N + "other" rollup — the long-tail folding every
    * reporting surface needs (and GROUPING SETS can't express): per
    * language, the top-2 sources by document count as named rows plus
    * ONE "other" row aggregating the remaining sources (docs summed,
    * fold width reported). Entirely integer/string — no float anywhere.
    *
    * Scale shape: one (lang, source) count aggregate (group-cardinality
    * sized), a lang-partitioned rank over that SMALL frame (never the
    * corpus — the corpus was already reduced), and a group-sized
    * re-aggregate of the tail. Determinism: rank ties break on source
    * name; the "other" row carries rank 3 so output order is total.
    */
  private def q13e(s: SparkSession, dir: String): DataFrame = {
    val counts = graft.queries.Tables
      .table(s, dir, "documents")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("lang").orderBy(desc("n_docs"), col("source"))
    val ranked = counts.withColumn("rnk", row_number().over(w))
    val top = ranked
      .filter(col("rnk") <= 2)
      .select(
        col("lang"),
        col("source").as("source_bucket"),
        col("n_docs"),
        lit(1L).as("n_sources"),
        col("rnk").as("rank")
      )
    val other = ranked
      .filter(col("rnk") > 2)
      .groupBy("lang")
      .agg(sum("n_docs").as("n_docs"), count(lit(1)).as("n_sources"))
      .select(
        col("lang"),
        lit("other").as("source_bucket"),
        col("n_docs"),
        col("n_sources"),
        lit(3).as("rank")
      )
    top.unionByName(other).orderBy("lang", "rank")
  }

  /** q59b: gap-fill with LINEAR INTERPOLATION — q59 carries the last
    * known value forward (LOCF); this estimates interior gaps from BOTH
    * neighbors, the standard telemetry/sensor resampling step:
    * v(t) = pv + (nv − pv)·(t − pt)/(nt − pt) for grid points between
    * two known hours, the exact value at known points (the fraction
    * degenerates to 0 there), NULL on leading/trailing gaps (no second
    * endpoint to interpolate toward — where LOCF is the honest choice,
    * q59 provides it).
    *
    * Scale shape: same grid build as q59 (per-series span + Generate);
    * the four neighbor columns come from TWO frames over ONE
    * user-partitioned sort (inclusive-preceding last + strict-following
    * first, both IGNORE NULLS) — no self-join of the grid against the
    * observations, which is the naive O(gaps × observations) spelling.
    *
    * Exactness: interpolating 2-decimal endpoints at rational time
    * fractions produces values EXACTLY at decimal-grid midpoints (an
    * odd centi-gap at fraction 1/2 → .XXX5), where Spark's
    * decimal-string HALF_UP and DuckDB's binary rounding structurally
    * disagree — no output grid fixes that. So the whole computation is
    * EXACT INTEGER arithmetic in centi-units: endpoints snap to BIGINT
    * centis (safe: `value` is centi-aligned by construction, so
    * sv·100 sits next to an integer, never near a .5), and the
    * interpolation is an explicit FLOOR division on both engines:
    * DuckDB's `//` floors natively; Spark's `div` truncates toward
    * zero, so the engine side spells floor structurally as
    * (num − pmod(num, d)) div d (pmod ≥ 0 for d > 0, so the adjusted
    * numerator is an exact multiple of d and `div` IS the floor). The
    * parity therefore no longer depends on the numerator being
    * non-negative — a corpus with negative `value`s interpolates
    * identically on both engines.
    */
  private def q59b(s: SparkSession, dir: String): DataFrame = {
    val hourly = t(s, dir, "events")
      .filter(col("user_id") < 50)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(sum(col("value")).as("sv"))
    val grid = hourly
      .groupBy("user_id")
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(
        col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hr")
      )
    val joined = grid
      .join(hourly, Seq("user_id", "hr"), "left")
      .withColumn("t", (unix_timestamp(col("hr")) / 3600L).cast("long"))
      .withColumn("kt", when(col("sv").isNotNull, col("t")))
      .withColumn("kc", round(col("sv") * 100.0, 0).cast("long"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = w.rowsBetween(1, Window.unboundedFollowing)
    joined
      .withColumn("pv", last(col("kc"), ignoreNulls = true).over(wPrev))
      .withColumn("pt", last(col("kt"), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("kc"), ignoreNulls = true).over(wNext))
      .withColumn("nt", first(col("kt"), ignoreNulls = true).over(wNext))
      .select(
        col("user_id"),
        col("hr"),
        col("sv").isNull.as("is_gap"),
        when(
          col("pv").isNotNull && (col("nv").isNotNull || col("t") === col("pt")),
          when(col("t") === col("pt"), col("pv")).otherwise(
            // floor((pv·(nt−t) + nv·(t−pt)) / (nt−pt)) in exact integer
            // arithmetic — matches DuckDB's flooring `//` for ANY sign
            expr(
              "(pv * (nt - t) + nv * (t - pt) " +
                "- pmod(pv * (nt - t) + nv * (t - pt), nt - pt)) div (nt - pt)"
            )
          )
        ).as("interp_centi")
      )
      .orderBy("user_id", "hr")
  }

  /** Quantified comparison subqueries (`> ALL` / `> ANY`), including the
    * empty-set edge (ALL over ∅ is TRUE, ANY over ∅ is FALSE). Spark SQL
    * has no quantified-predicate syntax, so the engine-side spelling is
    * the standard aggregate rewrite — `x > ALL S ⇔ x > max(S)` and
    * `x > ANY S ⇔ x > min(S)` (valid because c_acctbal is NOT NULL in
    * this schema), with ±Infinity coalesces reproducing the empty-set
    * truth values. Catalyst plans each scalar subquery as a one-row
    * aggregate broadcast into the projection — no per-row subquery
    * execution, the shape that scales (the comparison set is reduced
    * once, not re-scanned per probe row). The oracle spells the real
    * quantified predicates, so the rewrite's semantics are value-checked
    * row by row; nationkey 999 matches nothing, pinning the ∅ edge.
    */
  private def q49d(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_customer")
    s.sql("""
      SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
        c_acctbal > coalesce((SELECT max(c2.c_acctbal) FROM graft_customer c2
                              WHERE c2.c_nationkey = 3),
                             double('-Infinity')) AS gt_all_n3,
        c_acctbal > coalesce((SELECT min(c2.c_acctbal) FROM graft_customer c2
                              WHERE c2.c_nationkey = 3),
                             double('Infinity')) AS gt_any_n3,
        c_acctbal > coalesce((SELECT max(c2.c_acctbal) FROM graft_customer c2
                              WHERE c2.c_nationkey = 999),
                             double('-Infinity')) AS gt_all_empty,
        c_acctbal > coalesce((SELECT min(c2.c_acctbal) FROM graft_customer c2
                              WHERE c2.c_nationkey = 999),
                             double('Infinity')) AS gt_any_empty
      FROM graft_customer
      ORDER BY c_custkey
    """)
  }

  // ------------------------------------------------------------------ maps

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_flow_filter_sort" -> q01,
    "q02_flow_top_talkers" -> q02,
    "q03_flow_topk" -> q03,
    "q04_flow_partitions" -> q04,
    "q230_flow_fanout" -> q230,
    "q05_join_inner" -> q05,
    "q06_join_broadcast" -> q06,
    "q07_join_multiway" -> q07,
    "q08_join_left_outer" -> q08,
    "q08b_join_right_outer" -> q08b,
    "q08c_join_full_outer" -> q08c,
    "q09_join_semi_anti" -> q09,
    "q10_join_range" -> q10,
    "q11_agg_having" -> q11,
    "q12_distinct_agg" -> q12,
    "q12b_approx_distinct" -> q12b,
    "q12c_sketch_rollup" -> q12c,
    "q154_sketch_overlap" -> q154,
    "q13_rollup" -> q13,
    "q13b_cube" -> q13b,
    "q13c_grouping_id" -> q13c,
    "q13d_grouping_sets" -> q13d,
    "q13e_topn_other" -> q13e,
    "q14_window_rank" -> q14,
    "q14b_window_ranks_full" -> q14b,
    "q14c_window_ignore_nulls" -> q14c,
    "q15_window_analytic" -> q15,
    "q15b_window_range_frame" -> q15b,
    "q59_resample_gapfill" -> q59,
    "q59b_resample_interp" -> q59b,
    "q16_set_ops" -> q16,
    "q16b_set_ops_all" -> q16b,
    "q17_string_fns" -> q17,
    "q17b_string_distance" -> q17b,
    "q18_date_fns" -> q18,
    "q19_json_fns" -> q19,
    "q19b_map_fns" -> q19b,
    "q19c_json_gen_fns" -> q19c,
    "q20_array_cosine" -> q20,
    "q20b_array_fns" -> q20b,
    "q20c_array_set_fns" -> q20c,
    "q20d_sql_kernel" -> q20d,
    "q21_correlated_subquery" -> q21,
    "q21b_lateral_topk" -> q21b,
    "q22_tumbling_window" -> q22,
    "q22b_sliding_window" -> q22b,
    "q23_session_window" -> q23,
    "q37_asof_join" -> q37,
    "q38_stats_agg" -> q38,
    "q38b_moment_aggs" -> q38b,
    "q39_percentiles" -> q39,
    "q39b_approx_percentiles" -> q39b,
    "q40_math_fns" -> q40,
    "q40b_cond_bitwise_aggs" -> q40b,
    "q41_datetime_fns" -> q41,
    "q41b_date_arithmetic" -> q41b,
    "q42_pivot" -> q42,
    "q42b_unpivot" -> q42b,
    "q44_ip_enrich" -> q44,
    "q45_conditional_fns" -> q45,
    "q46_histogram" -> q46,
    "q46b_equidepth_histogram" -> q46b,
    "q49_join_null_safe" -> q49,
    "q49b_in_list" -> q49b,
    "q49c_exists" -> q49c,
    "q49d_quantified" -> q49d
  )

  private val flowCte = graft.etl.FlowLogCorpus.oracleCte

  /** Shared DuckDB cosine emulation over the embeddings self-join — one
    * definition for q20 (Column path) and q20d (injected-SQL path) so the
    * two oracles can never drift; only the pair offset differs.
    */
  private def cosinePairsSql(offset: Int): String =
    s"""SELECT a.vec_id AS va, b.vec_id AS vb,
       |  round(
       |    list_sum(list_transform(generate_series(1, len(a.embedding)),
       |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
       |    / nullif(
       |      sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 0),
       |  4) + 0.0 AS cos_sim
       |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + $offset
       |ORDER BY va""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q01_flow_filter_sort" ->
      s"""$flowCte
         |SELECT srcaddr, dstaddr, bytes FROM f
         |WHERE action = 'ACCEPT'
         |ORDER BY srcaddr, dstaddr, bytes""".stripMargin,
    "q02_flow_top_talkers" ->
      s"""$flowCte
         |SELECT srcaddr, CAST(sum(bytes) AS BIGINT) AS sum_bytes,
         |  CAST(sum(packets) AS BIGINT) AS sum_packets, count(*) AS cnt
         |FROM f GROUP BY srcaddr ORDER BY srcaddr""".stripMargin,
    "q03_flow_topk" ->
      s"""$flowCte
         |SELECT dstaddr, CAST(sum(bytes) AS BIGINT) AS sum_bytes
         |FROM f GROUP BY dstaddr
         |ORDER BY sum_bytes DESC, dstaddr LIMIT 10""".stripMargin,
    "q04_flow_partitions" ->
      s"""$flowCte
         |SELECT dt, account, count(*) AS cnt
         |FROM f GROUP BY dt, account ORDER BY dt, account""".stripMargin,
    // same NODATA-excluded aggregate, exact distinct, same corpus-
    // baseline excess dag with the +0.0 sign normalization
    "q230_flow_fanout" ->
      s"""$flowCte,
         |base AS (
         |  SELECT srcaddr, CAST(count(DISTINCT dstaddr) AS BIGINT) AS n_dsts,
         |    count(*) AS n_flows, CAST(sum(bytes) AS BIGINT) AS sum_bytes,
         |    CAST(sum(CASE WHEN action = 'REJECT' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_rejects
         |  FROM f WHERE srcaddr <> '-' GROUP BY srcaddr),
         |tot AS (SELECT CAST(sum(n_flows) AS BIGINT) AS tf,
         |               CAST(sum(n_rejects) AS BIGINT) AS tr FROM base)
         |SELECT srcaddr, n_dsts, n_flows, sum_bytes, n_rejects,
         |  round(CAST(n_rejects AS DOUBLE) / CAST(n_flows AS DOUBLE), 6)
         |    AS reject_ratio,
         |  round(CAST(n_rejects AS DOUBLE) / CAST(n_flows AS DOUBLE)
         |        - CAST(tr AS DOUBLE) / CAST(tf AS DOUBLE), 6) + 0.0
         |    AS reject_excess
         |FROM base, tot
         |ORDER BY reject_excess DESC, srcaddr LIMIT 20""".stripMargin,
    "q44_ip_enrich" ->
      s"""$flowCte
         |SELECT 'net-' || CAST(CAST(string_split(srcaddr, '.')[3] AS INTEGER) // 16 AS VARCHAR) AS owner,
         |  count(*) AS cnt, CAST(sum(bytes) AS BIGINT) AS sum_bytes
         |FROM f WHERE srcaddr <> '-'
         |GROUP BY owner ORDER BY owner""".stripMargin,
    "q49_join_null_safe" ->
      """WITH c AS (SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS ck
        |  FROM customer),
        |n AS (SELECT CASE WHEN n_regionkey = 0 THEN NULL ELSE n_nationkey END AS nk,
        |  n_name FROM nation)
        |SELECT n_name, count(*) AS cnt
        |FROM c JOIN n ON ck IS NOT DISTINCT FROM nk
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q49b_in_list" ->
      """SELECT p_partkey,
        |  p_brand IN ('Brand#11', 'Brand#22', 'Brand#33') AS brand_pick,
        |  p_type NOT IN ('ECONOMY', 'PROMO') AS full_price,
        |  p_size NOT IN (5, 10, NULL) AS nin_with_null
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q49c_exists" ->
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q13e_topn_other" ->
      """WITH counts AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1, 2),
        |ranked AS (
        |  SELECT lang, source, n_docs,
        |    CAST(row_number() OVER (PARTITION BY lang
        |                            ORDER BY n_docs DESC, source) AS INT) AS rnk
        |  FROM counts)
        |SELECT lang, source AS source_bucket, n_docs,
        |  CAST(1 AS BIGINT) AS n_sources, rnk AS rank
        |FROM ranked WHERE rnk <= 2
        |UNION ALL
        |SELECT lang, 'other', CAST(sum(n_docs) AS BIGINT),
        |  CAST(count(*) AS BIGINT), 3
        |FROM ranked WHERE rnk > 2 GROUP BY lang
        |ORDER BY lang, rank""".stripMargin,
    "q49d_quantified" ->
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
        |  c_acctbal > ALL (SELECT c2.c_acctbal FROM customer c2
        |                   WHERE c2.c_nationkey = 3) AS gt_all_n3,
        |  c_acctbal > ANY (SELECT c2.c_acctbal FROM customer c2
        |                   WHERE c2.c_nationkey = 3) AS gt_any_n3,
        |  c_acctbal > ALL (SELECT c2.c_acctbal FROM customer c2
        |                   WHERE c2.c_nationkey = 999) AS gt_all_empty,
        |  c_acctbal > ANY (SELECT c2.c_acctbal FROM customer c2
        |                   WHERE c2.c_nationkey = 999) AS gt_any_empty
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q46b_equidepth_histogram" ->
      """WITH pv AS (
        |  SELECT round(value, 2) AS v, count(*) AS c FROM events
        |  WHERE value IS NOT NULL GROUP BY 1),
        |cum AS (
        |  SELECT v, c,
        |    CAST(coalesce(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_lt
        |  FROM pv),
        |tot AS (SELECT count(*) AS total FROM events WHERE value IS NOT NULL)
        |SELECT (cum_lt * 10) // total AS bucket,
        |  CAST(sum(c) AS BIGINT) AS n, min(v) AS lo, max(v) AS hi
        |FROM cum CROSS JOIN tot
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q45_conditional_fns" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 'finished'
        |       WHEN o_orderstatus = 'O' THEN 'open'
        |       ELSE 'other' END AS status_label,
        |  o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_urgent,
        |  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_default,
        |  round(greatest(o_totalprice, 1000.0), 2) AS price_floor
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q46_histogram" ->
      s"""$flowCte
         |SELECT bytes // 5000 AS bucket, count(*) AS cnt,
         |  round(avg(bytes), 2) AS avg_bytes
         |FROM f GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q05_join_inner" ->
      """SELECT c_mktsegment, count(*) AS order_cnt, round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q06_join_broadcast" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q07_join_multiway" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q08_join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS order_cnt
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q08b_join_right_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS order_cnt
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q08c_join_full_outer" ->
      """WITH c AS (SELECT c_custkey FROM customer WHERE c_acctbal > 0),
        |o AS (SELECT o_custkey, count(*) AS order_cnt,
        |        round(sum(o_totalprice), 2) AS spend
        |      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-06-01'
        |      GROUP BY o_custkey)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        |  CASE WHEN c_custkey IS NULL THEN 'order_only'
        |       WHEN o_custkey IS NULL THEN 'customer_only'
        |       ELSE 'both' END AS side,
        |  order_cnt, spend
        |FROM c FULL JOIN o ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "q09_join_semi_anti" ->
      """SELECT 'with_orders' AS op, count(*) AS cnt FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders' AS op, count(*) AS cnt FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY op""".stripMargin,
    "q10_join_range" ->
      """SELECT a.user_id, count(*) AS pair_cnt
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |WHERE a.event_id < b.event_id
        |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |  AND abs(a.value - b.value) < 5.0
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    "q11_agg_having" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 2) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |HAVING count(*) > 100
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q12_distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the sketch gates (q12b/q12c/q39b): the oracle recomputes the
    // EXACT twins and asserts the tolerance booleans are TRUE — the
    // estimates themselves have no DuckDB twin, but the in-plan bound
    // makes the assertion hash-checkable (r12 verdict ask #9)
    "q12b_approx_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS users_exact,
        |  TRUE AS approx_within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q12c_sketch_rollup" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
        |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS users_exact,
        |  TRUE AS est_within_5pct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q154_sketch_overlap" ->
      """WITH e AS (
        |  SELECT user_id, event_type FROM events
        |  WHERE event_type IN ('view', 'purchase'))
        |SELECT
        |  CAST(count(DISTINCT CASE WHEN event_type = 'view'
        |       THEN user_id END) AS BIGINT) AS n_view_exact,
        |  CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
        |       THEN user_id END) AS BIGINT) AS n_purchase_exact,
        |  (SELECT CAST(count(*) AS BIGINT) FROM (
        |     SELECT user_id FROM e GROUP BY user_id
        |     HAVING count(DISTINCT event_type) = 2)) AS n_overlap_exact,
        |  TRUE AS est_within_15pct
        |FROM e""".stripMargin,
    "q39b_approx_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
        |  TRUE AS ap50_within_5pct,
        |  TRUE AS ap99_within_5pct
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q13_rollup" ->
      """SELECT r_name, n_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q13b_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q13c_grouping_id" ->
      """SELECT r_name, n_name, GROUPING(r_name, n_name) AS gid,
        |  count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q13d_grouping_sets" ->
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS d FROM events)
        |SELECT event_type, d, GROUPING(event_type, d) AS gid, count(*) AS cnt
        |FROM e
        |GROUP BY GROUPING SETS ((event_type, d), (event_type), ())
        |ORDER BY gid, event_type ASC NULLS FIRST, d ASC NULLS FIRST""".stripMargin,
    "q42_pivot" ->
      """SELECT CAST(ts AS DATE) AS d,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS "view"
        |FROM events GROUP BY d ORDER BY d""".stripMargin,
    "q42b_unpivot" ->
      """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
        |ty AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
        |c AS (SELECT CAST(ts AS DATE) AS d, event_type, count(*) AS cnt
        |      FROM events GROUP BY 1, 2)
        |SELECT days.d, ty.event_type, COALESCE(c.cnt, 0) AS cnt
        |FROM days CROSS JOIN ty
        |LEFT JOIN c ON c.d = days.d AND c.event_type = ty.event_type
        |ORDER BY days.d, ty.event_type""".stripMargin,
    "q16b_set_ops_all" ->
      """SELECT 'except_all' AS op, count(*) AS cnt FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT ALL
        |  SELECT user_id FROM events WHERE event_type = 'purchase') x
        |UNION ALL
        |SELECT 'intersect_all' AS op, count(*) AS cnt FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT ALL
        |  SELECT user_id FROM events WHERE event_type = 'purchase') y
        |ORDER BY op""".stripMargin,
    "q22b_sliding_window" ->
      """WITH assigned AS (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' FROM events)
        |SELECT CAST(win_start AS TIMESTAMP) AS win_start, count(*) AS cnt
        |FROM assigned GROUP BY 1 ORDER BY win_start""".stripMargin,
    "q14_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, round(o_totalprice, 2) AS price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders) x
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q14b_window_ranks_full" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 4) AS pct_rank,
        |  round(cume_dist() OVER w, 4) AS cdist,
        |  first_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q14c_window_ignore_nulls" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN value >= 5 THEN round(value, 2) END AS sv
        |  FROM events WHERE user_id < 50)
        |SELECT event_id, user_id, sv,
        |  first_value(sv IGNORE NULLS) OVER w AS first_nn,
        |  last_value(sv IGNORE NULLS) OVER w AS last_nn,
        |  nth_value(sv, 2 IGNORE NULLS) OVER w AS second_nn
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,
    "q15_window_analytic" ->
      """SELECT event_id, user_id, round(value, 2) AS value,
        |  round(lag(value, 1) OVER w, 2) AS prev_value,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS run_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q15b_window_range_frame" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_trailing_hour,
        |  round(sum(value) OVER w, 2) AS sum_trailing_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q59_resample_gapfill" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr,
        |    count(*) AS n, sum(value) AS sv
        |  FROM events WHERE user_id < 50 GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM hourly GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        |  FROM spans)
        |SELECT g.user_id, g.hr,
        |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_events,
        |  round(last_value(h.sv IGNORE NULLS)
        |    OVER (PARTITION BY g.user_id ORDER BY g.hr), 2) AS locf_sum
        |FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hr = g.hr
        |ORDER BY g.user_id, g.hr""".stripMargin,
    "q59b_resample_interp" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr, sum(value) AS sv
        |  FROM events WHERE user_id < 50 GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM hourly GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        |  FROM spans),
        |j AS (
        |  SELECT g.user_id, g.hr, h.sv,
        |    CAST(epoch(g.hr) AS BIGINT) // 3600 AS t,
        |    CASE WHEN h.sv IS NOT NULL
        |         THEN CAST(epoch(g.hr) AS BIGINT) // 3600 END AS kt,
        |    CAST(round(h.sv * 100.0, 0) AS BIGINT) AS kc
        |  FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hr = g.hr),
        |n AS (
        |  SELECT user_id, hr, sv, t,
        |    last_value(kc IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hr) AS pv,
        |    last_value(kt IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hr) AS pt,
        |    first_value(kc IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hr
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(kt IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hr
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
        |  FROM j)
        |SELECT user_id, hr, sv IS NULL AS is_gap,
        |  CASE WHEN pv IS NOT NULL AND (nv IS NOT NULL OR t = pt)
        |    THEN CASE WHEN t = pt THEN pv
        |         ELSE (pv * (nt - t) + nv * (t - pt)) // (nt - pt) END
        |  END AS interp_centi
        |FROM n ORDER BY user_id, hr""".stripMargin,
    "q16_set_ops" ->
      """SELECT 'except' AS op, count(*) AS cnt FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') x
        |UNION ALL
        |SELECT 'intersect' AS op, count(*) AS cnt FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') y
        |UNION ALL
        |SELECT 'union' AS op, count(*) AS cnt FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  UNION
        |  SELECT user_id FROM events WHERE event_type = 'purchase') z
        |ORDER BY op""".stripMargin,
    "q17_string_fns" ->
      """SELECT p_partkey, regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  upper(p_brand) AS brand_uc, substring(p_type, 1, 4) AS type_pfx,
        |  concat_ws('#', p_brand, p_type) AS tag, length(p_name) AS name_len,
        |  p_type LIKE '%BRASS' AS is_brass
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q18_date_fns" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS wk, count(*) AS cnt,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY wk""".stripMargin,
    "q19_json_fns" ->
      """SELECT event_type,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 2) AS avg_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
        |  count(CAST(json_extract_string(props, '$.k') AS INT)) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q19b_map_fns" ->
      """WITH m AS (
        |  SELECT event_id,
        |         MAP {'etype': event_type, 'k': json_extract_string(props, '$.k')} AS mp
        |  FROM events)
        |SELECT event_id,
        |       CAST(mp['k'][1] AS INT) AS k,
        |       array_to_string(map_keys(mp), ',') AS keys,
        |       array_to_string(map_values(mp), ',') AS vals,
        |       element_at(mp, 'etype')[1] AS etype
        |FROM m ORDER BY event_id""".stripMargin,
    "q19c_json_gen_fns" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS jk,
        |  CAST(to_json(struct_pack(t := coalesce(event_type, ''),
        |                           v := coalesce(TRY_CAST(floor(value) AS INT), -1))) AS VARCHAR) AS js,
        |  event_type AS smt
        |FROM events ORDER BY event_id""".stripMargin,
    "q20c_array_set_fns" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |s AS (
        |  SELECT doc_id, words, words[1:5] AS w1, words[6:10] AS w2 FROM w)
        |SELECT doc_id,
        |  array_to_string(list_sort(list_distinct(words)), ',') AS nd,
        |  CAST(len(list_distinct(list_concat(w1, w2))) AS BIGINT) AS n_union,
        |  CAST(len(list_filter(list_distinct(w1),
        |                       x -> list_contains(w2, x))) AS BIGINT) AS n_inter,
        |  CAST(len(list_filter(list_distinct(w1),
        |                       x -> NOT list_contains(w2, x))) AS BIGINT) AS n_except,
        |  CAST(coalesce(list_position(words, 'the'), 0) AS BIGINT) AS pos_the,
        |  CAST(len(generate_series(1, CAST(doc_id % 5 AS INT) + 1)) AS BIGINT) AS n_seq
        |FROM s ORDER BY doc_id""".stripMargin,
    "q20b_array_fns" ->
      """WITH ii AS (
        |  SELECT vec_id,
        |    list_transform(embedding[1:8],
        |                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS INT)) AS ints
        |  FROM embeddings)
        |SELECT vec_id,
        |  array_to_string(list_sort(ints), ',') AS sorted_str,
        |  list_contains(ints, 0) AS has_zero,
        |  list_sort(ints, 'DESC')[3] AS third_desc,
        |  CAST(len(list_filter(ints, x -> x > 0)) AS BIGINT) AS n_pos
        |FROM ii ORDER BY vec_id""".stripMargin,
    "q20_array_cosine" -> cosinePairsSql(17),
    "q20d_sql_kernel" -> cosinePairsSql(9),
    "q21_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders o
        |WHERE o_totalprice > (SELECT 1.25 * avg(o_totalprice)
        |                      FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q21b_lateral_topk" ->
      """SELECT n.n_name, l.c_name, round(l.c_acctbal, 2) AS acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) l
        |ORDER BY n.n_name, acctbal DESC, l.c_name""".stripMargin,
    "q22_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start,
        |  count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY win_start""".stripMargin,
    "q23_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |numbered AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS session_start, count(*) AS cnt
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q40_math_fns" ->
      """SELECT p_partkey,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS cl,
        |  abs(p_size - 25) AS size_dist,
        |  round(sqrt(p_retailprice), 4) AS sq,
        |  round(log10(p_retailprice + 1), 4) AS l10,
        |  round(CAST(pow(p_size, 2) AS DOUBLE), 2) AS size_sq,
        |  greatest(p_size, 10) AS gmax,
        |  least(p_size, 10) AS lmin
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q17b_string_distance" ->
      """SELECT a.p_partkey,
        |  CAST(levenshtein(substr(a.p_name, 1, 20), substr(b.p_name, 1, 20)) AS INT) AS lev,
        |  CAST(len(regexp_extract_all(a.p_name, '[a-z]+')) AS INT) AS n_words,
        |  split_part(a.p_brand, '#', 2) AS brand_num
        |FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
        |ORDER BY a.p_partkey""".stripMargin,
    "q41b_date_arithmetic" ->
      """WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT o_orderkey,
        |  CAST(d + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  last_day(d) AS eom,
        |  make_date(CAST(year(d) AS INT), CAST(month(d) AS INT), 1) AS som,
        |  CAST(quarter(d) AS INT) AS q,
        |  CAST(weekofyear(d) AS INT) AS wk,
        |  d + 30 AS plus30d
        |FROM o ORDER BY o_orderkey""".stripMargin,
    "q40b_cond_bitwise_aggs" ->
      """SELECT event_type,
        |  CAST(count_if(value > 5) AS BIGINT) AS n_big,
        |  bool_or(value > 20) AS any_huge,
        |  bool_and(value >= 0) AS all_nonneg,
        |  bit_and(CAST(event_id % 256 AS INT)) AS band,
        |  bit_or(CAST(event_id % 256 AS INT)) AS bor,
        |  bit_xor(CAST(event_id % 256 AS INT)) AS bxor
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q41_datetime_fns" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  day(o_orderdate) AS d, hour(o_orderdate) AS h,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,
    "q38_stats_agg" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 2) AS sd_qty,
        |  round(var_samp(l_quantity), 2) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_discount), 2) + 0.0 AS covar_qty_disc,
        |  max_by(l_orderkey, l_extendedprice) AS priciest_order,
        |  min_by(l_orderkey, l_extendedprice) AS cheapest_order
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // Spark's population-moment definitions recomputed from raw moments
    // (DuckDB's skewness/kurtosis are sample-adjusted — different
    // formulas, not a precision matter)
    "q38b_moment_aggs" ->
      """WITH mu AS (
        |  SELECT l_returnflag, avg(l_quantity) AS mu
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (
        |  SELECT l.l_returnflag,
        |    avg(pow(l.l_quantity - mu.mu, 2)) AS m2,
        |    avg(pow(l.l_quantity - mu.mu, 3)) AS m3,
        |    avg(pow(l.l_quantity - mu.mu, 4)) AS m4
        |  FROM lineitem l JOIN mu ON l.l_returnflag = mu.l_returnflag
        |  GROUP BY l.l_returnflag),
        |cnt AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS c
        |  FROM lineitem GROUP BY l_returnflag, l_quantity),
        |md AS (
        |  SELECT l_returnflag, l_quantity AS mode_qty FROM (
        |    SELECT l_returnflag, l_quantity,
        |      row_number() OVER (PARTITION BY l_returnflag
        |                         ORDER BY c DESC, l_quantity ASC) AS rn
        |    FROM cnt) WHERE rn = 1)
        |SELECT m.l_returnflag,
        |  round(m3 / pow(m2, 1.5), 4) + 0.0 AS skew_qty,
        |  round(m4 / (m2 * m2) - 3, 4) + 0.0 AS kurt_qty,
        |  mode_qty
        |FROM m JOIN md ON m.l_returnflag = md.l_returnflag
        |ORDER BY m.l_returnflag""".stripMargin,
    "q39_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
        |  round(quantile_cont(o_totalprice, 0.99), 2) AS p99
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q37_asof_join" ->
      """WITH purchases AS (
        |  SELECT user_id, event_id AS p_id, CAST(ts AS TIMESTAMP) AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |views AS (
        |  SELECT user_id, event_id AS v_id, CAST(ts AS TIMESTAMP) AS v_ts
        |  FROM events WHERE event_type = 'view'),
        |joined AS (
        |  SELECT p.p_id, p.user_id, v.v_id,
        |    epoch_us(p.p_ts) - epoch_us(v.v_ts) AS lag_us,
        |    row_number() OVER (PARTITION BY p.p_id
        |                       ORDER BY v.v_ts DESC, v.v_id DESC) AS rn
        |  FROM purchases p
        |  LEFT JOIN views v
        |    ON p.user_id = v.user_id
        |   AND v.v_ts <= p.p_ts
        |   AND v.v_ts >= p.p_ts - INTERVAL 1 HOUR)
        |SELECT p_id, user_id, v_id, lag_us FROM joined
        |WHERE rn = 1 ORDER BY p_id""".stripMargin
  )
}
