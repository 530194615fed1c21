package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q129: market-basket association rules — 2-itemset support /
  * confidence / lift over order baskets, the classic co-purchase
  * recommender signal ("parts bought together"). Complement of q72
  * (PMI is the TEXT-adjacency association measure; lift is its
  * transaction-basket counterpart — same ratio-to-independence idea,
  * different universe and normalization).
  *
  * Scale shape: ONE shuffle of the fact by order key builds the sorted
  * distinct basket array (collect_set folds the dedup into the same
  * aggregate — no separate DISTINCT pass, no self-join); pairs are then
  * generated MAP-SIDE by two chained generators (posexplode × sliced
  * explode), C(k,2) per order — bounded by basket size k (≤ 17 in this
  * corpus, single digits in any order system), never by corpus size.
  * Counting pairs is one hash aggregate; the per-item counts derive
  * from the same basket frame (order-sized, not corpus-sized) and
  * broadcast with the order total. A hot ITEM does not explode: pairs
  * form only within an order. (The items⋈items self-join spelling was
  * measured first at sf0.1: 2.3 s median vs 1.9 s for this shape under
  * identical conditions — the DISTINCT pre-pass and the join exchange
  * both fold into the one basket aggregate, whose shuffle the
  * item-count/total branches then reuse via ReusedExchange.)
  *
  * Determinism: support/confidence/lift are single divisions of exact
  * BIGINT counts, gridded round-6; ordering by (lift, pair keys) is
  * unambiguous because the key pair is unique.
  */
object Basket {

  private val MinSupport = 2 // pair must co-occur in >= 2 orders
  private val TopK = 20

  private def q129(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables
      .table(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    val itemCounts = baskets
      .select(explode(col("ps")).as("pk"))
      .groupBy("pk")
      .agg(count(lit(1)).as("cnt_item"))
    val totals = baskets.agg(count(lit(1)).as("n_orders"))
    val pairs = baskets
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "pa")))
      // ps is sorted and deduped, so pairing each element with the
      // strictly-later slice yields exactly the pa < pb pairs
      .select(
        col("pa"),
        explode(slice(col("ps"), col("i") + lit(2), size(col("ps")))).as("pb")
      )
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("cnt_pair"))
      .filter(col("cnt_pair") >= MinSupport)
    pairs
      .join(broadcast(itemCounts.withColumnRenamed("pk", "pa")), "pa")
      .withColumnRenamed("cnt_item", "cnt_a")
      .join(
        broadcast(itemCounts.withColumnRenamed("pk", "pb")
          .withColumnRenamed("cnt_item", "cnt_b")),
        "pb"
      )
      .crossJoin(broadcast(totals))
      .select(
        col("pa"),
        col("pb"),
        col("cnt_pair"),
        col("cnt_a"),
        col("cnt_b"),
        round(col("cnt_pair") / col("n_orders"), 6).as("support"),
        round(col("cnt_pair") / col("cnt_a"), 6).as("confidence"),
        round(
          col("cnt_pair") * col("n_orders") / (col("cnt_a") * col("cnt_b")),
          6
        ).as("lift")
      )
      .orderBy(desc("lift"), col("pa"), col("pb"))
      .limit(TopK)
  }

  /** q232: 3-itemset association rules — the Apriori step above
    * q129's pairs ("bread+butter→milk" style bundles that no pair
    * rollup can see: a triple can lift far above every one of its
    * pairs when the three sell as a KIT, and bundle/planogram
    * decisions read exactly this level): support / lift-vs-full-
    * independence for every part triple co-purchased in ≥
    * [[MinSupport]] orders, top-[[TopK]] by (lift, keys).
    *
    * Determinism: exact BIGINT counts; lift spelled as the exact
    * product cross-ratio cnt·N² / (cₐ·c_b·c_c) — numerator and
    * denominator exact integer products cast once, one round-6
    * division.
    *
    * Scale shape: q129's exactly, one generator deeper — triples
    * generate MAP-SIDE from the sorted distinct basket array via
    * THREE chained generators (posexplode × posexplode-of-slice ×
    * explode-of-slice), C(k,3) per order — bounded by basket size,
    * never corpus²; one hash aggregate counts them; the item-count
    * frame broadcasts. A hot item still cannot explode: triples form
    * only within an order.
    */
  private def q232(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables
      .table(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    val itemCounts = baskets
      .select(explode(col("ps")).as("pk"))
      .groupBy("pk")
      .agg(count(lit(1)).as("cnt_item"))
    val totals = baskets.agg(count(lit(1)).as("n_orders"))
    val triples = baskets
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "pa")))
      .select(
        col("ps"),
        col("i"),
        col("pa"),
        posexplode(slice(col("ps"), col("i") + lit(2), size(col("ps"))))
          .as(Seq("j", "pb"))
      )
      // pb sits at 0-based position i+1+j, so the strictly-later slice
      // for pc starts at 1-based i+j+3
      .select(
        col("pa"),
        col("pb"),
        explode(slice(col("ps"), col("i") + col("j") + lit(3), size(col("ps"))))
          .as("pc")
      )
      .groupBy("pa", "pb", "pc")
      .agg(count(lit(1)).as("cnt_triple"))
      .filter(col("cnt_triple") >= MinSupport)
    triples
      .join(broadcast(itemCounts.withColumnRenamed("pk", "pa")), "pa")
      .withColumnRenamed("cnt_item", "cnt_a")
      .join(
        broadcast(
          itemCounts.withColumnRenamed("pk", "pb").withColumnRenamed("cnt_item", "cnt_b")
        ),
        "pb"
      )
      .join(
        broadcast(
          itemCounts.withColumnRenamed("pk", "pc").withColumnRenamed("cnt_item", "cnt_c")
        ),
        "pc"
      )
      .crossJoin(broadcast(totals))
      .select(
        col("pa"),
        col("pb"),
        col("pc"),
        col("cnt_triple"),
        round(col("cnt_triple") / col("n_orders"), 6).as("support"),
        round(
          (col("cnt_triple") * col("n_orders") * col("n_orders")).cast("double") /
            (col("cnt_a") * col("cnt_b") * col("cnt_c")).cast("double"),
          6
        ).as("lift")
      )
      .orderBy(desc("lift"), col("pa"), col("pb"), col("pc"))
      .limit(TopK)
  }

  /** q242: item-item collaborative filtering — cosine similarity on the
    * implicit customer×part rating matrix ("customers who buy X also
    * buy Y"), the neighborhood recommender that q129's lift cannot
    * replace: lift counts CO-OCCURRENCE IN ONE ORDER, while item-CF
    * aggregates a customer's WHOLE history into a rating (number of
    * orders containing the part) and normalizes by each item's rating
    * norm, so a prolific buyer strengthens similarity without a popular
    * item swamping the ranking. Top-[[TopK]] pairs by (cosine, keys)
    * among pairs co-rated by ≥ [[MinSupport]] customers.
    *
    * Determinism: ratings and the dot product Σᵤ rᵤₐ·rᵤ_b are exact
    * BIGINTs, as are the per-item norms Σᵤ r²; cosine is the single
    * IEEE dag dot/(√normₐ·√norm_b) spelled identically on both engines,
    * round-6, with the unique (pa, pb) key breaking rank ties.
    *
    * Scale shape: ONE shuffle keyed by customer builds the sorted
    * per-customer (part, rating) array; pairs generate MAP-SIDE via the
    * q129 posexplode × sliced-explode chain — C(k,2) per CUSTOMER
    * CATALOG k, never corpus² (a hot item pairs only inside the
    * catalogs that contain it). One hash aggregate sums the dots; the
    * part-bounded norm frame broadcasts twice. Production caps k for
    * degenerate power users (sample their catalog) — this corpus's max
    * catalog is double digits, so the gate runs exact.
    */
  private def q242(s: SparkSession, dir: String): DataFrame = {
    val ratings = Tables
      .table(s, dir, "lineitem")
      .join(
        Tables.table(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey")
      )
      .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .agg(countDistinct(col("l_orderkey")).as("r"))
    // BIGINT sums, not DECIMAL(38): r is orders-per-(customer, part), so
    // r² and rᵤₐ·rᵤ_b are ≤ ~10⁸ at any plausible scale and each sum runs
    // over ≤ |customers| raters — bounded ≤ ~10¹⁷ ≪ 2⁶³. The previous
    // spelling cast the DECIMAL(38) sum to LONG anyway (same value,
    // asserting exactly this bound) while paying 16-byte decimal
    // arithmetic through the two hot aggregates — the dot-product one
    // runs over the C(k,2)-per-customer pair stream (13.1M rows at
    // sf0.1), where the narrower accumulator is real shuffle/CPU savings
    // (guide §2.3). itemCfCapped mirrors the spelling (ItemCfCapSpec
    // pins equality).
    val norms = ratings
      .groupBy("part")
      .agg(sum(col("r") * col("r")).as("nrm"))
    val catalogs = ratings
      .groupBy("cust")
      .agg(sort_array(collect_list(struct(col("part"), col("r")))).as("ps"))
    val pairs = catalogs
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "a")))
      .select(
        col("a"),
        explode(slice(col("ps"), col("i") + lit(2), size(col("ps")))).as("b")
      )
      .select(
        col("a.part").as("pa"),
        col("b.part").as("pb"),
        (col("a.r") * col("b.r")).as("rr")
      )
      .groupBy("pa", "pb")
      .agg(
        sum(col("rr")).as("dot"),
        count(lit(1)).as("nu")
      )
      .filter(col("nu") >= MinSupport)
    pairs
      .join(
        broadcast(
          norms.withColumnRenamed("part", "pa").withColumnRenamed("nrm", "na")
        ),
        "pa"
      )
      .join(
        broadcast(
          norms.withColumnRenamed("part", "pb").withColumnRenamed("nrm", "nb")
        ),
        "pb"
      )
      .select(
        col("pa"),
        col("pb"),
        col("nu").as("n_users"),
        col("dot"),
        (round(
          col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
          6
        ) + 0.0).as("cosine")
      )
      .orderBy(desc("cosine"), col("pa"), col("pb"))
      .limit(TopK)
  }

  /** q258: top-k catalog churn — the Jaccard overlap of consecutive
    * months' top-20 revenue parts, the "how stable is our bestseller
    * list" number merchandising reads monthly (q224's RBO compares two
    * RANKINGS of one query; this tracks ONE ranking's membership drift
    * through time — high churn means the catalog mix, not just the
    * order, is moving).
    *
    * Determinism: monthly revenues are exact centi BIGINTs; each
    * month's top-20 ranks on (revenue, part) — a unique total order;
    * adjacency is by observed-month INDEX (no calendar arithmetic to
    * disagree on); Jaccard = c/(kₐ+k_b−c) is one division of exact
    * counts, round-4.
    *
    * Scale shape: one fact-table aggregate keyed (month, part); the
    * per-month top-20 ranks inside month PARTITIONS; everything after
    * is ≤20 rows × #months. One-row-per-adjacent-pair output.
    */
  private def q258(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables
      .table(s, dir, "lineitem")
      .groupBy(
        date_format(col("l_shipdate"), "yyyy-MM").as("m"),
        col("l_partkey").as("part")
      )
      .agg(sum(round(col("l_extendedprice") * 100.0, 0).cast("long")).as("rev"))
    val months = rev
      .select("m")
      .distinct()
      .withColumn("mi", row_number().over(Window.orderBy("m")))
    val top = rev
      .join(broadcast(months), "m")
      .withColumn(
        "rk",
        row_number().over(
          Window.partitionBy("mi").orderBy(desc("rev"), col("part"))
        )
      )
      .filter(col("rk") <= 20)
      .select("m", "mi", "part")
    val sizes = top.groupBy("m", "mi").agg(count(lit(1)).as("k"))
    val common = top
      .as("a")
      .join(
        top.as("b"),
        col("a.mi") + 1 === col("b.mi") && col("a.part") === col("b.part")
      )
      .groupBy(col("a.mi").as("mi"))
      .agg(count(lit(1)).as("c"))
    sizes
      .as("sa")
      .join(
        sizes.as("sb").select(
          (col("mi") - 1).as("mi"),
          col("m").as("m2"),
          col("k").as("kb")
        ),
        "mi"
      )
      .join(common, Seq("mi"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .select(
        col("m").as("m1"),
        col("m2"),
        col("k").as("n_top_a"),
        col("kb").as("n_top_b"),
        col("c").as("n_common"),
        (round(
          col("c").cast("double") / (col("k") + col("kb") - col("c")).cast("double"),
          4
        ) + 0.0).as("jaccard")
      )
      .orderBy("m1")
  }

  /** q261: ABC (Pareto) inventory classification — split the catalog
    * into A ("the vital few": parts covering the first 80% of revenue),
    * B (to 95%), and C ("the trivial many") — the warehouse-management
    * classic behind cycle-count frequency, stocking policy, and buyer
    * attention, and the merchandising complement of q258 (churn tracks
    * WHO is on top; ABC prices how concentrated the top is).
    *
    * Determinism: per-part revenues are exact centi BIGINTs; the
    * descending cumulative uses the q46b TWO-LEVEL cumulation (shard =
    * rc div 2²⁰; shard offsets from the bounded shard frame; the local
    * window PARTITIONED by shard — no corpus-sized global window);
    * class cuts compare cum·100 against T·80 / T·95 as exact integers
    * (the crossing part goes to the next class); shares are single
    * divisions round-4.
    *
    * Scale shape: one fact aggregate keyed by part; the shard-offset
    * frame is value-range-bounded; the final rollup is 3 rows.
    */
  private def q261(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables
      .table(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("part"))
      .agg(sum(round(col("l_extendedprice") * 100.0, 0).cast("long")).as("rc"))
      .withColumn("shard", expr("rc div 1048576"))
    val offsets = rev
      .groupBy("shard")
      .agg(sum(col("rc").cast("decimal(38,0)")).cast("long").as("shard_rc"))
      .withColumn(
        "shard_offset",
        coalesce(
          sum("shard_rc").over(
            Window
              .orderBy(col("shard").desc)
              .rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("shard", "shard_offset")
    val local = Window
      .partitionBy("shard")
      .orderBy(col("rc").desc, col("part"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val total = rev.agg(
      sum(col("rc").cast("decimal(38,0)")).cast("long").as("t")
    )
    rev
      .join(broadcast(offsets), "shard")
      .withColumn("cum", col("shard_offset") + sum("rc").over(local))
      .crossJoin(broadcast(total))
      .withColumn(
        "abc_class",
        when(col("cum") * 100 <= col("t") * 80, "A")
          .when(col("cum") * 100 <= col("t") * 95, "B")
          .otherwise("C")
      )
      .groupBy("abc_class")
      .agg(
        count(lit(1)).as("n_parts"),
        sum(col("rc").cast("decimal(38,0)")).cast("long").as("class_rc"),
        max("t").as("t")
      )
      .select(
        col("abc_class"),
        col("n_parts"),
        (round(col("class_rc").cast("double") / 100.0d, 2) + 0.0)
          .as("revenue"),
        (round(col("class_rc").cast("double") / col("t").cast("double"), 4)
          + 0.0).as("revenue_share")
      )
      .orderBy("abc_class")
  }

  /** Production swap-in for q242 on DENSIFYING catalogs: this corpus's
    * per-customer catalog stays ~40 parts at every SF (measured
    * 35.9/39.6/40.0 at sf0.001/0.01/0.1 — pair volume is LINEAR in
    * customers: 105k → 1.29M → 13.1M), but a corpus where customers
    * accumulate unbounded history turns C(k,2) quadratic. The standard
    * production move is to truncate each catalog to its top-[[maxK]]
    * parts by (rating, part) before pairing — recommendation quality
    * concentrates in the strong ratings, and the pair bound becomes
    * C(maxK,2)·customers by construction. Norms are computed over the
    * SAME capped matrix, so with maxK ≥ the corpus max catalog the
    * result is EXACTLY q242 (ItemCfCapSpec pins this).
    */
  def itemCfCapped(s: SparkSession, dir: String, maxK: Int): DataFrame = {
    val ratings = Tables
      .table(s, dir, "lineitem")
      .join(
        Tables.table(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey")
      )
      .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .agg(countDistinct(col("l_orderkey")).as("r"))
      .withColumn(
        "rk",
        row_number().over(
          Window.partitionBy("cust").orderBy(desc("r"), col("part"))
        )
      )
      .filter(col("rk") <= maxK)
      .drop("rk")
    val norms = ratings
      .groupBy("part")
      .agg(sum(col("r") * col("r")).as("nrm"))
    val catalogs = ratings
      .groupBy("cust")
      .agg(sort_array(collect_list(struct(col("part"), col("r")))).as("ps"))
    val pairs = catalogs
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "a")))
      .select(
        col("a"),
        explode(slice(col("ps"), col("i") + lit(2), size(col("ps")))).as("b")
      )
      .select(
        col("a.part").as("pa"),
        col("b.part").as("pb"),
        (col("a.r") * col("b.r")).as("rr")
      )
      .groupBy("pa", "pb")
      .agg(
        sum(col("rr")).as("dot"),
        count(lit(1)).as("nu")
      )
      .filter(col("nu") >= MinSupport)
    pairs
      .join(
        broadcast(
          norms.withColumnRenamed("part", "pa").withColumnRenamed("nrm", "na")
        ),
        "pa"
      )
      .join(
        broadcast(
          norms.withColumnRenamed("part", "pb").withColumnRenamed("nrm", "nb")
        ),
        "pb"
      )
      .select(
        col("pa"),
        col("pb"),
        col("nu").as("n_users"),
        col("dot"),
        (round(
          col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
          6
        ) + 0.0).as("cosine")
      )
      .orderBy(desc("cosine"), col("pa"), col("pb"))
      .limit(TopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q129_basket_rules" -> q129,
    "q232_basket_triples" -> q232,
    "q242_item_cf" -> q242,
    "q258_topk_churn" -> q258,
    "q261_abc_classes" -> q261
  )

  val oracleSql: Map[String, String] = Map(
    "q129_basket_rules" ->
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |ic AS (SELECT pk, CAST(count(*) AS BIGINT) AS cnt_item
         |       FROM items GROUP BY pk),
         |tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders
         |        FROM items),
         |pairs AS (
         |  SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS cnt_pair
         |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY a.pk, b.pk
         |  HAVING count(*) >= $MinSupport)
         |SELECT pa, pb, cnt_pair,
         |  ia.cnt_item AS cnt_a, ib.cnt_item AS cnt_b,
         |  round(cnt_pair / n_orders, 6) AS support,
         |  round(cnt_pair / ia.cnt_item, 6) AS confidence,
         |  round(cnt_pair * n_orders / (ia.cnt_item * ib.cnt_item), 6) AS lift
         |FROM pairs
         |JOIN ic ia ON ia.pk = pa
         |JOIN ic ib ON ib.pk = pb
         |CROSS JOIN tot
         |ORDER BY lift DESC, pa, pb LIMIT $TopK""".stripMargin,
    // naive a<b<c 3-way self-join replay of the map-side generators,
    // same exact cross-ratio lift
    "q232_basket_triples" ->
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |ic AS (SELECT pk, CAST(count(*) AS BIGINT) AS cnt_item
         |       FROM items GROUP BY pk),
         |tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders
         |        FROM items),
         |tr AS (
         |  SELECT a.pk AS pa, b.pk AS pb, c.pk AS pc,
         |         CAST(count(*) AS BIGINT) AS cnt_triple
         |  FROM items a
         |  JOIN items b ON a.ok = b.ok AND a.pk < b.pk
         |  JOIN items c ON a.ok = c.ok AND b.pk < c.pk
         |  GROUP BY 1, 2, 3
         |  HAVING count(*) >= $MinSupport)
         |SELECT pa, pb, pc, cnt_triple,
         |  round(cnt_triple / n_orders, 6) AS support,
         |  round(CAST(cnt_triple * n_orders * n_orders AS DOUBLE)
         |        / CAST(ia.cnt_item * ib.cnt_item * ic2.cnt_item AS DOUBLE), 6)
         |    AS lift
         |FROM tr
         |JOIN ic ia ON ia.pk = pa
         |JOIN ic ib ON ib.pk = pb
         |JOIN ic ic2 ON ic2.pk = pc
         |CROSS JOIN tot
         |ORDER BY lift DESC, pa, pb, pc LIMIT $TopK""".stripMargin,
    // naive per-customer self-join replay of the map-side catalog pair
    // generators, same exact BIGINT dot/norms, same single cosine dag
    "q242_item_cf" ->
      s"""WITH cp AS (
         |  SELECT o.o_custkey AS cust, l.l_partkey AS part,
         |         CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS r
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  GROUP BY 1, 2),
         |nrm AS (SELECT part, CAST(sum(r * r) AS BIGINT) AS nrm
         |        FROM cp GROUP BY part),
         |pp AS (
         |  SELECT a.part AS pa, b.part AS pb,
         |         CAST(sum(a.r * b.r) AS BIGINT) AS dot,
         |         CAST(count(*) AS BIGINT) AS n_users
         |  FROM cp a JOIN cp b ON a.cust = b.cust AND a.part < b.part
         |  GROUP BY 1, 2
         |  HAVING count(*) >= $MinSupport)
         |SELECT pa, pb, n_users, dot,
         |  round(CAST(dot AS DOUBLE)
         |        / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
         |        6) + 0.0 AS cosine
         |FROM pp
         |JOIN nrm na ON na.part = pa
         |JOIN nrm nb ON nb.part = pb
         |ORDER BY cosine DESC, pa, pb LIMIT $TopK""".stripMargin,
    // same exact monthly centi revenues, same (rev, part) top-20 total
    // order, same observed-month-index adjacency and exact Jaccard
    "q258_topk_churn" ->
      """WITH rev AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS m, l_partkey AS part,
        |    CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT))
        |         AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |months AS (
        |  SELECT m, CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS mi
        |  FROM (SELECT DISTINCT m FROM rev)),
        |top AS (
        |  SELECT m, mi, part FROM (
        |    SELECT rev.m, months.mi, part,
        |      row_number() OVER (PARTITION BY months.mi
        |                         ORDER BY rev DESC, part) AS rk
        |    FROM rev JOIN months ON months.m = rev.m)
        |  WHERE rk <= 20),
        |sizes AS (
        |  SELECT m, mi, CAST(count(*) AS BIGINT) AS k
        |  FROM top GROUP BY 1, 2),
        |com AS (
        |  SELECT a.mi AS mi, CAST(count(*) AS BIGINT) AS c
        |  FROM top a JOIN top b ON a.mi + 1 = b.mi AND a.part = b.part
        |  GROUP BY 1)
        |SELECT sa.m AS m1, sb.m AS m2,
        |  sa.k AS n_top_a, sb.k AS n_top_b,
        |  coalesce(com.c, 0) AS n_common,
        |  round(CAST(coalesce(com.c, 0) AS DOUBLE)
        |        / CAST(sa.k + sb.k - coalesce(com.c, 0) AS DOUBLE), 4) + 0.0
        |    AS jaccard
        |FROM sizes sa
        |JOIN sizes sb ON sb.mi = sa.mi + 1
        |LEFT JOIN com ON com.mi = sa.mi
        |ORDER BY m1""".stripMargin,
    // naive single descending cumsum replay of the two-level shard
    // cumulation, same exact cum·100 vs T·80/95 integer cuts
    "q261_abc_classes" ->
      """WITH rev AS (
        |  SELECT l_partkey AS part,
        |    CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT))
        |         AS BIGINT) AS rc
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(rc) AS BIGINT) AS t FROM rev),
        |cum AS (
        |  SELECT rc,
        |    CAST(sum(rc) OVER (ORDER BY rc DESC, part
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM rev),
        |cl AS (
        |  SELECT rc,
        |    CASE WHEN cum * 100 <= t * 80 THEN 'A'
        |         WHEN cum * 100 <= t * 95 THEN 'B'
        |         ELSE 'C' END AS abc_class, t
        |  FROM cum CROSS JOIN tot)
        |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
        |  round(CAST(sum(rc) AS DOUBLE) / 100.0, 2) + 0.0 AS revenue,
        |  round(CAST(sum(rc) AS DOUBLE) / CAST(max(t) AS DOUBLE), 4) + 0.0
        |    AS revenue_share
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
