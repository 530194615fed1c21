package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q129_basket_rules" -> q129,
    "q232_basket_triples" -> q232
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
         |ORDER BY lift DESC, pa, pb, pc LIMIT $TopK""".stripMargin
  )
}
