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
  * Scale shape: the basket self-join explodes C(k,2) pairs per order —
  * bounded by basket size k (single digits in any order system), never
  * by corpus size, so the pair stream is a constant factor of the fact
  * table and partitions by order key. Counting pairs is one hash
  * aggregate; the per-item counts and the order total are
  * dimension-sized broadcasts. Everything after the pair count
  * operates on the (minSupport-thresholded) distinct-pair frame. A
  * hot ITEM does not explode: pairs form only within an order.
  *
  * Determinism: support/confidence/lift are single divisions of exact
  * BIGINT counts, gridded round-6; ordering by (lift, pair keys) is
  * unambiguous because the key pair is unique.
  */
object Basket {

  private val MinSupport = 2 // pair must co-occur in >= 2 orders
  private val TopK = 20

  private def q129(s: SparkSession, dir: String): DataFrame = {
    val items = Tables
      .table(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val itemCounts = items.groupBy("pk").agg(count(lit(1)).as("cnt_item"))
    val totals = items.agg(countDistinct(col("ok")).as("n_orders"))
    val a = items.select(col("ok"), col("pk").as("pa"))
    val b = items.select(col("ok"), col("pk").as("pb"))
    val pairs = a
      .join(b, Seq("ok"))
      .filter(col("pa") < col("pb"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q129_basket_rules" -> q129
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
         |ORDER BY lift DESC, pa, pb LIMIT $TopK""".stripMargin
  )
}
