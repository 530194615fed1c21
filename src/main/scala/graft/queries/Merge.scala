package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE / upsert semantics as a plan (q76) — the query-side twin of
  * `catalog.Maintenance.upsert` (the file-level partition rewrite).
  * Plain Spark has no `MERGE INTO` without a mutable-table format, so
  * the engine expresses the merge as the canonical full-outer
  * reconciliation: updates win over target rows with the same key, new
  * keys insert, everything else passes through — with a per-row `action`
  * tag so the oracle checks every branch of the CASE, not just the
  * surviving values.
  *
  * Scale shape: ONE full-outer shuffle join on the merge key. The update
  * batch is usually MBs against a TB-scale target — AQE broadcasts it
  * and the target side never shuffles (the same asymmetry
  * `Maintenance.upsert` exploits by rewriting only update-named
  * partitions). Deterministic derivation of both update and insert sets
  * from `orders` keeps the whole merge oracle-replayable.
  */
object Merge {

  private def q76(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(s, dir, "orders")
    def base = orders.select(
      col("o_orderkey"),
      col("o_orderpriority"),
      col("o_totalprice")
    )
    // corrections: +5% on every 13th key; late inserts: half-price
    // clones of every 97th key, re-keyed above the existing range.
    // Deliberately NOT rounded: these are per-row scalar products (no
    // aggregation order to absorb), so the raw IEEE double is the
    // bit-exact cross-engine value — round()'s HALF_UP-on-decimal-string
    // vs round-on-scaled-double semantics is the one step that DIVERGES
    // here (e.g. ×1.05 landing a half-ulp either side of a .xx5).
    val ups = base
      .filter(col("o_orderkey") % 13 === 0)
      .select(
        col("o_orderkey"),
        col("o_orderpriority"),
        (col("o_totalprice") * 1.05).as("o_totalprice")
      )
      .unionByName(
        base
          .filter(col("o_orderkey") % 97 === 0)
          .select(
            (col("o_orderkey") + 1000000).as("o_orderkey"),
            col("o_orderpriority"),
            (col("o_totalprice") / 2).as("o_totalprice")
          )
      )
    base
      .as("t")
      .join(ups.as("u"), Seq("o_orderkey"), "full_outer")
      .select(
        col("o_orderkey"),
        coalesce(col("u.o_orderpriority"), col("t.o_orderpriority"))
          .as("priority"),
        coalesce(col("u.o_totalprice"), col("t.o_totalprice"))
          .as("totalprice"),
        when(
          col("u.o_totalprice").isNotNull && col("t.o_totalprice").isNotNull,
          "update"
        ).when(col("u.o_totalprice").isNotNull, "insert")
          .otherwise("keep")
          .as("action")
      )
      // deterministic mixed sample: every touched row plus a slice of
      // untouched pass-through rows (the oracle must see all three
      // actions, not only the mutated keys)
      .filter(col("action") =!= "keep" || col("o_orderkey") % 7 === 0)
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q76_merge_upsert" -> q76
  )

  val oracleSql: Map[String, String] = Map(
    "q76_merge_upsert" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_orderpriority,
        |         o_totalprice * 1.05 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 13 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000, o_orderpriority,
        |         o_totalprice / 2
        |  FROM orders WHERE o_orderkey % 97 = 0),
        |merged AS (
        |  SELECT coalesce(u.o_orderkey, t.o_orderkey) AS o_orderkey,
        |         coalesce(u.o_orderpriority, t.o_orderpriority) AS priority,
        |         coalesce(u.o_totalprice, t.o_totalprice) AS totalprice,
        |         CASE WHEN u.o_totalprice IS NOT NULL
        |                   AND t.o_totalprice IS NOT NULL THEN 'update'
        |              WHEN u.o_totalprice IS NOT NULL THEN 'insert'
        |              ELSE 'keep' END AS action
        |  FROM orders t FULL JOIN upd u ON t.o_orderkey = u.o_orderkey)
        |SELECT o_orderkey, priority, totalprice, action
        |FROM merged
        |WHERE action <> 'keep' OR o_orderkey % 7 = 0
        |ORDER BY o_orderkey""".stripMargin
  )
}
