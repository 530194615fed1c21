package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q147: 2-D skyline (Pareto frontier) — "the cheapest part at every
  * size class no other part beats on both axes": a part is on the
  * frontier iff no other part has ≤ its price AND ≥ its size with at
  * least one strict. The textbook spelling is a dominance ANTI-join —
  * O(N²) pairs, the q29 trap. This implementation is the MONOTONE
  * SWEEP: sort one dimension, a point survives iff its size (a) is the
  * max among its exact price tie-group and (b) strictly exceeds the
  * running max size over all strictly-cheaper prices. Both conditions
  * come from ONE distinct-price aggregate plus the q111 two-level
  * cumulation (global window only over ≤ price-range/256 shard
  * subtotals, partitioned running max within shards) — zero pairwise
  * comparisons at any scale.
  *
  * Determinism: prices snap to centi ints; every comparison is integer;
  * equal (price, size) duplicates are mutually non-dominating and BOTH
  * survive (the NOT-EXISTS oracle agrees by construction).
  *
  * Scale shape: one hash aggregate corpus → distinct-price frame; the
  * sweep runs on that frame; survivors rejoin the corpus on the price
  * equi-key. At 100 TB the distinct-price frame is domain-bounded
  * (price grid), the rejoin is an ordinary shuffled equi-join, and the
  * allowlisted global window touches only shard subtotals.
  */
object Skyline {

  private def q147(s: SparkSession, dir: String): DataFrame = {
    val p = Tables
      .table(s, dir, "part")
      .select(
        col("p_partkey"),
        round(col("p_retailprice") * 100.0, 0).cast("long").as("pc"),
        col("p_size")
      )
    val perPrice = p
      .groupBy("pc")
      .agg(max(col("p_size").cast("long")).as("sz_eq"))
      // structural floor division on any sign (the q111 convention)
      .withColumn("shard", expr("(pc - pmod(pc, 256)) div 256"))
    val offsets = perPrice
      .groupBy("shard")
      .agg(max("sz_eq").as("sm"))
      .withColumn(
        "off",
        max("sm").over(
          Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
        )
      )
      .select("shard", "off")
    val local = Window
      .partitionBy("shard")
      .orderBy("pc")
      .rowsBetween(Window.unboundedPreceding, -1)
    // running max size over STRICTLY cheaper prices; -1 = empty (sizes
    // are ≥ 1, so the sentinel never masks a real dominator)
    val cum = perPrice
      .join(broadcast(offsets), "shard")
      .withColumn(
        "run_lt",
        greatest(
          coalesce(max("sz_eq").over(local), lit(-1L)),
          coalesce(col("off"), lit(-1L))
        )
      )
      .select("pc", "sz_eq", "run_lt")
    p.join(cum, "pc")
      .filter(
        col("p_size").cast("long") === col("sz_eq")
          && col("p_size").cast("long") > col("run_lt")
      )
      .select(col("p_partkey"), col("pc").as("price_centi"), col("p_size"))
      .orderBy("price_centi", "p_partkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q147_skyline" -> q147
  )

  // The oracle is the INDEPENDENT quadratic spelling — dominance as
  // NOT EXISTS — so a sweep bug cannot self-confirm.
  val oracleSql: Map[String, String] = Map(
    "q147_skyline" ->
      """WITH p AS (
        |  SELECT p_partkey,
        |         CAST(round(p_retailprice * 100, 0) AS BIGINT) AS pc,
        |         p_size
        |  FROM part)
        |SELECT p_partkey, pc AS price_centi, p_size
        |FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.pc <= a.pc AND b.p_size >= a.p_size
        |    AND (b.pc < a.pc OR b.p_size > a.p_size))
        |ORDER BY price_centi, p_partkey""".stripMargin
  )
}
