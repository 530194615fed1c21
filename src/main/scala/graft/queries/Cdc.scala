package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q84: CDC apply — reduce an ordered change log (INSERT / UPDATE /
  * DELETE with a sequence number) to final table state. The batch half
  * of change-data-capture ingestion: replaying a Debezium-style feed
  * into a snapshot, the operation `MERGE`-capable formats run on every
  * sync.
  *
  * Scale shape: ONE hash aggregate — `max_by(payload-struct, seq)` per
  * key picks the latest change, then a filter drops keys whose last op
  * is DELETE. No window over the log (a PARTITION BY key window would
  * sort every key's history; max_by is a map-side-combinable aggregate,
  * so a hot key's churn collapses to one row per map task before the
  * shuffle — the same asymmetry SkewSpec pins for aggregations vs
  * joins). Sequence numbers are unique per key by construction (CDC
  * feeds guarantee per-key ordering), so the pick is deterministic.
  *
  * The log derives from `orders` in four deterministic waves: full
  * insert, +10 price update (every 5th key), delete (every 11th),
  * half-price re-insert (every 33rd — exercising delete-then-reinsert:
  * the later seq must win and the key must SURVIVE).
  */
object Cdc {

  private def q84(s: SparkSession, dir: String): DataFrame =
    applyLog(changeLog(s, dir))
      // deterministic sample of survivors: every touched key plus a
      // slice of insert-only pass-through
      .filter(col("last_seq") > 1 || col("k") % 7 === 0)
      .select(col("k"), col("last_op"), col("price"), col("last_seq"))
      .orderBy("k")

  /** CDC apply over ANY (k, op, payload, seq) change log: one hash
    * aggregate (max_by per key), delete-filtered. Shared by q84 and the
    * CdcBench 10×/100× hot-key stress, so the stressed plan IS the
    * gated plan.
    */
  def applyLog(log: DataFrame): DataFrame =
    log
      .groupBy("k")
      .agg(
        expr("max_by(op, seq)").as("last_op"),
        expr("max_by(payload, seq)").as("price"),
        max("seq").as("last_seq")
      )
      .filter(col("last_op") =!= "D")

  /** SCD2 version frame over ANY change log: the key-partitioned window
    * (lead + row_number + per-key count share ONE per-key sort). Shared
    * by q84b/q84c and CdcBench.
    */
  def scd2Versions(log: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("seq")
    log
      .withColumn("valid_to", lead(col("seq"), 1).over(w))
      .filter(col("op") =!= "D")
      .withColumn("version", row_number().over(w))
      .withColumn("n_versions", count(lit(1)).over(Window.partitionBy("k")))
  }

  /** Point-in-time lookup of `facts` (k, t) against an SCD2 version
    * frame: EQUI join on k with the interval condition riding along as
    * a join filter. Shared by q84c and CdcBench.
    */
  def pitLookup(facts: DataFrame, versions: DataFrame): DataFrame =
    facts
      .join(
        versions,
        facts("k") === versions("k") &&
          col("t") >= col("valid_from") &&
          (col("valid_to").isNull || col("t") < col("valid_to")),
        "left"
      )
      .select(
        facts("k"),
        col("t"),
        col("price"),
        col("valid_from"),
        col("price").isNotNull.as("matched")
      )

  /** Shared deterministic change log (the q84 four-wave derivation). */
  private def changeLog(s: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .table(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
    o.select(col("k"), lit("I").as("op"), col("p").as("payload"), lit(1L).as("seq"))
      .unionByName(
        o.filter(col("k") % 5 === 0)
          .select(col("k"), lit("U").as("op"), (col("p") + 10.0).as("payload"), lit(2L).as("seq"))
      )
      .unionByName(
        o.filter(col("k") % 11 === 0)
          .select(col("k"), lit("D").as("op"), lit(null).cast("double").as("payload"), lit(3L).as("seq"))
      )
      .unionByName(
        o.filter(col("k") % 33 === 0)
          .select(col("k"), lit("I").as("op"), (col("p") / 2).as("payload"), lit(4L).as("seq"))
      )
  }

  /** q84b: SCD Type-2 history build — the OTHER half of CDC ingestion:
    * where q84 reduces the log to current state, this materializes the
    * full slowly-changing-dimension history: one row per (key, version)
    * with [valid_from, valid_to) sequence bounds, DELETE closing the
    * open version without emitting a row of its own (the reinserted
    * key's next version reopens), and `is_current` marking versions no
    * later change closed.
    *
    * Scale shape: unlike q84 (where max_by beats a window because only
    * the LAST change matters), history construction inherently needs
    * each key's change order — so the canonical plan IS the key-
    * partitioned window, and all three frames (lead, version numbering,
    * per-key count) share ONE sort over the per-key histories, which
    * CDC feeds keep short by nature. No global window, no self-join of
    * the log against itself (the naive interval spelling).
    */
  private def q84b(s: SparkSession, dir: String): DataFrame = {
    scd2Versions(changeLog(s, dir))
      .filter(col("n_versions") > 1 || col("k") % 7 === 0)
      .select(
        col("k"),
        col("version"),
        col("op"),
        col("payload").as("price"),
        col("seq").as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current")
      )
      .orderBy("k", "version")
  }

  /** q84c: point-in-time (as-of) lookup against the SCD2 history — the
    * consumption side of q84b: each fact row carries an event sequence
    * and must see the dimension version that was valid THEN
    * (valid_from ≤ t < valid_to), the bitemporal-correctness join that
    * prevents training/reporting on future attribute values. Facts
    * whose instant falls in a deleted gap (or before the first version)
    * match nothing and are kept with NULL attributes — the honest
    * outcome a LEFT join surfaces and an inner join would silently drop.
    *
    * Scale shape: the join is EQUI on the key (Catalyst hashes on k;
    * the interval condition rides along as a join filter), so unlike a
    * pure range join there is no candidate blowup — each fact meets
    * only its own key's ≤4 versions. No window, no per-fact sort; the
    * version frame is history-sized, facts stream through.
    *
    * The fact instant derives deterministically from the key
    * (t = 1 + k % 4 — covering every regime: initial version, updated
    * version, deleted gap, reinserted version).
    */
  private def q84c(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("seq")
    val versions = changeLog(s, dir)
      .withColumn("valid_to", lead(col("seq"), 1).over(w))
      .filter(col("op") =!= "D")
      .select(col("k"), col("payload").as("price"), col("seq").as("valid_from"), col("valid_to"))
    val facts = Tables
      .table(s, dir, "orders")
      .select(col("o_orderkey").as("k"))
      .withColumn("t", lit(1L) + col("k") % 4)
    pitLookup(facts, versions).orderBy(col("k"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q84_cdc_apply" -> q84,
    "q84b_scd2_history" -> q84b,
    "q84c_pit_lookup" -> q84c
  )

  val oracleSql: Map[String, String] = Map(
    "q84_cdc_apply" ->
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
        |log AS (
        |  SELECT k, 'I' AS op, p AS payload, 1 AS seq FROM o
        |  UNION ALL
        |  SELECT k, 'U', p + 10.0, 2 FROM o WHERE k % 5 = 0
        |  UNION ALL
        |  SELECT k, 'D', NULL, 3 FROM o WHERE k % 11 = 0
        |  UNION ALL
        |  SELECT k, 'I', p / 2, 4 FROM o WHERE k % 33 = 0),
        |state AS (
        |  SELECT k,
        |         arg_max(op, seq) AS last_op,
        |         arg_max(payload, seq) AS price,
        |         max(seq) AS last_seq
        |  FROM log GROUP BY k)
        |SELECT k, last_op, price, CAST(last_seq AS BIGINT) AS last_seq
        |FROM state
        |WHERE last_op <> 'D' AND (last_seq > 1 OR k % 7 = 0)
        |ORDER BY k""".stripMargin,
    "q84b_scd2_history" ->
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
        |log AS (
        |  SELECT k, 'I' AS op, p AS payload, CAST(1 AS BIGINT) AS seq FROM o
        |  UNION ALL
        |  SELECT k, 'U', p + 10.0, 2 FROM o WHERE k % 5 = 0
        |  UNION ALL
        |  SELECT k, 'D', NULL, 3 FROM o WHERE k % 11 = 0
        |  UNION ALL
        |  SELECT k, 'I', p / 2, 4 FROM o WHERE k % 33 = 0),
        |v AS (
        |  SELECT k, op, payload, seq,
        |    lead(seq) OVER (PARTITION BY k ORDER BY seq) AS valid_to
        |  FROM log),
        |nd AS (
        |  SELECT k, op, payload AS price, seq AS valid_from, valid_to,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY seq) AS INT)
        |      AS version,
        |    count(*) OVER (PARTITION BY k) AS n_versions
        |  FROM v WHERE op <> 'D')
        |SELECT k, version, op, price, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM nd WHERE n_versions > 1 OR k % 7 = 0
        |ORDER BY k, version""".stripMargin,
    "q84c_pit_lookup" ->
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
        |log AS (
        |  SELECT k, 'I' AS op, p AS payload, CAST(1 AS BIGINT) AS seq FROM o
        |  UNION ALL
        |  SELECT k, 'U', p + 10.0, 2 FROM o WHERE k % 5 = 0
        |  UNION ALL
        |  SELECT k, 'D', NULL, 3 FROM o WHERE k % 11 = 0
        |  UNION ALL
        |  SELECT k, 'I', p / 2, 4 FROM o WHERE k % 33 = 0),
        |v AS (
        |  SELECT k, op, payload, seq,
        |    lead(seq) OVER (PARTITION BY k ORDER BY seq) AS valid_to
        |  FROM log),
        |versions AS (
        |  SELECT k, payload AS price, seq AS valid_from, valid_to
        |  FROM v WHERE op <> 'D'),
        |facts AS (
        |  SELECT o_orderkey AS k, CAST(1 + o_orderkey % 4 AS BIGINT) AS t
        |  FROM orders)
        |SELECT f.k, f.t, ver.price, ver.valid_from,
        |  ver.price IS NOT NULL AS matched
        |FROM facts f LEFT JOIN versions ver
        |  ON ver.k = f.k AND f.t >= ver.valid_from
        |     AND (ver.valid_to IS NULL OR f.t < ver.valid_to)
        |ORDER BY f.k""".stripMargin
  )
}
