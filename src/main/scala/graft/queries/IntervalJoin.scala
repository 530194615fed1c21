package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q82: interval OVERLAP join — find all (a, b) pairs whose time
  * intervals intersect. Unlike q10/q44 (a POINT probed into ranges,
  * which always carries an equi key or a broadcastable side), interval×
  * interval overlap has NO natural equi key: the naive spelling is a
  * cartesian product with an inequality filter, the join shape engines
  * degenerate on. This is the temporal-join / genomics (chromosome
  * ranges) / ad-attribution shape.
  *
  * Scale path — grid bucketing (the standard decomposition): quantize
  * time into fixed cells, EXPLODE each interval into the cells it
  * touches (bounded: ⌈len/cell⌉+1 per interval, ≤ 2 here since spans ≪
  * cell), equi-join on the cell id, verify exact overlap on the
  * candidates, and de-duplicate pairs that co-occur in several cells
  * with a groupBy on the pair key. Work is Σ per-cell |A_cell|·|B_cell|
  * — candidates-by-construction, never |A|·|B| (q27's banding argument
  * with time cells as buckets). A hot cell is an AQE-splittable
  * aggregate/join key, and the cell width is the knob that trades
  * explode factor against cell density.
  *
  * Intervals derive deterministically from events ([ts, ts + value·10 s]
  * — click intervals vs purchase intervals for the same user), all
  * arithmetic in exact integer µs; the overlap length is
  * min(ends) − max(starts) in BIGINT, so the oracle (the naive
  * inequality join — DuckDB handles the small SF fine) must match
  * bit-for-bit.
  */
object IntervalJoin {

  private val CellUs = 3600L * 1000000L // 1-hour grid cells

  private def intervals(s: SparkSession, dir: String, kind: String): DataFrame =
    Tables
      .table(s, dir, "events")
      .filter(col("event_type") === kind)
      // floor() before the long cast: Spark's double→long cast truncates
      // while DuckDB's rounds — floor agrees bit-for-bit on both (the
      // q20b lesson); values are non-negative by data contract
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) +
          floor(col("value") * 10000000L).cast("long")).as("e_us")
      )

  private def q82(s: SparkSession, dir: String): DataFrame = {
    def cells(df: DataFrame, p: String): DataFrame =
      df.select(
        col("event_id").as(s"${p}_id"),
        col("user_id").as(s"${p}_user"),
        col("s_us").as(s"${p}_s"),
        col("e_us").as(s"${p}_e"),
        // `div`, not `/`: Column./ is double division; the cell id must
        // be exact integer floor-division
        explode(
          expr(s"sequence(s_us div $CellUs, e_us div $CellUs)")
        ).as("cell")
      )
    val a = cells(intervals(s, dir, "click"), "a")
    val b = cells(intervals(s, dir, "purchase"), "b")
    // the user equality is pushed into the join CONDITION by Catalyst
    // (PushPredicateThroughJoin), so the physical hash-join key is
    // (cell, user) — a hot hour never pairs across users
    a.join(b, Seq("cell"))
      .filter(
        col("a_user") === col("b_user") &&
          col("a_s") <= col("b_e") && col("b_s") <= col("a_e")
      )
      // a pair spanning a cell boundary matches in every shared cell —
      // collapse to one row per pair (groupBy, not dropDuplicates, so
      // the plan is an AQE-splittable hash aggregate)
      .groupBy("a_id", "b_id")
      .agg(
        first(col("a_user")).as("user_id"),
        (least(first(col("a_e")), first(col("b_e"))) -
          greatest(first(col("a_s")), first(col("b_s")))).as("overlap_us")
      )
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_interval_join" -> q82
  )

  val oracleSql: Map[String, String] = Map(
    "q82_interval_join" ->
      """WITH iv AS (
        |  SELECT event_id, user_id, event_type,
        |         epoch_us(ts) AS s_us,
        |         epoch_us(ts) + CAST(floor(value * 10000000) AS BIGINT) AS e_us
        |  FROM events),
        |a AS (SELECT * FROM iv WHERE event_type = 'click'),
        |b AS (SELECT * FROM iv WHERE event_type = 'purchase')
        |SELECT a.event_id AS a_id, b.event_id AS b_id,
        |       a.user_id AS user_id,
        |       least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS overlap_us
        |FROM a JOIN b ON a.user_id = b.user_id
        |              AND a.s_us <= b.e_us AND b.s_us <= a.e_us
        |ORDER BY a_id, b_id""".stripMargin
  )
}
