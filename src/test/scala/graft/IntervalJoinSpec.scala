package graft

import graft.queries.{IntervalJoin, Tables}
import org.apache.spark.sql.functions._

/** Interval overlap join (q82): the grid-bucketed path must equal the
  * naive inequality join exactly — including pairs that straddle cell
  * boundaries (matched in several cells, emitted once).
  */
class IntervalJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("grid-bucketed overlap join equals the naive inequality join") {
    val grid = SparkEntry
      .queries("q82_interval_join")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val ev = Tables
      .table(spark, sf, "events")
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) + floor(col("value") * 10000000L).cast("long"))
          .as("e_us")
      )
    val a = ev.filter(col("event_type") === "click")
    val b = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("b_id"),
        col("user_id").as("b_user"),
        col("s_us").as("b_s"),
        col("e_us").as("b_e")
      )
    val naive = a
      .join(
        b,
        col("user_id") === col("b_user") &&
          col("s_us") <= col("b_e") && col("b_s") <= col("e_us")
      )
      .select(
        col("event_id"),
        col("b_id"),
        col("user_id"),
        least(col("e_us"), col("b_e")) - greatest(col("s_us"), col("b_s"))
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(grid == naive, s"grid=${grid.size} naive=${naive.size}")
    assert(grid.nonEmpty, "no overlapping pairs in testdata — probe too narrow")
  }

  test("a pair spanning several grid cells is emitted exactly once") {
    import spark.implicits._
    // one user; a 3-hour click interval (value=1080 → 10800 s) overlaps
    // a purchase interval two cells later — the pair co-occurs in
    // multiple 1-hour cells and must still appear once
    val us = 1000000L
    val rows = Seq(
      (1L, "click", 0L, 1080.0),
      (2L, "purchase", 7200L, 100.0), // starts 2 h in, well inside click's span
      (3L, "purchase", 999999L, 1.0)  // far away: no overlap
    ).map { case (id, t, sec, v) => (id, t, sec * us, v) }
      .toDF("event_id", "event_type", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("user_id", lit(7L))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("iv_events")
    rows.write.parquet(s"$dir/events.parquet")

    val out = IntervalJoin
      .queries("q82_interval_join")(spark, dir)
      .collect()
    assert(out.length == 1, s"expected exactly one pair, got ${out.toSeq}")
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    // purchase spans value·10 = 1000 s: [7200, 8200] ∩ [0, 10800] = 1000 s
    assert(r.getLong(3) == 1000L * us, s"overlap ${r.getLong(3)}")
  }
}
