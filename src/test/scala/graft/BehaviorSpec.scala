package graft

import graft.queries.{Behavior, Graph}
import org.apache.spark.sql.functions._

/** Funnel (q78), cohort retention (q79), triangle count (q80): semantic
  * edge cases on crafted inputs plus structural invariants on the real
  * testdata.
  */
class BehaviorSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("funnel requires strict order: a click BEFORE the first view does not count") {
    import spark.implicits._
    val us = 1000000L // 1 s in µs
    val rows = Seq(
      // user 1: click at t=1, view at t=2, purchase at t=3
      //   → click precedes the first view, so depth stops at 1... but a
      //     LATER click would resume; none exists, purchase can't attach
      (1L, "click", 1 * us),
      (1L, "view", 2 * us),
      (1L, "purchase", 3 * us),
      // user 2: full ordered path inside 24 h
      (2L, "view", 1 * us),
      (2L, "click", 2 * us),
      (2L, "purchase", 3 * us),
      // user 3: full path but purchase lands past 24 h from the view
      (3L, "view", 1 * us),
      (3L, "click", 2 * us),
      (3L, "purchase", 1 * us + 86400000000L + us),
      // user 4: never views — not in the funnel at all
      (4L, "click", 1 * us),
      (4L, "purchase", 2 * us)
    ).toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("event_id", col("us"))
      .withColumn("value", lit(0.0))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("funnel_events")
    rows.write.parquet(s"$dir/events.parquet")

    val out = Behavior
      .queries("q78_funnel")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(4), r.getBoolean(5)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == (1, false), s"got ${out(1L)}")
    assert(out(2L) == (3, true))
    assert(out(3L) == (3, false))
  }

  test("funnel depths on testdata are monotone: step k+1 count <= step k count") {
    val df = Behavior.queries("q78_funnel")(spark, sf)
    val depths = df
      .groupBy("funnel_depth")
      .count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val atLeast = (1 to 3).map(k => (k, (k to 3).map(d => depths.getOrElse(d, 0L)).sum))
    atLeast.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(b <= a)
      case _                   =>
    }
    // every user with a view appears exactly once
    val views = graft.queries.Tables
      .table(spark, sf, "events")
      .filter(col("event_type") === "view")
      .select("user_id")
      .distinct()
      .count()
    assert(df.count() == views)
  }

  test("cohort retention: offset-0 row equals the cohort size and offsets are non-negative") {
    val df = Behavior.queries("q79_cohort_retention")(spark, sf).collect()
    assert(df.forall(_.getLong(1) >= 0), "negative week offset")
    // offset 0 exists for every cohort (the week of first activity)
    val cohorts = df.map(_.getLong(0)).distinct
    val zeroRows = df.filter(_.getLong(1) == 0L).map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cohorts.forall(zeroRows.contains))
    // retention never exceeds the cohort's own size
    df.foreach { r =>
      assert(r.getLong(2) <= zeroRows(r.getLong(0)))
    }
  }

  test("EWMA matches a per-user sequential fold within the truncation window") {
    import spark.implicits._
    val out = Behavior
      .queries("q83_ewma")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // replay one user's history sequentially in plain Scala
    val ev = graft.queries.Tables
      .table(spark, sf, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val user = ev.head._2
    val hist = ev.filter(_._2 == user).sortBy(t => (t._3, t._1))
    hist.zipWithIndex.foreach { case ((eid, _, _, _), i) =>
      val window = hist.slice(math.max(0, i - 19), i + 1).reverse
      val num = window.zipWithIndex.map { case ((_, _, _, v), k) => v * math.pow(0.8, k) }.sum
      val den = window.indices.map(k => math.pow(0.8, k)).sum
      val expected = num / den
      val got = out(eid)._3
      assert(
        math.abs(got - expected) < 1e-3,
        s"event $eid: ewma $got vs replay $expected"
      )
    }
    // smoothing: the EWMA series varies less than the raw series
    val raw = hist.map(_._4)
    val smooth = hist.map(t => out(t._1)._3)
    def sd(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.size)
    }
    assert(sd(smooth) < sd(raw), s"EWMA did not smooth: ${sd(smooth)} >= ${sd(raw)}")
  }

  test("sliding distinct decomposition: consecutive-day user counts once per window") {
    import spark.implicits._
    val dayUs = 86400000000L
    // user 1 active days 10, 11, 13; user 2 active day 11 only.
    // W=2 windows: day10 {u1}=1, day11 {u1,u2}=2, day13 {u1}=1 —
    // u1's day-11 activity must NOT double-count in window 11 (their
    // day-10 activity is already first-in-window)
    val rows = Seq(
      (1L, 1L, 10L), (2L, 1L, 11L), (3L, 1L, 13L), (4L, 2L, 11L)
    ).toDF("event_id", "user_id", "day")
      .withColumn("ts", timestamp_micros(col("day") * dayUs + 1000L))
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(0.0))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("sd_events")
    rows.write.parquet(s"$dir/events.parquet")
    val out = Behavior
      .queries("q85_sliding_distinct")(spark, dir)
      .collect()
      .map(r => r.getLong(1) -> r.getLong(2))
      .toMap
    assert(out == Map(10L -> 1L, 11L -> 2L, 13L -> 1L), s"got $out")
  }

  test("triangle count matches the closed form on a crafted graph") {
    import spark.implicits._
    // two orders: {1,2,3} (one triangle) and {3,4,5,6} (K4 = 4 triangles);
    // per-pair co-occurrence is 1 everywhere, so avg == 1 and the
    // `c > avg` support filter would drop EVERYTHING — add a repeated
    // order so shared pairs clear the bar... instead craft counts: repeat
    // both orders twice and add one weak pair {6,7} seen once.
    val items = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 3L), (11L, 4L), (11L, 5L), (11L, 6L),
      (12L, 1L), (12L, 2L), (12L, 3L),
      (13L, 3L), (13L, 4L), (13L, 5L), (13L, 6L),
      (14L, 6L), (14L, 7L)
    ).toDF("l_orderkey", "l_suppkey")
      .withColumn("l_partkey", lit(0L))
      .withColumn("l_linenumber", lit(1))
      .withColumn("l_quantity", lit(1.0))
      .withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0))
      .withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N"))
      .withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", lit("2024-01-01"))
    val dir = tmpDir("tri_lineitem")
    items.write.parquet(s"$dir/lineitem.parquet")

    val r = Graph.queries("q80_triangle_count")(spark, dir).head()
    // strong pairs (c=2): the triangle {1,2,3} and K4 {3,4,5,6};
    // the weak {6,7} pair (c=1 < avg) is pruned
    // → nodes {1..6}, edges 3 + 6 = 9, triangles 1 + 4 = 5
    assert(r.getLong(0) == 6, s"nodes ${r.getLong(0)}")
    assert(r.getLong(1) == 9, s"edges ${r.getLong(1)}")
    assert(r.getLong(2) == 5, s"triangles ${r.getLong(2)}")
  }

  test("triangle orientation bounds wedge work on a star graph (hub contributes no wedges)") {
    import spark.implicits._
    // star: hub 100 co-occurs with 1..8 (each pair twice so it survives
    // the support filter; spokes never co-occur except one weak
    // singleton pair that the filter prunes) → 0 triangles. Under the
    // degree orientation every edge points INTO the hub, so the wedge
    // frame is empty — the count being exactly 0 (not just no closing
    // edge) exercises that path
    val orders = (1L to 8L).flatMap { s =>
      Seq((200L + s, 100L), (200L + s, s), (300L + s, 100L), (300L + s, s))
    } :+ (400L, 1L) :+ (400L, 2L)
    val items = orders
      .toDF("l_orderkey", "l_suppkey")
      .withColumn("l_partkey", lit(0L))
      .withColumn("l_linenumber", lit(1))
      .withColumn("l_quantity", lit(1.0))
      .withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0))
      .withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N"))
      .withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", lit("2024-01-01"))
    val dir = tmpDir("tri_star")
    items.write.parquet(s"$dir/lineitem.parquet")
    val r = Graph.queries("q80_triangle_count")(spark, dir).head()
    assert(r.getLong(0) == 9 && r.getLong(1) == 8 && r.getLong(2) == 0,
      s"star graph: ${r.toSeq}")
  }

  test("DOULION sampled estimate lands within 5% of the exact triangle count (sf0.01)") {
    // the sample is a DETERMINISTIC hash keep (p = 1/5), so this is a
    // fixed number for fixed testdata, not a flaky random draw; DOULION's
    // relative error is O(1/√(p³·T)) ≈ 2.3% at T = 24,175 — the 5% bound
    // is ~2σ. sf0.001 is below the estimator's working regime (21 edges
    // survive the support threshold, the 1/5 sample keeps ~4) and is
    // deliberately not asserted.
    val dir = "/root/testdata/sf0.01"
    val exact = Graph.queries("q80_triangle_count")(spark, dir).head().getLong(2)
    val est = Graph
      .queries("q80b_triangle_sample")(spark, dir)
      .head()
      .getAs[Long]("est_triangles")
    assert(exact > 1000, s"support threshold degenerated: $exact triangles")
    val relErr = math.abs(est - exact).toDouble / exact
    assert(relErr < 0.05, s"DOULION est $est vs exact $exact: relErr $relErr")
  }

  test("q126 streaks match a naive per-user consecutive-day fold") {
    val out = SparkEntry
      .queries("q126_activity_streaks")(spark, sf)
      .collect()
      .map(r =>
        r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDate(4).toString))
      )
      .toMap
    val days = graft.queries.Tables
      .table(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1)
      .map { case (u, rows) => u -> rows.map(_._2).sortBy(_.toEpochDay) }
    assert(out.keySet == days.keySet)
    days.foreach { case (u, ds) =>
      // fold the sorted day list into maximal consecutive runs
      val runs = ds.foldLeft(List.empty[(java.time.LocalDate, Long)]) {
        case ((start, len) :: tail, d)
            if d.toEpochDay == start.toEpochDay + len =>
          (start, len + 1) :: tail
        case (acc, d) => (d, 1L) :: acc
      }.reverse
      val longest = runs.maxBy { case (s, l) => (l, -s.toEpochDay) }
      val (nDays, nStreaks, bestLen, bestStart) = out(u)
      assert(nDays == ds.length.toLong, s"user $u")
      assert(nStreaks == runs.length.toLong, s"user $u")
      assert(bestLen == longest._2, s"user $u")
      assert(bestStart == longest._1.toString, s"user $u tie-break")
    }
  }

  test("q128 growth accounting: states partition user-days, day-over-day ledger balances") {
    val rows = SparkEntry
      .queries("q128_growth_accounting")(spark, sf)
      .collect()
      .map(r =>
        r.getDate(0).toLocalDate ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      )
    val byDay = rows.toMap
    // naive replay from per-user day sets
    val userDays = graft.queries.Tables
      .table(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1)
      .map { case (u, v) => u -> v.map(_._2.toEpochDay).toSet }
    rows.foreach { case (d, (act, nw, ret, res, chu)) =>
      val e = d.toEpochDay
      val active = userDays.values.count(_.contains(e)).toLong
      assert(act == active, s"$d n_active")
      assert(nw == userDays.values.count(s => s.contains(e) && s.min == e), s"$d new")
      assert(ret == userDays.values.count(s => s.contains(e) && s.contains(e - 1)), s"$d retained")
      assert(
        res == userDays.values
          .count(s => s.contains(e) && !s.contains(e - 1) && s.min < e),
        s"$d resurrected"
      )
      assert(chu == userDays.values.count(s => s.contains(e - 1) && !s.contains(e)), s"$d churned")
      assert(act == nw + ret + res, s"$d state partition")
      // day-over-day ledger: active(d) = active(d-1) + new + res - churned
      val prevActive = byDay.get(d.minusDays(1)).map(_._1).getOrElse(0L)
      assert(act == prevActive + nw + res - chu, s"$d ledger")
    }
    assert(rows.nonEmpty)
  }
}
