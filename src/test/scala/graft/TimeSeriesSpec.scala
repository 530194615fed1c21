package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the time-series family (queries/TimeSeries): TWAP
  * and OHLC/VWAP must match a naive driver-side replay from the raw
  * events, and the candle invariants (low ≤ open/close ≤ high) must
  * hold structurally.
  */
class TimeSeriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val events: Array[(Long, Long, String, Long, Long)] =
    graft.queries.Tables
      .table(spark, sf, "events")
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100.0, 0).cast("long").as("vc")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))

  test("q119 TWAP equals the naive per-user zero-order-hold replay") {
    val out = SparkEntry
      .queries("q119_twap")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val byUser = events.groupBy(_._2)
    assert(out.nonEmpty && out.size == byUser.count(_._2.length >= 2))
    byUser.filter(_._2.length >= 2).foreach { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._4, e._1)) // (us, event_id)
      val pairs = ordered.zip(ordered.tail)
      val totDur = pairs.map { case (a, b) => b._4 - a._4 }.sum
      val swx = pairs.map { case (a, b) => a._5 * (b._4 - a._4) }.sum
      val naive = math.rint(swx.toDouble / (totDur.toDouble * 100.0) * 1e6) / 1e6
      val (n, dur, twap) = out(uid)
      assert(n == pairs.length && dur == totDur, s"user $uid")
      assert(math.abs(twap - naive) < 1e-9, s"user $uid: $twap vs $naive")
      // durations are non-negative by construction of the sort
      assert(pairs.forall { case (a, b) => b._4 >= a._4 })
    }
  }

  test("q119b OHLC invariants hold and open/close match the naive first/last") {
    val out = SparkEntry
      .queries("q119b_ohlc_vwap")(spark, sf)
      .collect()
      .map(r =>
        (r.getString(0), r.getDate(1).toString) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      )
      .toMap
    assert(out.nonEmpty)
    val withDay = events.map { e =>
      val day = java.time.Instant
        .ofEpochSecond(Math.floorDiv(e._4, 1000000L))
        .atZone(java.time.ZoneOffset.UTC)
        .toLocalDate
        .toString
      ((e._3, day), e)
    }
    withDay.groupBy(_._1).foreach { case (key, grp) =>
      val evs = grp.map(_._2).sortBy(e => (e._4, e._1))
      val (n, open, high, low, close) = out(key)
      assert(n == evs.length, s"$key")
      assert(open == evs.head._5 / 100.0 && close == evs.last._5 / 100.0, s"$key")
      assert(high == evs.map(_._5).max / 100.0 && low == evs.map(_._5).min / 100.0)
      assert(low <= open && open <= high && low <= close && close <= high)
    }
  }

  test("q155 rolling median equals a naive 7-day trailing-window replay") {
    val rows = SparkEntry
      .queries("q155_rolling_median")(spark, sf)
      .collect()
      .map(r =>
        (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getDouble(4))
      )
    assert(rows.nonEmpty)
    def rnd4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    rows.groupBy(_._1).foreach { case (tpe, grp) =>
      val ordered = grp.sortBy(_._2)
      ordered.zipWithIndex.foreach { case ((_, d, _, nWin, med), i) =>
        val win = ordered.slice(math.max(0, i - 6), i + 1).map(_._3.toDouble).sorted
        assert(nWin == win.length.toLong, s"$tpe $d n_in_win")
        // continuous median: midpoint of the two middle values when even
        val naive =
          if (win.length % 2 == 1) win(win.length / 2)
          else (win(win.length / 2 - 1) + win(win.length / 2)) / 2.0
        assert(med == rnd4(naive / 100.0), s"$tpe $d: $med vs ${rnd4(naive / 100.0)}")
      }
    }
  }
}
