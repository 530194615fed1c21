package graft

/** q68 MAD outliers: full plain-Scala replay — interpolated medians (the
  * Spark `percentile` weighted formula), MAD, and the 3-robust-σ flag —
  * compared exactly on flagged ids.
  */
class OutliersSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // Spark's exact percentile: v(l)·(u−pos) + v(u)·(pos−l) at pos=(n−1)·p
  private def median(xs: Seq[Double]): Double = {
    val v = xs.sorted
    val pos = (v.size - 1) * 0.5
    val l = pos.toInt
    val u = math.ceil(pos).toInt
    if (l == u) v(l) else v(l) * (u - pos) + v(u) * (pos - l)
  }

  test("q68 flags replay exactly in plain Scala") {
    val ev = graft.queries.Tables
      .table(spark, sf, "events")
      .select("event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

    val expected = ev
      .groupBy(_._2)
      .toSeq
      .flatMap { case (_, rows) =>
        val med = median(rows.map(_._3).toSeq)
        val mad = median(rows.map(r => math.abs(r._3 - med)).toSeq)
        rows.filter(r => math.abs(r._3 - med) > 4.4478 * mad).map(_._1).toSeq
      }
      .toSet

    val got = SparkEntry
      .queries("q68_outlier_mad")(spark, sf)
      .select("event_id", "robust_z")
      .collect()
      .map(r =>
        (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))
      )

    assert(got.map(_._1).toSet == expected)
    assert(got.nonEmpty, "no outliers flagged — threshold vacuous?")
    // every flagged z is beyond the 3-robust-σ threshold it was cut at
    // (null z = degenerate mad-0 group, flagged but unscorable)
    assert(got.forall(_._2.forall(z => math.abs(z) > 2.999)))
  }
}
