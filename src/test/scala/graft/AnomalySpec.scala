package graft

import org.apache.spark.sql.functions._

/** Semantic pin for q113: the exact-integer seasonal z-scores must match
  * a naive driver-side per-cell mean/σ computation, and the emitted
  * frame must be the deterministic top-k of the |z| > 3 tail.
  */
class AnomalySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q113 z-scores match naive per-(type,hour) baselines; top-k ordered") {
    val out = SparkEntry
      .queries("q113_seasonal_anomaly")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty, "corpus should contain |z| > 3 seasonal anomalies")
    assert(out.forall { case (_, _, _, _, z) => math.abs(z) > 3.0 })
    // non-increasing |z| with event_id tie-break
    out.sliding(2).foreach {
      case Array((_, _, ia, _, za), (_, _, ib, _, zb)) =>
        assert(
          math.abs(za) > math.abs(zb) || (math.abs(za) == math.abs(zb) && ia < ib)
        )
      case _ =>
    }

    val cells = graft.queries.Tables
      .table(spark, sf, "events")
      .select(
        col("event_type"),
        hour(col("ts")).as("hr"),
        col("event_id"),
        round(col("value") * 100.0, 0).cast("long").as("vc")
      )
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
    val byCell = cells.groupBy(_._1)
    out.foreach { case (et, hr, eid, _, z) =>
      val xs = byCell((et, hr)).map(_._2)
      val n = xs.length.toDouble
      val s1 = xs.map(_._2).sum.toDouble
      val s2 = xs.map(v => v._2 * v._2).sum.toDouble
      val mu = s1 / n
      val sg = math.sqrt((s2 / n - mu * mu) * (n / (n - 1.0)))
      val vc = xs.find(_._1 == eid).get._2
      val naive = math.rint((vc - mu) / sg * 1e4) / 1e4
      assert(math.abs(z - naive) < 1e-9, s"$et/$hr/$eid: $z vs $naive")
    }
  }
}
