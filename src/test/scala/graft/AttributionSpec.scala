package graft

import org.apache.spark.sql.functions._

/** Semantic pins for q116 linear attribution: per-channel credit must
  * match a naive per-purchase driver-side replay, total credit must be
  * conserved up to the documented per-purchase flooring loss, and the
  * strict-positivity precondition of the structural integer division
  * must hold on the corpus.
  */
class AttributionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val WindowUs = 7L * 86400L * 1000000L

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

  test("q116 equals the naive per-purchase replay and conserves credit") {
    val purchases = events.filter(_._3 == "purchase")
    // the div-parity precondition: all purchase values strictly positive
    assert(purchases.forall(_._5 >= 1), "centi values must be >= 1")

    val touches = events.filter(e => e._3 == "click" || e._3 == "view")
    val naive = scala.collection.mutable.Map[String, (Long, Long, Long)]()
      .withDefaultValue((0L, 0L, 0L))
    purchases.foreach { p =>
      val qual = touches.filter(t =>
        t._2 == p._2 && t._4 < p._4 && p._4 - t._4 <= WindowUs
      )
      if (qual.isEmpty) {
        val (np, nt, cr) = naive("(none)")
        naive("(none)") = (np + 1, nt, cr + p._5 * 1000000L)
      } else {
        val n = qual.length.toLong
        qual.groupBy(_._3).foreach { case (ch, ts) =>
          val (np, nt, cr) = naive(ch)
          naive(ch) =
            (np + 1, nt + ts.length, cr + p._5 * ts.length * 1000000L / n)
        }
      }
    }
    val out = SparkEntry
      .queries("q116_linear_attribution")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == naive.keySet ++ Set("(none)"))
    naive.foreach { case (ch, exp) =>
      assert(out(ch) == exp, s"channel $ch: ${out(ch)} vs $exp")
    }
    if (!naive.contains("(none)"))
      assert(out("(none)") == ((0L, 0L, 0L)))
    // conservation: attributed credit never exceeds the exact total and
    // loses < n_channels centi-micro units per attributed purchase
    val total = purchases.map(_._5 * 1000000L).sum
    val emitted = out.values.map(_._3).sum
    assert(emitted <= total)
    assert(total - emitted < purchases.length.toLong * 3L)
  }
}
