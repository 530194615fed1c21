package graft

import org.apache.spark.sql.functions._

/** The random-projection JL property on this corpus: a ±1 sign matrix
  * preserves squared norms in expectation, E[‖Px‖²] = OutDim·‖x‖².
  */
class EmbeddingsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q54b projection preserves norm energy in expectation (ratio ~ 1)") {
    val proj = SparkEntry.queries("q54b_random_projection")(spark, sf)
    val pn = proj
      .groupBy("vec_id")
      .agg(sum(col("proj") * col("proj")).as("pn2"))
    val xn = graft.queries.Tables
      .table(spark, sf, "embeddings")
      .select(
        col("vec_id"),
        aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0),
          (a, x) => a + x
        ).as("xn2")
      )
    val ratio = pn
      .join(xn, "vec_id")
      .agg(avg(col("pn2") / (col("xn2") * 16)).as("r"))
      .collect()(0)
      .getDouble(0)
    // measured 1.032 at sf0.01; the band allows corpus drift, not a
    // broken matrix (a sign bug collapses the ratio toward 0 or blows
    // past 2 via correlated columns)
    assert(ratio > 0.7 && ratio < 1.3, s"energy ratio $ratio out of band")
  }

  test("q157 int8 quantization equals a naive per-dim replay; codes stay in [0,255]") {
    val rows = SparkEntry
      .queries("q157_int8_quantization")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    val vecs = graft.queries.Tables
      .table(spark, sf, "embeddings")
      .select("embedding")
      .collect()
      .map(_.getSeq[Float](0).toArray)
    assert(rows.size == vecs.head.length)
    (0 until vecs.head.length).foreach { d =>
      val vi = vecs.map(v => math.floor(v(d).toDouble * 1000000.0).toLong)
      val (n, mn, mx, sse, rmse) = rows(d + 1L)
      assert(n == vi.length && mn == vi.min && mx == vi.max)
      val range = mx - mn
      var naiveSse = 0L
      vi.foreach { x =>
        val q =
          if (range == 0L) 0L
          else Math.floorDiv(2 * 255 * (x - mn) + range, 2 * range)
        assert(q >= 0 && q <= 255, s"dim ${d + 1}: code $q escaped int8")
        val err = 255 * (x - mn) - q * range
        // nearest-code property: |err| is at most half the step
        assert(math.abs(err) * 2 <= range || range == 0L)
        naiveSse += err * err
      }
      assert(sse == naiveSse, s"dim ${d + 1}: sse $sse vs naive $naiveSse")
      val naiveRmse = BigDecimal(math.sqrt(sse.toDouble / n) / 255.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0
      assert(rmse == naiveRmse)
    }
  }
}
