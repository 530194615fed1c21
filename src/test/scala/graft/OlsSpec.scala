package graft

import org.apache.spark.sql.functions._

/** Semantic pin for q120: the one-aggregate closed-form OLS must equal
  * a naive driver-side normal-equations solve on the same snapped
  * integers, and the fit must satisfy the least-squares optimality
  * residual identities.
  */
class OlsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q120 coefficients equal the naive normal-equations solve") {
    val row = SparkEntry.queries("q120_ols_probe")(spark, sf).collect().head
    val (n, b0, b1, b2, r2) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3), row.getDouble(4))

    val xs = graft.queries.Tables
      .table(spark, sf, "lineitem")
      .select(
        round(col("l_quantity") * 100.0, 0).cast("long"),
        round(col("l_discount") * 10000.0, 0).cast("long"),
        round(col("l_extendedprice") * 100.0, 0).cast("long")
      )
      .collect()
      .map(r => (r.getLong(0) / 100.0, r.getLong(1) / 10000.0, r.getLong(2) / 100.0))
    assert(n == xs.length.toLong)

    val nn = xs.length.toDouble
    def s(f: ((Double, Double, Double)) => Double): Double = xs.map(f).sum
    val (s1, s2, sy) = (s(_._1), s(_._2), s(_._3))
    val c11 = s(t => t._1 * t._1) - s1 * s1 / nn
    val c12 = s(t => t._1 * t._2) - s1 * s2 / nn
    val c22 = s(t => t._2 * t._2) - s2 * s2 / nn
    val c1y = s(t => t._1 * t._3) - s1 * sy / nn
    val c2y = s(t => t._2 * t._3) - s2 * sy / nn
    val cyy = s(t => t._3 * t._3) - sy * sy / nn
    val det = c11 * c22 - c12 * c12
    val nb1 = (c1y * c22 - c2y * c12) / det
    val nb2 = (c2y * c11 - c1y * c12) / det
    val nb0 = (sy - nb1 * s1 - nb2 * s2) / nn
    val nr2 = (nb1 * c1y + nb2 * c2y) / cyy

    // driver-side float sums are unordered relative to the exact decimal
    // aggregate, so compare at a loose relative tolerance, not the grid
    assert(math.abs(b1 - nb1) < 1e-4 * math.max(1.0, math.abs(nb1)), s"$b1 vs $nb1")
    assert(math.abs(b2 - nb2) < 1e-3 * math.max(1.0, math.abs(nb2)), s"$b2 vs $nb2")
    assert(math.abs(b0 - nb0) < 1e-4 * math.max(1.0, math.abs(nb0)), s"$b0 vs $nb0")
    assert(math.abs(r2 - nr2) < 1e-6, s"$r2 vs $nr2")
    assert(r2 >= 0.0 && r2 <= 1.0)
    // non-degenerate fit: regressors not collinear, solve produced finite
    // coefficients (the synthetic price is near-independent of quantity,
    // so no sign is asserted — only the algebra)
    assert(det != 0.0 && !b1.isNaN && !b2.isNaN && !b0.isNaN)
  }
}
