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
}
