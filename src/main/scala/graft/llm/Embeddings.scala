package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q54: per-label embedding centroids — the cluster-summary step behind
  * IVF coarse quantizers, semantic dedup buckets, and domain-mixing
  * diagnostics: elementwise mean vector per label.
  *
  * Shape at scale: posexplode multiplies rows ×dim, but partial
  * aggregation collapses them map-side — the shuffle carries only
  * (#labels × dim) partial (sum, count) states PER PARTITION, never the
  * exploded rows. Output one row per (label, dimension): assembling the
  * arrays back (collect_list over a sorted struct) adds nothing the
  * consumer can't do and would break the streaming-friendly row shape.
  */
object Embeddings {

  private def q54(s: SparkSession, dir: String): DataFrame =
    Tables
      .table(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("i0", "v")))
      .groupBy(col("label"), (col("i0") + 1).as("i"))
      .agg(
        // + 0.0 signed-zero grid: a tiny negative mean rounds to -0.0 in
        // DuckDB (sign-preserving round) but 0.0 in Spark — latent at
        // sf0.01, first real instance at sf0.1 (label 1, dim 182)
        (round(avg(col("v").cast("double")), 4) + lit(0d)).as("centroid"),
        count(lit(1)).as("n_vecs")
      )
      .orderBy("label", "i")

  // ------------------- q54b: random-projection dimensionality reduction

  private val InDim = 64
  private val OutDim = 16

  /** Deterministic Rademacher-style sign for matrix cell (i, k): a fixed
    * integer mix both engines compute exactly (stub-grade hashing — a
    * production deployment would use a seeded Gaussian matrix; the
    * OPERATOR SHAPE is identical). 0-based i and k.
    */
  private def sign(i: Int, k: Int): Double = {
    val h = ((i.toLong * 73L + k.toLong * 151L) * 2654435761L) % 97L
    if (h % 2 == 0) 1.0 else -1.0
  }

  /** q54b: project 64-dim embeddings to 16 dims with a fixed ±1 sign
    * matrix (the Johnson–Lindenstrauss shape behind cheap ANN
    * pre-filters and clustering at scale: 4× fewer bytes per vector,
    * distances preserved in expectation — EmbeddingsSpec pins the
    * E[‖Px‖²] = OutDim·‖x‖² energy ratio on this corpus). The matrix
    * is plan-time literals per output dim, the fold is the same
    * left-to-right double accumulation as the DuckDB oracle's
    * list_sum, so the projection is value-exact across engines. Output
    * is one row per (vec_id, k) — the same streaming-friendly shape as
    * q54's centroids.
    */
  private def q54b(s: SparkSession, dir: String): DataFrame = {
    val projCols: Seq[org.apache.spark.sql.Column] =
      (0 until OutDim).map { k =>
        val signs = array((0 until InDim).map(i => lit(sign(i, k))): _*)
        aggregate(
          zip_with(col("embedding"), signs, (x, sg) => x.cast("double") * sg),
          lit(0.0),
          (a, x) => a + x
        )
      }
    Tables
      .table(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(array(projCols: _*)).as(Seq("k0", "v")))
      .select(
        col("vec_id"),
        (col("k0") + 1).as("k"),
        round(col("v"), 4).as("proj")
      )
      .orderBy("vec_id", "k")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_embedding_centroids" -> q54,
    "q54b_random_projection" -> q54b
  )

  val oracleSql: Map[String, String] = Map(
    // dimension count derives from each row's own list length (as the
    // Spark posexplode does) — no hard-coded dim that could silently
    // diverge if a testdata generation ever changes width
    "q54_embedding_centroids" ->
      """WITH e AS (
        |  SELECT label, embedding,
        |    unnest(generate_series(1, len(embedding))) AS i
        |  FROM embeddings)
        |SELECT label, i,
        |  round(avg(CAST(embedding[i] AS DOUBLE)), 4) + 0.0 AS centroid,
        |  count(*) AS n_vecs
        |FROM e GROUP BY label, i ORDER BY label, i""".stripMargin,
    // replays the sign formula with SQL's 1-based i mapped to the
    // Scala 0-based one; same left-to-right double fold
    "q54b_random_projection" ->
      s"""WITH p AS (
         |  SELECT vec_id, k,
         |    list_sum(list_transform(generate_series(1, $InDim), i ->
         |      CAST(embedding[i] AS DOUBLE) *
         |      (CASE WHEN ((((i - 1) * 73 + k * 151) * 2654435761) % 97) % 2 = 0
         |            THEN 1.0 ELSE -1.0 END))) AS v
         |  FROM embeddings CROSS JOIN generate_series(0, ${OutDim - 1}) g(k))
         |SELECT vec_id, CAST(k + 1 AS INT) AS k, round(v, 4) AS proj
         |FROM p ORDER BY vec_id, k""".stripMargin
  )
}
