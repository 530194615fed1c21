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
        round(avg(col("v").cast("double")), 4).as("centroid"),
        count(lit(1)).as("n_vecs")
      )
      .orderBy("label", "i")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_embedding_centroids" -> q54
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
        |  round(avg(CAST(embedding[i] AS DOUBLE)), 4) AS centroid,
        |  count(*) AS n_vecs
        |FROM e GROUP BY label, i ORDER BY label, i""".stripMargin
  )
}
