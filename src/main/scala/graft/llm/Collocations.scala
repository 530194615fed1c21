package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q72: PMI collocation mining — top adjacent-pair associations by
  * pointwise mutual information, the phrase-discovery stage a corpus
  * build runs to find multi-word expressions worth protecting from
  * tokenization ("new york", "machine learning") and boilerplate
  * n-grams worth scrubbing. PMI(w1,w2) = ln(p(w1w2) / (p(w1)·p(w2))),
  * estimated from adjacent-pair and unigram counts; a minimum pair
  * count keeps the head of the ranking out of one-off noise (PMI's
  * known low-count pathology).
  *
  * Scale shape: two token aggregations (bigram frame, unigram frame —
  * both vocabulary-sized, partial-aggregated), the min-count filter
  * prunes the bigram frame BEFORE any join, unigram counts attach by
  * equi-join (vocab-sized build side, AQE picks broadcast), and the two
  * corpus totals ride along as broadcast one-row frames. The final
  * rank window runs over the min-count-surviving collocation frame
  * only. PMI itself is a single arithmetic expression over five exact
  * integers — bit-identical on both engines, no summation-order
  * exposure anywhere.
  */
object Collocations {

  private val MinCount = 5
  private val TopN = 30

  private def q72(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val docs = Tables.table(s, dir, "documents")
    val pairs = docs
      .filter(size(toks) >= 2)
      .select(
        explode(
          zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2"))
          )
        ).as("p")
      )
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = docs.select(explode(toks).as("w"))
    val cnt = uni.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = uni.agg(count(lit(1)).as("t"))
    val btot = pairs.agg(count(lit(1)).as("b"))
    val big = pairs
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= MinCount)
    val pmi =
      log(
        (col("c12") * lit(1.0) / col("b")) /
          ((col("c1") * lit(1.0) / col("t")) * (col("c2") * lit(1.0) / col("t")))
      )
    big
      .join(cnt.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(cnt.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(tot)) // 1-row totals: bounded by construction
      .crossJoin(broadcast(btot))
      // exact-integer inputs ⇒ pmi is bit-identical cross-engine; can be
      // negative ⇒ signed-zero normalization applies
      .withColumn("pmi", round(pmi, 4) + lit(0d))
      // top-k via orderBy+limit (TakeOrderedAndProject: per-partition
      // heaps, no single-task global window over the collocation frame);
      // the rank window then runs over TopN rows only
      .orderBy(desc("pmi"), col("w1"), col("w2"))
      .limit(TopN)
      .withColumn(
        "rk",
        row_number().over(Window.orderBy(desc("pmi"), col("w1"), col("w2")))
      )
      .select("rk", "w1", "w2", "c12", "pmi")
      .orderBy("rk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_pmi_collocations" -> q72
  )

  val oracleSql: Map[String, String] = Map(
    "q72_pmi_collocations" ->
      s"""WITH d AS (SELECT string_split(text, ' ') AS w FROM documents),
         |pp AS (
         |  SELECT
         |    unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i])) AS w1,
         |    unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i+1])) AS w2
         |  FROM d WHERE len(w) >= 2),
         |uni AS (SELECT unnest(w) AS wd FROM d),
         |cnt AS (SELECT wd, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY wd),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM uni),
         |bt AS (SELECT CAST(count(*) AS BIGINT) AS b FROM pp),
         |big AS (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pp
         |  GROUP BY 1, 2 HAVING count(*) >= $MinCount),
         |scored AS (
         |  SELECT w1, w2, c12,
         |    round(ln((c12 * 1.0 / b) /
         |      ((u1.c * 1.0 / t) * (u2.c * 1.0 / t))), 4) + 0.0 AS pmi
         |  FROM big
         |  JOIN cnt u1 ON u1.wd = w1
         |  JOIN cnt u2 ON u2.wd = w2
         |  CROSS JOIN tot CROSS JOIN bt),
         |ranked AS (
         |  SELECT w1, w2, c12, pmi,
         |    row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rk
         |  FROM scored)
         |SELECT rk, w1, w2, c12, pmi FROM ranked
         |WHERE rk <= $TopN ORDER BY rk""".stripMargin
  )
}
