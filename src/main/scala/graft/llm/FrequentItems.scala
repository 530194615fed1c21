package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frequent-items (heavy hitters) over the document token stream, in two
  * forms:
  *
  *  - q48: EXACT support-threshold heavy hitters — tokens appearing in
  *    ≥ 3% of all token occurrences. One hash aggregation over (token),
  *    a broadcast of the 1-row total, no driver-side steps. The exact
  *    form shuffles the full (token, count) space — fine while the
  *    vocabulary fits a shuffle, the baseline otherwise.
  *  - q48b: the same question answered from a Count-Min sketch
  *    (CountMinAggregator): the corpus folds into one 4×1024 counter
  *    matrix (32 KB crossing the network per task, independent of
  *    vocabulary size), then candidate tokens are screened against the
  *    broadcast sketch. CMS never underestimates, so the result is a
  *    superset of q48's (equal here — 31 distinct tokens in 1024 buckets
  *    rarely collide); the overshoot bound is e/w·N w.p. ≥ 1−e^(−4).
  *
  * All sketch arithmetic is md5-derived and closed-form, so the DuckDB
  * oracle rebuilds the identical sketch in SQL and BOTH queries are
  * hash-exact-checked — the sketch path is verified, not just spot-tested.
  */
object FrequentItems {

  private val Support = 0.03

  // Sketch geometry: eps = e/w ≈ 0.27%, delta = e^-d ≈ 1.8% — and the
  // affine-permutation parameters, seeded once (same scheme as MinHash).
  private[graft] val P = 2147483647L // M31; (a·h + b) stays in a Long for h < P
  private[graft] val Depth = 4
  private[graft] val Width = 1024
  private[graft] lazy val (cmA, cmB) = {
    val rnd = new scala.util.Random(7)
    val a = Array.fill(Depth)(1L + rnd.nextInt((P - 1).toInt))
    val b = Array.fill(Depth)(rnd.nextInt(P.toInt).toLong)
    (a, b)
  }

  private def words(s: SparkSession, dir: String): DataFrame =
    Tables
      .table(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))

  /** Base hash: md5-derived 60 bits reduced into [0, P) — the same
    * closed-form recipe as SimHash, replayable by the oracle.
    */
  private val baseHash: Column =
    expr(s"cast(conv(substr(md5(w), 1, 15), 16, 10) as bigint) % $P")

  private def q48(s: SparkSession, dir: String): DataFrame = {
    val ws = words(s, dir)
    val total = ws.agg(count(lit(1)).as("n"))
    ws.groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") >= lit(Support) * col("n"))
      .select(col("w"), col("cnt"), round(col("cnt") / col("n"), 6).as("share"))
      .orderBy(desc("cnt"), col("w"))
  }

  private def q48b(s: SparkSession, dir: String): DataFrame = {
    val hashed = words(s, dir).withColumn("h", baseHash)
    val cms = udaf(new graft.functions.CountMinAggregator(Depth, Width, P, cmA, cmB))
    val sketch = hashed.agg(cms(col("h")).as("sk"), count(lit(1)).as("n"))

    def bucket(i: Int): Column =
      pmod(pmod(lit(cmA(i)) * col("h") + lit(cmB(i)), lit(P)), lit(Width))
    val estimate = (0 until Depth)
      .map(i => element_at(col("sk"), (lit(i * Width) + bucket(i) + 1).cast("int")))
      .reduce(least(_, _))

    // candidate side: dedup tokens FIRST, hash once per distinct token —
    // not once per occurrence (occurrences/vocabulary fewer md5 calls)
    words(s, dir)
      .distinct()
      .withColumn("h", baseHash)
      .crossJoin(broadcast(sketch))
      .withColumn("est_cnt", estimate)
      .filter(col("est_cnt") >= lit(Support) * col("n"))
      .select(col("w"), col("est_cnt"))
      .orderBy(desc("est_cnt"), col("w"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_heavy_hitters" -> q48,
    "q48b_heavy_hitters_cms" -> q48b
  )

  private val wordsCte =
    """words AS (
      |  SELECT unnest(string_split(text, ' ')) AS w FROM documents)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q48_heavy_hitters" ->
      s"""WITH $wordsCte,
         |tot AS (SELECT count(*) AS n FROM words),
         |cnts AS (SELECT w, count(*) AS cnt FROM words GROUP BY w)
         |SELECT w, cnt, round(cnt * 1.0 / n, 6) AS share FROM cnts, tot
         |WHERE cnt >= $Support * n ORDER BY cnt DESC, w""".stripMargin,
    // Rebuild the sketch in SQL: per-row bucket counts, then min over
    // rows per distinct token — identical arithmetic to the aggregator.
    "q48b_heavy_hitters_cms" ->
      s"""WITH $wordsCte,
         |hashed AS (SELECT w,
         |  CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % $P AS h FROM words),
         |tot AS (SELECT count(*) AS n FROM hashed),
         |params AS (SELECT i,
         |    ([${cmA.mkString(", ")}])[i + 1] AS ai,
         |    ([${cmB.mkString(", ")}])[i + 1] AS bi
         |  FROM (SELECT unnest(generate_series(0, ${Depth - 1})) AS i)),
         |counts AS (
         |  SELECT i, ((ai * h + bi) % $P) % $Width AS bkt, count(*) AS c
         |  FROM hashed CROSS JOIN params GROUP BY 1, 2),
         |est AS (
         |  SELECT k.w, min(c.c) AS est_cnt
         |  FROM (SELECT DISTINCT w, h FROM hashed) k
         |  CROSS JOIN params p
         |  JOIN counts c ON c.i = p.i
         |   AND c.bkt = ((p.ai * k.h + p.bi) % $P) % $Width
         |  GROUP BY k.w)
         |SELECT w, est_cnt FROM est, tot
         |WHERE est_cnt >= $Support * n ORDER BY est_cnt DESC, w""".stripMargin
  )
}
