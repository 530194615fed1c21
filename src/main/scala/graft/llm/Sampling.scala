package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Both operators key every decision on a CONTENT hash (md5 of the stable
  * document id), never on rand() or monotonically_increasing_id:
  *   - re-running the pipeline (or a task retry at 100 TB) assigns every
  *     row the same bucket — sampling is reproducible and append-safe;
  *   - the assignment is a pure per-row projection: no shuffle, no state,
  *     fully pushed into whole-stage codegen; the only exchange in these
  *     plans is the ORDER BY that makes the oracle compare deterministic;
  *   - downstream joins between splits of the SAME table stay consistent
  *     (a doc is never train in one job and test in another).
  *
  * The hash arithmetic is md5-derived so the DuckDB oracle reproduces
  * every assignment bit-for-bit (first 15 hex chars → BIGINT, mod 100 —
  * the same recipe the SimHash oracle uses).
  */
object Sampling {

  /** md5-derived bucket in [0, 100): portable across Spark and DuckDB. */
  /** Typed column composition — no round-trip of `c` through its (debug,
    * not-guaranteed-parseable) string form and the SQL parser, so any
    * caller-supplied column expression works.
    */
  private[graft] def bucket100(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long") % 100

  /** q43: deterministic train/valid/test split (80/10/10) over documents.
    * Row-level assignment so the oracle checks every single decision.
    */
  private def q43(s: SparkSession, dir: String): DataFrame =
    Tables
      .table(s, dir, "documents")
      .select(col("doc_id"), bucket100(col("doc_id")).as("bucket"))
      .withColumn(
        "split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test")
      )
      .orderBy("doc_id")

  /** q43b: stratified hash sampling — per-stratum (source) keep rates,
    * here 50% for src0, 25% for src1, 10% for the long tail. The Spark
    * built-in `sampleBy` draws Bernoulli per row (seed-dependent,
    * unreproducible across engines); the hash-mod form is the one that
    * survives retries and re-runs at scale.
    */
  private def q43b(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("source") === "src0", 50)
      .when(col("source") === "src1", 25)
      .otherwise(10)
    Tables
      .table(s, dir, "documents")
      .filter(bucket100(col("doc_id")) < rate)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  /** q43c: GROUP-INTEGRITY split — the leakage-safe variant of q43: the
    * split decision hashes the GROUP key (source — the domain/site in a
    * web corpus), so every document of a group lands in the same split.
    * Row-level splits leak: near-duplicate documents from one site
    * straddle train/test and the eval is contaminated by construction;
    * hashing the group key is the standard fix (and composes with the
    * dedup family, which dedups WITHIN what this keeps together). The
    * salt prefix decorrelates this hash from q43's row split so using
    * both in one pipeline is sound. Pure map-side projection — the
    * grouping never shuffles; the oracle checks every assignment AND
    * the per-split group counts it implies.
    */
  private def q43c(s: SparkSession, dir: String): DataFrame =
    Tables
      .table(s, dir, "documents")
      .select(
        col("doc_id"),
        col("source"),
        bucket100(concat(lit("grp:"), col("source"))).as("bucket")
      )
      .withColumn(
        "split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test")
      )
      .orderBy("doc_id")

  /** q77: count-adaptive per-domain cap — downsample each source toward
    * a target of ~`cap` documents, with the keep rate COMPUTED from the
    * source's own size (`cap / n`) instead of q43b's static table. This
    * is the over-represented-domain control every web-scale corpus
    * needs ("no single site exceeds its budget"), in the shape that
    * scales: a domain-cardinality count aggregate broadcast back onto
    * the corpus and a per-row hash threshold — NO per-group sort, no
    * window, unlike a row_number cap which pays a full per-domain
    * ordering at 100 TB for the same statistical effect.
    *
    * The decision hash is SALTED ('cap:' prefix) so it is independent
    * of q43/q43b's split/sample decisions — reusing one hash for
    * multiple sampling decisions would correlate them (a doc kept here
    * would always be the doc landing in 'train' there). Integer
    * cross-multiplication (`bucket · n < cap · 100`) keeps the
    * threshold compare exact on both engines — no float division.
    */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    val cap = 10
    val docs = Tables.table(s, dir, "documents")
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
    docs
      .join(broadcast(counts), "source")
      .filter(
        bucket100(concat(lit("cap:"), col("doc_id").cast("string")))
          * col("n_src") < cap * 100
      )
      .select(col("doc_id"), col("source"), col("n_src"))
      .orderBy("doc_id")
  }

  /** q81: weighted sampling without replacement (Efraimidis–Spirakis
    * A-ES): per source, keep the top-3 documents by the key
    * `ln(u) / w` — the rank-equivalent of `u^(1/w)` — where `u` is a
    * deterministic md5-uniform in (0, 1] and the weight `w` is the
    * document length (the quality-weight stand-in). Longer docs are
    * proportionally likelier to be drawn, yet every decision replays
    * bit-for-bit: this is how a curation pipeline samples by quality
    * score WITHOUT rand()'s retry/re-run nondeterminism.
    *
    * Scale shape: key assignment is a pure per-row projection; the
    * top-3-per-source rank compiles to WindowGroupLimit (per-partition
    * top-k heaps before the shuffle), never a full per-source sort.
    *
    * Float parity: `u` is exact on both engines ((52-bit int + 1) /
    * (2^52 + 1) — one IEEE division of exact integers); `ln` is the one
    * libm call, so the key is round(·, 6)-gridded BEFORE ranking with a
    * doc_id tie-break — a last-ulp ln divergence would need to straddle
    * a 1e-6 grid edge to flip the selection.
    */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (conv(
      substring(md5(concat(lit("wrs:"), col("doc_id").cast("string")).cast("binary")), 1, 13),
      16,
      10
    ).cast("long") + 1).cast("double") / 4503599627370497.0
    val key = round(log(u) / col("n_chars"), 6) + 0.0
    val w = Window.partitionBy("source").orderBy(col("k").desc, col("doc_id"))
    Tables
      .table(s, dir, "documents")
      .withColumn("k", key)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("source"), col("doc_id"), col("k"), col("rn"))
      .orderBy("source", "rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_hash_split" -> q43,
    "q43b_stratified_sample" -> q43b,
    "q43c_group_split" -> q43c,
    "q77_domain_cap" -> q77,
    "q81_weighted_sample" -> q81
  )

  private[llm] val BucketSql =
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100"

  val oracleSql: Map[String, String] = Map(
    "q43_hash_split" ->
      s"""SELECT doc_id, $BucketSql AS bucket,
         |  CASE WHEN $BucketSql < 80 THEN 'train'
         |       WHEN $BucketSql < 90 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q43b_stratified_sample" ->
      s"""SELECT doc_id, source FROM documents
         |WHERE $BucketSql <
         |  CASE WHEN source = 'src0' THEN 50
         |       WHEN source = 'src1' THEN 25 ELSE 10 END
         |ORDER BY doc_id""".stripMargin,
    "q43c_group_split" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |    CAST('0x' || substr(md5('grp:' || source), 1, 15) AS BIGINT) % 100
        |      AS bucket
        |  FROM documents)
        |SELECT doc_id, source, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    "q77_domain_cap" ->
      """WITH counts AS (
        |  SELECT source, count(*) AS n_src FROM documents GROUP BY source)
        |SELECT doc_id, d.source, n_src
        |FROM documents d JOIN counts USING (source)
        |WHERE (CAST('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 15)
        |        AS BIGINT) % 100) * n_src < 10 * 100
        |ORDER BY doc_id""".stripMargin,
    "q81_weighted_sample" ->
      """WITH k AS (
        |  SELECT source, doc_id,
        |    round(ln((CAST('0x' || substr(md5('wrs:' || CAST(doc_id AS VARCHAR)), 1, 13)
        |               AS BIGINT) + 1) / 4503599627370497.0) / n_chars, 6) + 0.0 AS k
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, k,
        |    row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rn
        |  FROM k)
        |SELECT source, doc_id, k, rn FROM r WHERE rn <= 3
        |ORDER BY source, rn""".stripMargin
  )
}
