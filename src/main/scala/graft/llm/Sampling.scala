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
  private[llm] def bucket100(c: Column): Column =
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_hash_split" -> q43,
    "q43b_stratified_sample" -> q43b
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
         |ORDER BY doc_id""".stripMargin
  )
}
