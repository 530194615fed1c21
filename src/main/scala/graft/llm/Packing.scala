package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q52: sequence packing — the concat-and-chop batching step of LLM
  * pretraining: documents are concatenated in a canonical order (doc_id)
  * and chopped into fixed context windows of [[ContextLen]] tokens; each
  * document's window assignment and boundary-crossing flag follow from
  * its global token start offset, i.e. an exclusive prefix sum of token
  * counts in doc order.
  *
  * The prefix sum is computed as the textbook two-pass distributed scan,
  * NOT a global `Window.orderBy` (which Catalyst executes as one
  * single-task partition — the classic driver-shaped bottleneck at
  * corpus scale):
  *
  *   1. shard by a DATA-DERIVED, order-preserving key
  *      (`doc_id div ShardWidth`) — never `spark_partition_id()`, whose
  *      value is a physical-plan artifact: two consumers of the same
  *      frame are not guaranteed identical partitioning (exchange reuse
  *      can be disabled; AQE may coalesce each consumer's read of a
  *      shuffle differently), which would silently misalign offsets;
  *   2. per-shard totals → a shards-sized frame whose own running sum
  *      (tiny, one task is fine there) gives each shard's global offset;
  *   3. broadcast the offsets back and add a PER-SHARD window cumsum —
  *      every corpus-sized window is keyed by the shard, so no stage
  *      sees more than ShardWidth docs in one task.
  *
  * The shard key is pure data, so the result is deterministic under any
  * physical partitioning — which is also what makes the single
  * window-cumsum DuckDB oracle valid. ShardWidth bounds per-task window
  * state; dense doc_ids keep shards balanced (ragged id spaces just make
  * some shards small, which costs nothing).
  */
object Packing {

  val ContextLen = 512
  val ShardWidth = 4096L // docs per prefix-sum shard (per-task bound)

  private def q52(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables
      .table(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("shard", expr(s"doc_id div $ShardWidth"))

    val offsets = toks
      .groupBy("shard")
      .agg(sum("n_tokens").as("shard_tokens"))
      .withColumn(
        "shard_offset",
        coalesce(
          sum("shard_tokens").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("shard", "shard_offset")

    val local = Window
      .partitionBy("shard")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)

    toks
      .join(broadcast(offsets), "shard")
      .withColumn(
        "start_off",
        col("shard_offset") + coalesce(sum("n_tokens").over(local), lit(0L))
      )
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("start_off"),
        expr(s"start_off div $ContextLen").as("bin"),
        // crosses a window boundary iff its span touches a later bin
        (expr(s"(start_off + n_tokens - 1) div $ContextLen") >
          expr(s"start_off div $ContextLen")).as("spans")
      )
      .orderBy("doc_id")
  }

  /** q52b: pack-boundary segments — the attention-mask metadata packing
    * actually feeds training: for every context window, the ordered
    * segments (doc, local start, length) occupying it, one row per
    * segment (a doc spanning windows contributes one segment per
    * window it touches via a Generate over its bin range — never a
    * self-join). The per-window ordering ranks inside a bin-partitioned
    * window, so no corpus-sized sort materializes.
    */
  private def q52b(s: SparkSession, dir: String): DataFrame = {
    val L = ContextLen
    val segs = q52(s, dir)
      .withColumn("b1", expr(s"(start_off + n_tokens - 1) div $L"))
      .select(
        col("doc_id"),
        col("start_off"),
        col("n_tokens"),
        explode(sequence(col("bin"), col("b1"))).as("win")
      )
      .withColumn("seg_start", greatest(col("start_off"), col("win") * L) - col("win") * L)
      .withColumn(
        "seg_len",
        least(col("start_off") + col("n_tokens"), (col("win") + 1) * L) -
          greatest(col("start_off"), col("win") * L)
      )
    val w = Window.partitionBy("win").orderBy("seg_start", "doc_id")
    segs
      .select(
        col("win"),
        row_number().over(w).as("seg_idx"),
        col("doc_id"),
        col("seg_start"),
        col("seg_len")
      )
      .orderBy("win", "seg_idx")
  }

  // ------------------------------------------- q95: curriculum ordering

  private val CurrBuckets = 10 // length-difficulty buckets (short first)
  private val CurrHashMod = 1000000L // within-bucket shuffle-key space
  private val CurrSubshards = 32L // order-preserving scan shards
  private val OutShards = 8 // output data-parallel shard count

  /** q95: curriculum ordering — assign every document a GLOBAL training
    * position ordered by (difficulty bucket ASC, deterministic shuffle
    * hash, doc_id): the short-first length curriculum with a reproducible
    * within-bucket shuffle (salted md5, the q43 hash convention — never
    * rand(), so retries and re-runs emit the identical order). The
    * position also fixes the output shard (`position % OutShards`), i.e.
    * which data-parallel reader consumes the sample.
    *
    * The global position is NOT a global `Window.orderBy` (one-task
    * bottleneck): it reuses q52's two-level distributed scan with an
    * order-preserving compound shard key — (bucket, hv div width) blocks
    * are lexicographically aligned with the target order, so per-shard
    * row numbers plus a window over the ≤ CurrBuckets × CurrSubshards
    * offset rows (tiny, allowlisted) reconstruct the exact global rank.
    * Every corpus-sized window is partitioned by the compound key.
    */
  private def q95(s: SparkSession, dir: String): DataFrame = {
    val hv = conv(
      substring(
        md5(concat(lit("cur:"), col("doc_id").cast("string")).cast("binary")),
        1,
        13
      ),
      16,
      10
    ).cast("long") % CurrHashMod
    val width = CurrHashMod / CurrSubshards
    val keyed = Tables
      .table(s, dir, "documents")
      .select(
        col("doc_id"),
        least(expr("n_chars div 200"), lit(CurrBuckets - 1)).as("bucket"),
        hv.as("hv")
      )
      .withColumn("subshard", expr(s"hv div $width"))
    val offsets = keyed
      .groupBy("bucket", "subshard")
      .agg(count(lit(1)).as("n"))
      .withColumn(
        "off",
        coalesce(
          sum("n").over(
            Window
              .orderBy("bucket", "subshard")
              .rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("bucket", "subshard", "off")
    val local = Window.partitionBy("bucket", "subshard").orderBy("hv", "doc_id")
    keyed
      .join(broadcast(offsets), Seq("bucket", "subshard"))
      .withColumn("position", col("off") + row_number().over(local) - 1)
      .select(
        col("doc_id"),
        col("bucket"),
        col("hv"),
        col("position"),
        (col("position") % OutShards).as("out_shard")
      )
      .orderBy("position")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q52_sequence_packing" -> q52,
    "q52b_pack_boundaries" -> q52b,
    "q95_curriculum_order" -> q95
  )

  val oracleSql: Map[String, String] = Map(
    "q52_sequence_packing" ->
      s"""WITH t AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS start_off
         |  FROM t)
         |SELECT doc_id, n_tokens, start_off,
         |  start_off // $ContextLen AS bin,
         |  (start_off + n_tokens - 1) // $ContextLen > start_off // $ContextLen
         |    AS spans
         |FROM o ORDER BY doc_id""".stripMargin,
    "q52b_pack_boundaries" ->
      s"""WITH t AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS start_off
         |  FROM t),
         |segs AS (
         |  SELECT doc_id, start_off, n_tokens,
         |    unnest(generate_series(start_off // $ContextLen,
         |                           (start_off + n_tokens - 1) // $ContextLen)) AS win
         |  FROM o),
         |seg2 AS (
         |  SELECT win, doc_id,
         |    greatest(start_off, win * $ContextLen) - win * $ContextLen AS seg_start,
         |    least(start_off + n_tokens, (win + 1) * $ContextLen)
         |      - greatest(start_off, win * $ContextLen) AS seg_len
         |  FROM segs)
         |SELECT win, CAST(row_number() OVER (PARTITION BY win ORDER BY seg_start, doc_id) AS INT) AS seg_idx,
         |  doc_id, seg_start, seg_len
         |FROM seg2 ORDER BY win, seg_idx""".stripMargin,
    // the oracle replays the two-level scan as ONE global rank — valid
    // because the compound shard key is order-preserving (same argument
    // as q52's single window-cumsum oracle)
    "q95_curriculum_order" ->
      s"""WITH k AS (
         |  SELECT doc_id,
         |    least(n_chars // 200, ${CurrBuckets - 1}) AS bucket,
         |    CAST('0x' || substr(md5('cur:' || CAST(doc_id AS VARCHAR)), 1, 13)
         |         AS BIGINT) % $CurrHashMod AS hv
         |  FROM documents)
         |SELECT doc_id, bucket, hv,
         |  row_number() OVER (ORDER BY bucket, hv, doc_id) - 1 AS position,
         |  (row_number() OVER (ORDER BY bucket, hv, doc_id) - 1) % $OutShards
         |    AS out_shard
         |FROM k ORDER BY position""".stripMargin
  )
}
