package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q177: the composed end-to-end curation pipeline — the "does it all
  * fit together" run a user of this library does first, as ONE gate:
  *
  *   NFC normalize → exact dedup (digest keeper) → near-dup keep-list
  *   (cluster-quality winner) → leakage-safe split (cluster-id hash
  *   bucket) → sequence packing per split → per-split corpus stats.
  *
  * Every stage is an already-gated operator applied with its gate's
  * exact conventions (q149 NFC kernel, q25's min-id digest keeper,
  * q50b's quality argmax, q144's cluster-bucket split, q52's
  * concat-and-chop packing arithmetic, q67-style stats), and the
  * oracle composes the corresponding oracle spellings — so a drift in
  * any stage's semantics breaks BOTH this gate and the stage's own.
  * The JSONL/CSV ingest routing that precedes this in production is
  * gated separately (q60/q66) on its own closed-form corpus; here the
  * parquet `documents` table IS the ingested corpus.
  *
  * Pipeline-order semantics (deterministic, documented): the near-dup
  * keep-list is computed on the FULL corpus (q50b's contract — the
  * session label cache, exactly how a production pipeline consumes
  * q50's output); a cluster whose quality winner was itself removed by
  * exact dedup therefore contributes no documents. Stats count words
  * of the NORMALIZED text under q52's `split(text, ' ')` convention.
  *
  * Scale shape: NFC + digest + token counts are one map-side
  * projection over the corpus scan (the NFC kernel is zero-copy on
  * already-normalized rows); exact dedup is one digest hash-aggregate
  * + a (digest, keeper) self-semi-join; the keep-list is cluster-sized
  * argmax over the session labels; the split is a map-side md5 bucket;
  * the per-split prefix sum is q52's two-pass distributed scan with
  * the shard key extended to (split, shard) — no corpus-sized
  * single-task window anywhere; the output is 3 rows. One corpus
  * scan feeds everything downstream of the survivor frame.
  */
object Pipeline {

  /** The corpus projection every stage reads: NFC-normalized digest +
    * token/char counts (package-private so the streaming twin's
    * finalize joins counts from the SAME spelling —
    * StreamingPipelineSpec).
    */
  private[graft] def baseFrame(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expr => cexpr}
    val norm = column(graft.functions.UnicodeNfc(cexpr(col("text"))))
    Tables
      .table(s, dir, "documents")
      .select(
        col("doc_id"),
        md5(norm).as("digest"),
        size(split(norm, " ")).as("n_tokens"),
        length(norm).as("n_chars")
      )
  }

  private def q177(s: SparkSession, dir: String): DataFrame =
    packStats(assignedFrame(s, dir))

  /** Stages 1–4 (NFC → exact dedup → keep-list → leakage-safe split)
    * as the per-survivor assignment frame (doc_id, n_tokens, n_chars,
    * cluster_id, bucket, split). Package-private so
    * StreamingPipelineSpec can pin the streamed per-doc assignments
    * against the batch ones row for row, not only the packed stats.
    */
  private[graft] def assignedFrame(s: SparkSession, dir: String): DataFrame = {
    val base = baseFrame(s, dir)

    // exact dedup: q25's convention — min doc_id per content digest
    val keepers = base
      .groupBy("digest")
      .agg(min(col("doc_id")).as("doc_id"))
    val exactSurvivors = base.join(keepers, Seq("digest", "doc_id"))

    // near-dup keep-list: q50b's quality argmax over the session-cached
    // q50 labels (reward on the ORIGINAL text — q50b's contract)
    val labels = Clustering.cachedClusterLabels(s, dir)
    val quality = Tables
      .table(s, dir, "documents")
      .select(
        col("doc_id"),
        (round(
          length(regexp_replace(col("text"), "[^a-z]", ""))
            .cast("double") / nullif(length(col("text")), lit(0)).cast("double"),
          4
        ) + 0.0).as("reward")
      )
    val scored = labels.join(quality, "doc_id")
    val kept = scored
      .groupBy("cluster_id")
      .agg(
        max_by(col("doc_id"), struct(col("reward"), -col("doc_id"))).as("kept_id")
      )
    val nearDrops = scored
      .join(broadcast(kept), "cluster_id")
      .filter(col("doc_id") =!= col("kept_id"))
      .select("doc_id")
    val survivors = exactSurvivors
      .join(nearDrops, Seq("doc_id"), "left_anti")

    // leakage-safe split: q144's md5 bucket of the CLUSTER id (a doc's
    // near-dups can never straddle splits; unclustered = own cluster)
    val assigned = survivors
      .join(labels, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_chars"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id")
      )
      .withColumn("bucket", Sampling.bucket100(col("cluster_id")))
      .withColumn(
        "split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test")
      )
    assigned
  }

  /** The batch FINALIZE of the pipeline — per-split packing + stats
    * over an assigned survivor frame (doc_id, n_tokens, n_chars,
    * split). Package-private because the streaming twin reuses it
    * verbatim: q52's prefix sum is a global two-pass scan, a batch
    * shape by construction, so a production stream curates
    * continuously and runs THIS once per packing epoch
    * (StreamingPipelineSpec pins stream-curated survivors through this
    * exact code against the q177 gate).
    */
  private[graft] def packStats(assigned: DataFrame): DataFrame = {
    // per-split concat-and-chop packing: q52's two-pass distributed
    // prefix sum, shard key extended to (split, shard) so every window
    // is (split, shard)-bounded; the shards frame (per-split window) is
    // shards-sized, never corpus-sized
    val sharded = assigned.withColumn(
      "shard",
      expr(s"doc_id div ${Packing.ShardWidth}")
    )
    val offsets = sharded
      .groupBy("split", "shard")
      .agg(sum(col("n_tokens")).as("shard_tokens"))
      .withColumn(
        "shard_offset",
        coalesce(
          sum("shard_tokens").over(
            Window
              .partitionBy("split")
              .orderBy("shard")
              .rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("split", "shard", "shard_offset")
    val local = Window
      .partitionBy("split", "shard")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = sharded
      .join(broadcast(offsets), Seq("split", "shard"))
      .withColumn(
        "start_off",
        col("shard_offset") + coalesce(sum("n_tokens").over(local), lit(0L))
      )
      .withColumn(
        "spans",
        expr(s"(start_off + n_tokens - 1) div ${Packing.ContextLen}") >
          expr(s"start_off div ${Packing.ContextLen}")
      )

    // per-split readout: exact integers + one gridded fill ratio;
    // n_bins follows from contiguous concat (ceil of the token total)
    packed
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("spans").cast("long")).as("n_spanning")
      )
      .withColumn(
        "n_bins",
        expr(s"(n_tokens + ${Packing.ContextLen - 1}) div ${Packing.ContextLen}")
      )
      .withColumn(
        "fill_ratio",
        round(
          col("n_tokens").cast("double") /
            (col("n_bins") * Packing.ContextLen).cast("double"),
          6
        ) + 0.0
      )
      .select("split", "n_docs", "n_tokens", "n_chars", "n_spanning", "n_bins", "fill_ratio")
      .orderBy("split")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q177_pipeline_end_to_end" -> q177
  )

  /** Oracle = the composed stage oracles: the q50 recursive-closure
    * labels CTE + q50b's quality/argmax spelling + q25's digest keeper
    * + q144's bucket CASE + q52's window prefix sum (valid per split
    * under the same order-preserving key argument), all over DuckDB's
    * utf8proc `nfc_normalize` where the pipeline applies the NFC
    * kernel.
    */
  val oracleSql: Map[String, String] = Map(
    "q177_pipeline_end_to_end" -> (
      Clustering.clusterLabelsSql +
        s""",
           |quality AS (
           |  SELECT doc_id,
           |    round(length(regexp_replace(text, '[^a-z]', '', 'g'))
           |          / CAST(nullif(length(text), 0) AS DOUBLE), 4) + 0.0 AS reward
           |  FROM documents),
           |ranked AS (
           |  SELECT l.doc_id, l.cluster_id, q.reward,
           |    row_number() OVER (PARTITION BY l.cluster_id
           |                       ORDER BY q.reward DESC, l.doc_id) AS rn
           |  FROM labels l JOIN quality q USING (doc_id)),
           |base AS (
           |  SELECT doc_id,
           |    md5(nfc_normalize(text)) AS digest,
           |    len(string_split(nfc_normalize(text), ' ')) AS n_tokens,
           |    length(nfc_normalize(text)) AS n_chars
           |  FROM documents),
           |exact_keep AS (
           |  SELECT digest, min(doc_id) AS doc_id FROM base GROUP BY digest),
           |surv AS (
           |  SELECT b.doc_id, b.n_tokens, b.n_chars
           |  FROM base b JOIN exact_keep e
           |    ON b.digest = e.digest AND b.doc_id = e.doc_id
           |  WHERE b.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)),
           |assigned AS (
           |  SELECT s.doc_id, s.n_tokens, s.n_chars,
           |    coalesce(l.cluster_id, s.doc_id) AS cluster_id
           |  FROM surv s LEFT JOIN labels l USING (doc_id)),
           |split_assigned AS (
           |  SELECT *,
           |    CASE WHEN CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 80 THEN 'train'
           |         WHEN CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90 THEN 'valid'
           |         ELSE 'test' END AS split
           |  FROM assigned),
           |packed AS (
           |  SELECT *,
           |    coalesce(sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
           |  FROM split_assigned)
           |SELECT split,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
           |  CAST(sum(CASE WHEN (start_off + n_tokens - 1) // ${Packing.ContextLen}
           |                     > start_off // ${Packing.ContextLen}
           |                THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning,
           |  CAST((sum(n_tokens) + ${Packing.ContextLen - 1}) // ${Packing.ContextLen} AS BIGINT) AS n_bins,
           |  round(CAST(sum(n_tokens) AS DOUBLE)
           |        / CAST(((sum(n_tokens) + ${Packing.ContextLen - 1}) // ${Packing.ContextLen})
           |               * ${Packing.ContextLen} AS DOUBLE), 6) + 0.0 AS fill_ratio
           |FROM packed GROUP BY split ORDER BY split""".stripMargin
    )
  )
}
